"""Headline-kernel geometry sweep: measure GCUPS for (R, U, G) configs.

R (window sublanes) and U (step-loop unroll) are import-time constants
of kernels/band.py, overridable via ANYSEQ_R / ANYSEQ_U -- run one
process per (R, U) pair and pass the G list as argv:

    ANYSEQ_R=16 ANYSEQ_U=16 python tools/perf_sweep.py 8 10 12

Prints one JSON line per config (the same slope-timing discipline as
bench.py: k back-to-back dispatches minus one, min over reps).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from anyseq_tpu.core.types import LinearScoring, Mode
    from anyseq_tpu.engine import api
    from anyseq_tpu.kernels import band

    gs = [int(x) for x in sys.argv[1:]] or [None]
    n = int(os.environ.get("ANYSEQ_SWEEP_N", "100000"))
    mode = Mode.parse(os.environ.get("ANYSEQ_SWEEP_MODE", "local"))
    if os.environ.get("ANYSEQ_SWEEP_AFFINE"):
        from anyseq_tpu.core.types import AffineScoring

        sc = AffineScoring(2, -1, -3, -1)
    else:
        sc = LinearScoring(2, -1, -1)
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    q = bytes(alpha[rng.integers(0, 4, n)])
    s = q[: n // 2] + bytes(alpha[rng.integers(0, 4, n - n // 2)])
    _, _, m, nn, qp, sp = api._prep(q, s)

    for G in gs:
        def f(G=G):
            return band.score_pair(qp, sp, m, nn, mode, sc,
                                   need_pos=False, G=G)["best"]

        t0 = time.perf_counter()
        np.asarray(f())  # compile
        t_compile = time.perf_counter() - t0

        def run(j):
            t0 = time.perf_counter()
            r = None
            for _ in range(j):
                r = f()
            np.asarray(r)
            return time.perf_counter() - t0

        reps, k = 3, 6
        t1 = min(run(1) for _ in range(reps))
        tk = min(run(k) for _ in range(reps))
        dt = max((tk - t1) / (k - 1), 1e-9)
        print(json.dumps({
            "R": band.R, "U": band.U, "G": G,
            "mode": mode.name, "affine": not isinstance(sc,
                                                        LinearScoring),
            "n": n,
            "compile_s": round(t_compile, 1),
            "gcups": round(m * nn / dt / 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
