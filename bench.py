"""Benchmark harness: one JSON line with the headline metric.

Headline: GCUPS (giga cell-updates per second) on a 10k x 10k local
(Smith-Waterman) score-only alignment -- the reference's core workload
class (benchmark.sh / main.cpp score calls). Uses the Pallas band kernel
on TPU, falling back to the portable XLA engine elsewhere.

The reference publishes no numbers (BASELINE.md); ``vs_baseline``
normalizes against a 2.0 GCUPS proxy for the reference's 4-thread CPU
binary (typical for scalar int32 DP at ~0.5 cells/cycle/core).
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_PROXY_GCUPS = 2.0
MN = int(os.environ.get("BENCH_LEN", 10000))
REPS = int(os.environ.get("BENCH_REPS", 3))


def main():
    import jax

    from anyseq_tpu.core.types import LinearScoring, Mode
    from anyseq_tpu.engine import api, xla_linmem

    sc = LinearScoring(2, -1, -1)
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    q = bytes(alpha[rng.integers(0, 4, MN)])
    s = bytes(alpha[rng.integers(0, 4, MN)])
    _, _, m, n, qp, sp = api._prep(q, s)

    def run_pallas():
        from anyseq_tpu.kernels import band

        outs = band.score_pair(qp, sp, m, n, Mode.LOCAL, sc)
        jax.block_until_ready(outs["best"])
        return outs

    def run_xla():
        outs = xla_linmem.score_rows(qp, sp, m, n, Mode.LOCAL, sc)
        jax.block_until_ready(outs["best"])
        return outs

    impl = None
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        try:
            run_pallas()  # compile + smoke
            impl = run_pallas
            engine = "pallas-band"
        except Exception as e:  # pragma: no cover
            print(f"# pallas kernel unavailable ({e}); falling back",
                  file=sys.stderr)
    if impl is None:
        run_xla()
        impl = run_xla
        engine = "xla-linmem"

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        impl()
        best = min(best, time.perf_counter() - t0)

    gcups = m * n / best / 1e9
    print(json.dumps({
        "metric": f"local SW score GCUPS ({MN}x{MN}, {engine})",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / REFERENCE_PROXY_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()
