"""Single-kernel collective stripe wavefront: in-kernel ICI halo exchange.

The host-orchestrated path (dist/sharded.py) runs one kernel per band per
superstep and exchanges boundary columns with ``jax.lax.ppermute``. This
module runs ONE persistent Pallas kernel per chip for the whole stripe:
the stripe's first window blocks on a DMA semaphore until each 128-row
left-boundary chunk ARRIVES from the left neighbor, and the stripe's last
window streams its right-edge chunks to the right neighbor with
``pltpu.make_async_remote_copy`` as they are produced. Chips overlap at
128-row granularity with no host round trips -- the in-kernel halo
exchange named by SURVEY.md section 5.8 / the native-code ledger
(SURVEY.md:113) as the TPU-native analog of the reference's boundary
column vectors (scoring.impala:218-259).

Pipeline fill is 128 rows per hop (vs H=4096+ per hop for the superstep
path), so chips reach concurrent steady state ~30x sooner.

Correctness is validated on the CPU TPU-interpreter
(pltpu.InterpretParams), which simulates per-device memory, RDMA delivery
and semaphores.

Limits (v1): linear scoring, m <= kernels.band.M_MAX, 1-D mesh axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anyseq_tpu.core.types import SCORE_MIN, LinearScoring, Mode, Score
from anyseq_tpu.kernels import band


def _round_up(x, m):
    return (x + m - 1) // m * m


def score_pair_collective(query, subject, mode, sc: LinearScoring,
                          mesh: Mesh, axis: str = "sp",
                          interpret=False, G: int | None = None):
    """Distributed score-only alignment of one pair via the collective
    halo-exchange kernel. Same outputs contract as
    dist.sharded.score_pair_sharded (bit-identical results)."""
    from anyseq_tpu.core.types import as_u8

    mode = Mode.parse(mode)
    if not isinstance(sc, LinearScoring):
        raise NotImplementedError("collective path supports linear scoring")
    if len(mesh.axis_names) != 1 or mesh.axis_names[0] != axis:
        raise ValueError(
            f"collective path needs a 1-D mesh over axis {axis!r}"
        )
    q8 = as_u8(query)
    s8 = as_u8(subject)
    m, n = len(q8), len(s8)
    if m == 0 or n == 0:
        raise ValueError("empty sequences are not supported")
    if m > band.M_MAX:
        raise ValueError(
            f"collective path supports m <= {band.M_MAX}; use the "
            "superstep path (dist.sharded) for taller problems"
        )
    K = mesh.shape[axis]
    if G is None:
        G = band._pick_g(m, _round_up(max(n, 1), band.W * K) // K,
                         emit_col=True)
    Nl = _round_up(max(n, 1), band.W * G * K) // K
    N_pad = Nl * K
    M_pad = band._bucket(m, band.W)
    MR = M_pad // band.LANES

    q = jnp.zeros((M_pad,), jnp.int32).at[:m].set(q8.astype(np.int32))
    s = jnp.full((N_pad,), 255, jnp.int32).at[:n].set(s8.astype(np.int32))
    jarr = jnp.arange(N_pad, dtype=Score)
    iarr = jnp.arange(M_pad, dtype=Score)
    if mode is Mode.GLOBAL:
        row0 = (jarr + 1) * sc.gap
        col0 = (iarr + 1) * sc.gap
    else:
        row0 = jnp.zeros_like(jarr)
        col0 = jnp.zeros_like(iarr)

    shard = NamedSharding(mesh, P(axis))
    s_sh = jax.device_put(s, shard)
    row0_sh = jax.device_put(row0, shard)
    nw = Nl // band.W

    def run(q_full, s_loc, row_loc, col_first):
        k = jax.lax.axis_index(axis)
        j0 = k * Nl
        if mode is Mode.GLOBAL:
            corner0 = (j0 * sc.gap).astype(Score)
        else:
            corner0 = jnp.int32(0)
        corners = band._band_corners(row_loc, corner0, nw)
        n_loc = jnp.clip(n - j0, 0, Nl)

        outs = band._score_band_padded(
            q_full.reshape(MR, band.LANES),
            s_loc.reshape(-1, band.LANES),
            row_loc.reshape(-1, band.LANES),
            col_first.reshape(-1, band.LANES),
            corners, jnp.int32(m), n_loc, mode, sc,
            emit_col=True, interpret=interpret, G=G,
            collective_axis=axis,
        )
        row_out = outs["last_row"][:Nl]
        ecol = outs["last_col"][:M_pad]
        owns = jnp.logical_and(j0 <= n - 1, n - 1 < j0 + Nl)
        ecol = jnp.where(owns, ecol, 0)
        ecol_all = jax.lax.psum(ecol, axis)

        best = outs["best"]
        if mode is Mode.LOCAL:
            valid = best[0] > SCORE_MIN
            best = jnp.where(
                valid,
                jnp.stack([best[0], best[1], best[2] + j0]),
                jnp.array([SCORE_MIN, -1, -1], Score),
            )
            bests = jax.lax.all_gather(best, axis)  # (K, 3)

            def merge(a, b):
                better = jnp.logical_or(
                    b[0] > a[0],
                    jnp.logical_and(
                        b[0] == a[0],
                        jnp.logical_or(
                            b[1] < a[1],
                            jnp.logical_and(b[1] == a[1], b[2] < a[2]),
                        ),
                    ),
                )
                return jnp.where(better, b, a)

            best = jax.lax.fori_loop(
                1, K, lambda i, acc: merge(acc, bests[i]), bests[0]
            )
        return row_out, ecol_all, best

    # jit the whole shard_map: eager shard_map dispatches each inner
    # primitive separately, and under the TPU interpreter the store
    # callbacks of one device can then block on async values of another
    # (observed deadlock for LOCAL's post-kernel all_gather/merge).
    row_out, ecol, best = jax.jit(jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    ))(q, s_sh, row0_sh, col0)

    return {"last_row": row_out, "last_col": ecol, "best": best}
