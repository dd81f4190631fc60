"""Subject-sharded single-pair wavefront over a device mesh ("sp" mode).

The DP matrix's subject axis is split into K contiguous stripes, one per
device on the "sp" mesh axis. Bands of H query rows flow through the chips
as a software pipeline: at super-step u, chip k relaxes band (u - k) of its
stripe and then sends its right-edge boundary column (H values + the
corner) to chip k+1 with ``jax.lax.ppermute`` -- the ICI analog of the
reference's corner/row/column boundary vectors between blocks
(scoring_cpu.impala:11-33). All chips work concurrently on successive
bands after a K-step fill, exactly like the reference's intra-device block
wavefront (iteration_cpu.impala:23-27) lifted across chips.

Pipeline efficiency: (B bands) / (B + K - 1 super-steps); choose H so that
B >> K.

The per-band, per-stripe relaxation runs through the Pallas boundary-mode
wavefront kernel on TPU (``engine="pallas"``; the same staggered-window
inner loop as the single-chip path, kernels/band.py) and falls back to the
portable row-scan + max-plus prefix-scan formulation elsewhere -- the
communication structure (ppermute of H+1 boundary values per superstep) is
identical for both. This mirrors the reference using the SAME fast inner
loop for every execution shape (iteration_acc.impala:30-83 vs :87-172).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anyseq_tpu.core.types import SCORE_MIN, LinearScoring, Mode, Score
from anyseq_tpu.engine import xla_linmem


def _round_up(x, m):
    return (x + m - 1) // m * m


def _band_compute_kernel(q_band, s_loc, row_in, col_in, j0, i0, h_local,
                         n, mode, sc, G, interpret):
    """Same contract as :func:`_band_compute`, computed by the Pallas
    boundary-mode wavefront kernel (kernels/band.py) instead of the XLA
    row-scan. Requires H % 128 == 0 and Nl % (G*1024) == 0.
    """
    from anyseq_tpu.kernels import band

    H = q_band.shape[0]
    Nl = s_loc.shape[0]
    num_windows = Nl // band.W
    corner = col_in[0]

    corners = band._band_corners(row_in, corner, num_windows)
    # Kernel-local n: count of valid columns in this stripe (global j < n
    # <=> local j < n - j0). Drives the edge-window ecol selection and the
    # local-mode valid mask.
    n_loc = jnp.clip(n - j0, 0, Nl)

    outs = band._score_band_padded(
        q_band.reshape(-1, band.LANES),
        s_loc.reshape(-1, band.LANES),
        row_in.reshape(-1, band.LANES),
        col_in[1:].reshape(-1, band.LANES),
        corners, h_local, n_loc, mode, sc,
        emit_col=True, interpret=interpret, G=G,
    )
    row_out = outs["last_row"][:Nl]
    col_out = jnp.concatenate(
        [jnp.reshape(row_in[Nl - 1], (1,)), outs["col_out"][:H]]
    )
    ecol = outs["last_col"][:H]
    best = outs["best"]
    if mode is Mode.LOCAL:
        # kernel best i is band-local; j is stripe-local.
        valid = best[0] > SCORE_MIN
        best = jnp.where(
            valid,
            jnp.stack([best[0], best[1] + i0, best[2] + j0]),
            jnp.array([SCORE_MIN, -1, -1], Score),
        )
    return row_out, col_out, ecol, best


def _band_compute(q_band, s_loc, row_in, col_in, j0, i0, h_local, n,
                  mode, sc):
    """Relax one band (H rows) of one stripe.

    q_band: (H,) query symbols of the band.
    s_loc: (Nl,) stripe subject symbols.
    row_in: (Nl,) boundary row = cells (i0-1, j) for this stripe.
    col_in: (H+1,) [0] = corner cell(i0-1, j0-1), [r+1] = cell(i0+r, j0-1).
    Returns (row_out, col_out, ecol, best) where row_out = cells
    (i0+h_local-1, j), col_out has the same layout as col_in but for the
    stripe's right edge, ecol[r] = cell(i0+r, n-1) if this stripe owns
    column n-1 (garbage otherwise), best = (score, i, j) running local max.
    """
    H = q_band.shape[0]
    Nl = s_loc.shape[0]
    jg = jnp.arange(Nl, dtype=Score) * sc.gap
    jmask = j0 + jnp.arange(Nl) < n
    e_loc = jnp.clip(n - 1 - j0, 0, Nl - 1)

    def body(r, carry):
        prev, col_out, ecol, best = carry
        active = r < h_local
        row = xla_linmem._row_update(
            prev, q_band[r], s_loc, col_in[r + 1], col_in[r], jg, mode, sc
        )
        row = jnp.where(active, row, prev)
        col_out = col_out.at[r + 1].set(
            jnp.where(active, row[Nl - 1], col_out[r + 1])
        )
        ecol = ecol.at[r].set(row[e_loc])
        if mode is Mode.LOCAL:
            masked = jnp.where(jmask, row, SCORE_MIN)
            rmax = jnp.max(masked)
            rarg = jnp.argmax(masked)
            take = jnp.logical_and(active, rmax > best[0])
            best = jnp.where(
                take,
                jnp.stack([rmax, (i0 + r).astype(Score),
                           (j0 + rarg).astype(Score)]),
                best,
            )
        return row, col_out, ecol, best

    col_out0 = jnp.zeros((H + 1,), Score).at[0].set(row_in[Nl - 1])
    init = (
        row_in,
        col_out0,
        jnp.zeros((H,), Score),
        jnp.array([SCORE_MIN, -1, -1], Score),
    )
    row_out, col_out, ecol, best = jax.lax.fori_loop(0, H, body, init)
    return row_out, col_out, ecol, best


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "H", "mesh", "axis", "use_kernel",
                     "G", "interpret"),
)
def _sharded_score(q, s_sh, row0_sh, m, n, mode: Mode, sc: LinearScoring,
                   H: int, mesh: Mesh, axis: str = "sp",
                   use_kernel: bool = False, G: int = 1,
                   interpret: bool = False):
    """q: (M_pad,) replicated; s_sh/row0_sh: (N_pad,) sharded over axis."""
    M_pad = q.shape[0]
    B = M_pad // H
    K = mesh.shape[axis]

    def run(q_full, s_loc, row_loc):
        k = jax.lax.axis_index(axis)
        Nl = s_loc.shape[0]
        j0 = k * Nl
        S = B + K - 1

        def superstep(carry, u):
            row_loc, col_in, ecol_acc, best = carry
            band = u - k
            active = jnp.logical_and(band >= 0, band < B)
            i0 = jnp.where(active, band, 0) * H
            h_local = jnp.clip(m - i0, 0, H)
            q_band = jax.lax.dynamic_slice(q_full, (i0,), (H,))

            # chip 0's left boundary is the init formula, not a message
            if mode is Mode.GLOBAL:
                col_form = (i0 + jnp.arange(H + 1, dtype=Score)) * sc.gap
            else:
                col_form = jnp.zeros((H + 1,), Score)
            col_bnd = jnp.where(k == 0, col_form, col_in)

            if use_kernel:
                row2, col_out, ecol, bbest = _band_compute_kernel(
                    q_band, s_loc, row_loc, col_bnd, j0, i0, h_local, n,
                    mode, sc, G, interpret,
                )
            else:
                row2, col_out, ecol, bbest = _band_compute(
                    q_band, s_loc, row_loc, col_bnd, j0, i0, h_local, n,
                    mode, sc,
                )
            row_loc = jnp.where(active, row2, row_loc)
            ecol_acc = jnp.where(
                active,
                jax.lax.dynamic_update_slice(ecol_acc, ecol, (i0,)),
                ecol_acc,
            )
            if mode is Mode.LOCAL:
                take = jnp.logical_and(active, bbest[0] > best[0])
                best = jnp.where(take, bbest, best)

            col_msg = jnp.where(active, col_out, col_in)
            col_in_next = jax.lax.ppermute(
                col_msg, axis, [(i, (i + 1) % K) for i in range(K)]
            )
            return (row_loc, col_in_next, ecol_acc, best), None

        init = (
            row_loc,
            jnp.zeros((H + 1,), Score),
            jnp.zeros((M_pad,), Score),
            jnp.array([SCORE_MIN, -1, -1], Score),
        )
        (row_loc, _, ecol_acc, best), _ = jax.lax.scan(
            superstep, init, jnp.arange(S)
        )

        # Only the stripe owning column n-1 has a valid ecol; zero others
        # then psum to replicate.
        owns = jnp.logical_and(j0 <= n - 1, n - 1 < j0 + Nl)
        ecol_acc = jnp.where(owns, ecol_acc, 0)
        ecol_all = jax.lax.psum(ecol_acc, axis)

        # local best: lexicographic (score, -i, -j) max across chips.
        if mode is Mode.LOCAL:
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
        return row_loc, ecol_all, best

    row_out, ecol, best = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )(q, s_sh, row0_sh)

    return {"last_row": row_out, "last_col": ecol, "best": best}


def score_pair_sharded(query, subject, mode, sc: LinearScoring,
                       mesh: Mesh, H: int = 4096, axis: str = "sp",
                       engine: str = "auto"):
    """Distributed score-only alignment of one (large) pair.

    engine: "pallas" (boundary-mode wavefront kernel per stripe-band,
    the TPU fast path), "pallas-interpret" (same, interpreted -- CPU
    testing), "xla" (portable row-scan), or "auto" (pallas on
    accelerators, xla otherwise).

    Returns the same outputs dict as xla_linmem.score_rows; combine with
    xla_linmem.extract_score_from_outputs.
    """
    from anyseq_tpu.core.types import as_u8

    mode = Mode.parse(mode)
    q8 = as_u8(query)
    s8 = as_u8(subject)
    m, n = len(q8), len(s8)
    if m == 0 or n == 0:
        raise ValueError("empty sequences are not supported")
    if engine == "auto":
        from anyseq_tpu.kernels import band as _band

        engine = "pallas" if _band.available() else "xla"
    use_kernel = engine in ("pallas", "pallas-interpret")
    interpret = engine == "pallas-interpret"
    K = mesh.shape[axis]
    G = 1
    if use_kernel:
        from anyseq_tpu.kernels import band as _band

        if H % 128 != 0:
            raise ValueError("kernel engine needs H % 128 == 0")
        # Pick the cost-effective chain count FIRST, then align the
        # stripe width to whole window groups (padding cost <= G-1
        # windows per stripe; a bad G costs far more than the padding).
        G = _band._pick_g(H, _round_up(max(n, 1), _band.W * K) // K,
                          emit_col=True)
        Nl = _round_up(max(n, 1), _band.W * G * K) // K
    else:
        Nl = _round_up(max(n, 1), 128 * K) // K
    N_pad = Nl * K
    M_pad = _round_up(m, H)

    q = jnp.zeros((M_pad,), jnp.int32).at[:m].set(q8.astype(np.int32))
    s = jnp.full((N_pad,), 255, jnp.int32).at[:n].set(s8.astype(np.int32))
    jarr = jnp.arange(N_pad, dtype=Score)
    if mode is Mode.GLOBAL:
        row0 = (jarr + 1) * sc.gap
    else:
        row0 = jnp.zeros_like(jarr)

    shard = NamedSharding(mesh, P(axis))
    s = jax.device_put(s, shard)
    row0 = jax.device_put(row0, shard)

    return _sharded_score(q, s, row0, jnp.int32(m), jnp.int32(n), mode, sc,
                          H, mesh, axis, use_kernel=use_kernel, G=G,
                          interpret=interpret)
