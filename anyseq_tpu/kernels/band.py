"""Pallas TPU wavefront kernel: skewed anti-diagonal DP over (8,128) vectors.

TPU-first design (NOT a translation of the reference's GPU path):

* A *window* is W = 8*128 = 1024 consecutive subject positions held as one
  (8, 128) vector register (j = sublane*128 + lane). A *band* is H query
  rows. The kernel sweeps each (band, window) parallelogram over
  ``h + W - 1`` anti-diagonal steps; every step relaxes 1024 DP cells with
  a handful of full-width VPU ops -- the moral equivalent of the reference
  GPU's 128-thread shared-memory rotation buffer (scoring_acc.impala:8-42)
  but 8x wider and with no barriers. A single TPU core is one wide vector
  processor: the reference's intra-device block wavefront
  (iteration_cpu.impala:23-27) is unnecessary on TPU; tiles run in the
  natural sequential order and wavefront parallelism only reappears across
  chips (anyseq_tpu/dist/).

* Rolling state lives in vector registers: ``d1`` (previous diagonal),
  ``d2s`` (shifted diagonal before it) and ``qd`` (query symbols along the
  diagonal), shifted one lane per step via two ``pltpu.roll``s and a lane-0
  fixup. Mosaic has no scalar VMEM access, so every scalar crossing uses
  the legal mechanism: per-step scalars (query symbol, column boundary)
  load/store in SMEM; vreg-lane extraction goes through a masked
  ``jnp.max`` reduce; the row-boundary injection is a purely positional
  ``where`` (source lane == destination lane, no scalar needed).

* Linear-memory boundaries exactly as the reference's row/column/corner
  vectors (scoring.impala:218-259): the subject-axis boundary row rides in
  an HBM buffer aliased in/out and blocked per window (VMEM); the
  query-axis boundary column is an SMEM scratch; the corner is an SMEM
  scalar.

Grid: (num_bands, num_windows), executed sequentially (row-major), the row
buffer carrying across bands. Scores are int32; relaxation is max-of-three,
bit-identical to the reference recurrence (align.impala:46-79).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anyseq_tpu.core.types import SCORE_MIN, LinearScoring, Mode, Score

# Window geometry: R sublanes x 128 lanes = W subject positions.
R = 8
LANES = 128
W = R * LANES

DEFAULT_H = 4096


def _shift_j(x, lane_iota):
    """shifted[j] = x[j-1] in the row-major (R,128) linearization.

    Lane 0 of sublane 0 receives wrap garbage; callers overwrite it."""
    a = pltpu.roll(x, 1, 1)
    b = pltpu.roll(a, 1, 0)
    return jnp.where(lane_iota == 0, b, a)


def _extract(vec, mask):
    """Scalar value of the single lane where mask is True."""
    return jnp.max(jnp.where(mask, vec, SCORE_MIN))


def _make_kernel(H: int, mode: Mode, sc: LinearScoring, emit_col: bool):
    local = mode is Mode.LOCAL
    is_global = mode is Mode.GLOBAL
    gap = sc.gap

    def kernel(dims_ref, q_ref, s_ref, row_ref, row_out_ref, col_out_ref,
               best_out_ref, colbuf_s, smem_s):
        b = pl.program_id(0)
        w = pl.program_id(1)
        m = dims_ref[0]
        n = dims_ref[1]

        i0 = b * H
        j0 = w * W
        h_local = jnp.minimum(H, m - i0)
        edge = n - 1 - j0  # lane of the true last column, if within [0, W)
        is_edge_w = jnp.logical_and(edge >= 0, edge < W)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        flat_iota = sub_iota * LANES + lane_iota
        last_mask = flat_iota == W - 1

        # Band-start corner init (reference: create_scoring_matrix_linmem,
        # scoring.impala:224-242). The column boundary needs no init pass:
        # at window 0 each colbuf slot is read exactly once, at step t, and
        # its init value is a closed-form of t -- selected in the step body
        # (static-bound init loops also crash this Mosaic toolchain).
        # colbuf_s[k] = cell(i0 + k, -1); smem_s[4] = corner cell(i0-1, -1).
        @pl.when(w == 0)
        def _():
            smem_s[4] = (i0 * gap) if is_global else 0

        @pl.when(jnp.logical_and(b == 0, w == 0))
        def _():
            smem_s[0] = SCORE_MIN
            smem_s[1] = -1
            smem_s[2] = -1

        s_syms = s_ref[:, :]
        rowv = row_ref[:, :]  # incoming boundary row (cells (i0-1, j))

        # Initial rolling state:
        # d1 = D_{-1}: only lane 0 read at t=0 (up of cell(0,0) = row_in[0])
        d1 = jnp.where(flat_iota == 0, rowv, 0)  # positional: lane 0 = row_in[0]
        # d2s = shift(D_{-2}): lane 0 at t=0 = diag of cell(0,0) = corner
        d2s = jnp.where(flat_iota == 0, smem_s[4], 0)
        qd = jnp.zeros((R, LANES), jnp.int32)
        lastrow = jnp.zeros((R, LANES), Score)
        vmax = jnp.full((R, LANES), SCORE_MIN, Score)
        vimax = jnp.zeros((R, LANES), jnp.int32)

        T = h_local + W - 1

        def step(t, carry):
            d1, d2s, qd, lastrow, vmax, vimax = carry

            # Query symbol entering at lane 0: q[band-local row t]
            qt = q_ref[jnp.minimum(t, h_local - 1)]
            qd = _shift_j(qd, lane_iota)
            qd = jnp.where(flat_iota == 0, qt, qd)

            # Left values: shift(D_{t-1}) with colbuf[t] = cell(t,-1) at lane 0
            tc = jnp.minimum(t, h_local - 1)
            if is_global:
                lcb0 = (i0 + tc + 1) * gap
            else:
                lcb0 = 0
            lcb = jnp.where(w == 0, lcb0, colbuf_s[tc])
            d1s = _shift_j(d1, lane_iota)
            d1s = jnp.where(flat_iota == 0, lcb, d1s)

            sub = jnp.where(qd == s_syms, sc.match, sc.mismatch).astype(Score)
            new = d2s + sub
            new = jnp.maximum(new, d1s + gap)
            new = jnp.maximum(new, d1 + gap)
            if local:
                new = jnp.maximum(new, 0)

            # Outgoing column boundary: cell(i_out, j0+W-1) -> colbuf[i_out].
            # Written after colbuf[i_out] was last read (step i_out < t).
            i_out = t - (W - 1)

            @pl.when(jnp.logical_and(i_out >= 0, i_out < h_local))
            def _():
                colbuf_s[i_out] = _extract(new, last_mask)

            if emit_col:
                # True last-column extraction (edge window only)
                i_e = t - edge

                @pl.when(
                    jnp.logical_and(
                        is_edge_w,
                        jnp.logical_and(i_e >= 0, i_e < h_local),
                    )
                )
                def _():
                    col_out_ref[i_e] = _extract(new, flat_iota == edge)

            # Bottom-row accumulation: lane t-(h_local-1) holds row h_local-1
            lastrow = jnp.where(flat_iota == t - (h_local - 1), new, lastrow)

            if local:
                valid = jnp.logical_and(
                    jnp.logical_and(flat_iota <= t, flat_iota > t - h_local),
                    j0 + flat_iota < n,
                )
                better = jnp.logical_and(valid, new > vmax)
                vmax = jnp.where(better, new, vmax)
                vimax = jnp.where(better, t - flat_iota, vimax)

            # Row-boundary injection for D_t: lane t+1 = row_in[t+1]
            # (purely positional: source lane == destination lane).
            rw = jnp.where(flat_iota == t + 1, rowv, new)
            return rw, d1s, qd, lastrow, vmax, vimax

        d1, d2s, qd, lastrow, vmax, vimax = jax.lax.fori_loop(
            0, T, step, (d1, d2s, qd, lastrow, vmax, vimax)
        )

        row_out_ref[:, :] = lastrow
        # Corner for the next window = this window's incoming row[W-1]
        smem_s[4] = _extract(rowv, last_mask)

        if local:
            # Merge this window's best into the running best with row-major
            # first-occurrence tie-breaking (smallest i, then smallest j).
            mval = jnp.max(vmax)
            icand = jnp.where(vmax == mval, vimax, jnp.int32(2**30))
            imin = jnp.min(icand)
            jcand = jnp.where(
                jnp.logical_and(vmax == mval, vimax == imin),
                flat_iota,
                jnp.int32(2**30),
            )
            jmin = jnp.min(jcand)
            gi = i0 + imin
            gj = j0 + jmin
            better = jnp.logical_or(
                mval > smem_s[0],
                jnp.logical_and(
                    mval == smem_s[0],
                    jnp.logical_or(
                        gi < smem_s[1],
                        jnp.logical_and(gi == smem_s[1], gj < smem_s[2]),
                    ),
                ),
            )

            @pl.when(better)
            def _():
                smem_s[0] = mval
                smem_s[1] = gi
                smem_s[2] = gj

        @pl.when(
            jnp.logical_and(
                b == pl.num_programs(0) - 1, w == pl.num_programs(1) - 1
            )
        )
        def _():
            best_out_ref[0] = smem_s[0]
            best_out_ref[1] = smem_s[1]
            best_out_ref[2] = smem_s[2]
            best_out_ref[3] = 0

    return kernel


def _round_up(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


@functools.partial(
    jax.jit, static_argnames=("mode", "sc", "H", "emit_col", "interpret")
)
def _score_padded(q1, s2, row0, m, n, mode: Mode, sc: LinearScoring,
                  H: int, emit_col: bool = True, interpret: bool = False):
    M_pad = q1.shape[0]
    N_pad = s2.shape[0] * LANES
    num_bands = M_pad // H
    num_windows = N_pad // W
    HB = H // LANES

    kernel = _make_kernel(H, mode, sc, emit_col)
    dims = jnp.stack([m, n]).astype(jnp.int32)

    grid = (num_bands, num_windows)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((H,), lambda b, w: (b,), memory_space=pltpu.SMEM),
        pl.BlockSpec((R, LANES), lambda b, w: (w, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, LANES), lambda b, w: (w, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((R, LANES), lambda b, w: (w, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H,), lambda b, w: (b,), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]

    row_out, col_out, best = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((N_pad // LANES, LANES), Score),
            jax.ShapeDtypeStruct((M_pad,), Score),
            jax.ShapeDtypeStruct((4,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((H,), Score),      # colbuf_s
            pltpu.SMEM((8,), jnp.int32),  # best (0..2), corner (4)
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(dims, q1, s2, row0)

    return {
        "last_row": row_out.reshape(-1),
        "last_col": col_out,
        "best": best[:3],
    }


def available() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False


def score_pair(qp, sp, m, n, mode: Mode, sc: LinearScoring,
               H: int | None = None, interpret: bool = False,
               emit_col: bool | None = None):
    """Score-only linear-memory DP via the Pallas band kernel.

    qp, sp: int32 arrays (host padding is fine; kernel repads internally).
    Returns the same output dict as xla_linmem.score_rows. When
    ``emit_col`` is False, ``last_col`` contains garbage (local mode does
    not need it; global reads its score from last_row via the driver).
    """
    mode = Mode.parse(mode)
    m_i = int(m)
    n_i = int(n)
    if emit_col is None:
        emit_col = mode is not Mode.LOCAL
    if H is None:
        H = DEFAULT_H
    M_pad = _round_up(m_i, W)
    if H > M_pad:
        H = M_pad
    M_pad = _round_up(M_pad, H)
    N_pad = _round_up(n_i, W)

    def _fit(arr, size, fill):
        out = jnp.full((size,), fill, jnp.int32)
        k = min(arr.shape[0], size)
        return out.at[:k].set(arr[:k])

    q1 = _fit(qp, M_pad, 0)
    s2 = _fit(sp, N_pad, 255).reshape(N_pad // LANES, LANES)

    jarr = jnp.arange(N_pad, dtype=Score)
    if mode is Mode.GLOBAL:
        row0 = (jarr + 1) * sc.gap
    else:
        row0 = jnp.zeros_like(jarr)
    row0 = row0.reshape(N_pad // LANES, LANES)

    return _score_padded(q1, s2, row0, jnp.int32(m_i), jnp.int32(n_i),
                         mode, sc, H, emit_col, interpret)
