"""Pallas TPU wavefront kernel: continuous-column anti-diagonal sweeps.

TPU-first design (NOT a translation of the reference's GPU path):

* A *window* is W = 8*128 = 1024 consecutive subject positions held as one
  (8, 128) vector register (j = sublane*128 + lane, row-major). Each
  window sweeps the ENTIRE query height in one parallelogram of
  ``m + W - 1`` anti-diagonal steps; every step relaxes 1024 DP cells with
  full-width VPU ops. Because the sweep is continuous there are no
  horizontal band boundaries at all -- the top boundary row is a closed
  form injected per step, and parallelogram efficiency is m/(m+W-1),
  i.e. ~100% for large m (the reference GPU pays kernel-launch barriers
  per 128-wide block anti-diagonal instead, iteration_acc.impala:30-83).

* Only the three rolling diagonals (``d1``, shifted ``d2s``, query
  symbols ``qd``) are loop carries, shifted one lane per step via two
  ``pltpu.roll``s and a lane-0 fixup; all accumulators (bottom row,
  outgoing column, exact last column, local max) live in VMEM scratch and
  are read-modify-written per step -- this Mosaic toolchain miscompiles /
  hangs on many-carry loops containing rolls.

* The only inter-window state is the boundary column (cell(i, j0-1) for
  all i) -- the linear-memory "column" vector of the reference
  (scoring.impala:218-259) -- kept in a VMEM scratch updated in place:
  per-step (8,128) chunk loads with mask+reduce lane extraction; no
  scalar memory traffic anywhere in the loop.

Grid: (num_windows,), sequential. Scores are int32; relaxation is
max-of-three, bit-identical to the reference recurrence
(align.impala:46-79).

Capacity: the column scratch is O(M) VMEM, capping single-call height at
M_MAX rows; taller problems fall back to the XLA engine (a banded/HBM-DMA
variant is the planned extension).
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

# VMEM cap for the column scratch (+ q + optional col_out): 512k rows of
# int32 = 2 MiB per buffer.
M_MAX = 512 * 1024


def _shift_j(x, lane_iota):
    """shifted[j] = x[j-1] in the row-major (R,128) linearization.

    Position (0,0) receives wrap garbage; callers overwrite it."""
    a = pltpu.roll(x, 1, 1)
    b = pltpu.roll(a, 1, 0)
    return jnp.where(lane_iota == 0, b, a)


def _extract(vec, mask):
    """Scalar value of the single position where mask is True."""
    return jnp.max(jnp.where(mask, vec, SCORE_MIN))


def _make_kernel(mode: Mode, sc: LinearScoring, emit_col: bool):
    local = mode is Mode.LOCAL
    is_global = mode is Mode.GLOBAL
    gap = sc.gap

    def topval(j):
        """Boundary row cell(-1, j) (j may be negative: the corner chain)."""
        if is_global:
            return (j + 1) * gap
        return j * 0

    def kernel(dims_ref, q_ref, s_ref, row_out_ref, col_out_ref,
               best_out_ref, colbuf_s, lastrow_s, colacc_s, ecol_s,
               vmax_s, vimax_s, smem_s):
        w = pl.program_id(0)
        m = dims_ref[0]
        n = dims_ref[1]
        j0 = w * W
        edge = n - 1 - j0  # lane of the true last column, if within [0, W)
        is_edge_w = jnp.logical_and(edge >= 0, edge < W)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        flat_iota = sub_iota * LANES + lane_iota
        last_mask = flat_iota == W - 1

        @pl.when(w == 0)
        def _():
            smem_s[0] = SCORE_MIN
            smem_s[1] = -1
            smem_s[2] = -1

        lastrow_s[:, :] = jnp.zeros((R, LANES), Score)
        colacc_s[:, :] = jnp.zeros((R, LANES), Score)
        if emit_col:
            ecol_s[:, :] = jnp.zeros((R, LANES), Score)
        if local:
            vmax_s[:, :] = jnp.full((R, LANES), SCORE_MIN, Score)
            vimax_s[:, :] = jnp.zeros((R, LANES), jnp.int32)

        s_syms = s_ref[:, :]

        # Initial rolling state: d1 = D_{-1} (lane 0 = up of cell(0, j0) =
        # topval(j0)); d2s = shift(D_{-2}) (lane 0 = corner topval(j0-1)).
        d1 = jnp.where(flat_iota == 0, topval(j0), 0).astype(Score)
        d2s = jnp.where(flat_iota == 0, topval(j0 - 1), 0).astype(Score)
        qd = jnp.zeros((R, LANES), jnp.int32)

        T = m + W - 1

        def step(t, carry):
            d1, d2s, qd = carry
            tm = jax.lax.rem(t, W)
            # q/col chunk values are only consumed while t < m; clamp so
            # the sweep tail never loads out of range.
            crow = pl.multiple_of(
                jax.lax.div(jnp.minimum(t, m - 1), W) * R, R
            )
            qv = q_ref[pl.ds(crow, R), :]
            pos_mask = flat_iota == tm

            # Query symbol entering at lane 0: q[t]
            qt = _extract(qv, pos_mask)
            qd = _shift_j(qd, lane_iota)
            qd = jnp.where(flat_iota == 0, qt, qd)

            # Left boundary value cell(t, j0-1) at lane 0 (window 0 uses
            # the closed-form init column, scoring.impala:224-231)
            if is_global:
                lcb = jnp.where(
                    w == 0,
                    (t + 1) * gap,
                    _extract(colbuf_s[pl.ds(crow, R), :], pos_mask),
                )
            else:
                lcb = jnp.where(
                    w == 0, 0, _extract(colbuf_s[pl.ds(crow, R), :], pos_mask)
                )
            d1s = _shift_j(d1, lane_iota)
            d1s = jnp.where(flat_iota == 0, lcb, d1s)

            sub = jnp.where(qd == s_syms, sc.match, sc.mismatch).astype(Score)
            new = d2s + sub
            new = jnp.maximum(new, d1s + gap)
            new = jnp.maximum(new, d1 + gap)
            if local:
                new = jnp.maximum(new, 0)

            # Outgoing boundary column: cell(i_out, j0+W-1), i_out = t-W+1,
            # accumulated at position i_out % W in scratch and flushed
            # chunk-wise (in-place reads already consumed those rows).
            i_out = t - (W - 1)
            v_out = _extract(new, last_mask)
            colacc = jnp.where(
                flat_iota == jax.lax.rem(t + 1, W), v_out, colacc_s[:, :]
            )
            colacc_s[:, :] = colacc

            @pl.when(i_out >= 0)
            def _():
                orow = pl.multiple_of(jax.lax.div(i_out, W) * R, R)
                colbuf_s[pl.ds(orow, R), :] = colacc

            if emit_col:
                @pl.when(is_edge_w)
                def _():
                    i_e = t - edge
                    v_e = _extract(new, flat_iota == edge)
                    ecol = jnp.where(
                        flat_iota == jax.lax.rem(i_e, W), v_e, ecol_s[:, :]
                    )
                    ecol_s[:, :] = ecol

                    @pl.when(jnp.logical_and(i_e >= 0, i_e < m))
                    def _():
                        erow = pl.multiple_of(jax.lax.div(i_e, W) * R, R)
                        col_out_ref[pl.ds(erow, R), :] = ecol

            # Bottom row H[m-1]: position t-(m-1) per step
            lastrow_s[:, :] = jnp.where(
                flat_iota == t - (m - 1), new, lastrow_s[:, :]
            )

            if local:
                valid = jnp.logical_and(
                    jnp.logical_and(flat_iota <= t, flat_iota > t - m),
                    j0 + flat_iota < n,
                )
                better = jnp.logical_and(valid, new > vmax_s[:, :])
                vimax_s[:, :] = jnp.where(
                    better, t - flat_iota, vimax_s[:, :]
                )
                vmax_s[:, :] = jnp.where(better, new, vmax_s[:, :])

            # Top boundary row injection for D_t: lane t+1 = topval(j0+t+1)
            rw = jnp.where(flat_iota == t + 1, topval(j0 + t + 1), new)
            return rw, d1s, qd

        d1, d2s, qd = jax.lax.fori_loop(0, T, step, (d1, d2s, qd))

        row_out_ref[:, :] = lastrow_s[:, :]

        if local:
            # Merge this window's best into the running best with row-major
            # first-occurrence tie-breaking (smallest i, then smallest j).
            vmax = vmax_s[:, :]
            vimax = vimax_s[:, :]
            mval = jnp.max(vmax)
            icand = jnp.where(vmax == mval, vimax, jnp.int32(2**30))
            imin = jnp.min(icand)
            jcand = jnp.where(
                jnp.logical_and(vmax == mval, vimax == imin),
                flat_iota,
                jnp.int32(2**30),
            )
            jmin = jnp.min(jcand)
            gi = imin
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

        @pl.when(w == pl.num_programs(0) - 1)
        def _():
            best_out_ref[0] = smem_s[0]
            best_out_ref[1] = smem_s[1]
            best_out_ref[2] = smem_s[2]
            best_out_ref[3] = 0

    return kernel


def _round_up(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


def _bucket(x: int) -> int:
    """Geometric shape bucket (multiples of W, ratio <= 1.25) to bound the
    number of compiled variants; the dynamic true length drives the sweep,
    so m-padding costs only VMEM and n-padding at most 25% extra windows."""
    x = _round_up(x, W)
    base = W
    while base * 2 < x:
        base *= 2
    for frac in (4, 5, 6, 7, 8):
        cand = base * frac // 4
        if cand >= x:
            return _round_up(cand, W)
    return _round_up(base * 2, W)


@functools.partial(
    jax.jit, static_argnames=("mode", "sc", "emit_col", "interpret")
)
def _score_padded(q2, s2, m, n, mode: Mode, sc: LinearScoring,
                  emit_col: bool = True, interpret: bool = False):
    M_pad = q2.shape[0] * LANES
    N_pad = s2.shape[0] * LANES
    num_windows = N_pad // W
    MR = M_pad // LANES

    kernel = _make_kernel(mode, sc, emit_col)
    dims = jnp.stack([m, n]).astype(jnp.int32)

    row_out, col_out, best = pl.pallas_call(
        kernel,
        grid=(num_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q, whole array
            pl.BlockSpec((R, LANES), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, LANES), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # col_out, whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_pad // LANES, LANES), Score),
            jax.ShapeDtypeStruct((MR, LANES), Score),
            jax.ShapeDtypeStruct((4,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((MR, LANES), Score),   # colbuf
            pltpu.VMEM((R, LANES), Score),    # lastrow
            pltpu.VMEM((R, LANES), Score),    # colacc
            pltpu.VMEM((R, LANES), Score),    # ecol
            pltpu.VMEM((R, LANES), Score),    # vmax
            pltpu.VMEM((R, LANES), jnp.int32),  # vimax
            pltpu.SMEM((8,), jnp.int32),      # running best
        ],
        interpret=interpret,
    )(dims, q2, s2)

    return {
        "last_row": row_out.reshape(-1),
        "last_col": col_out.reshape(-1),
        "best": best[:3],
    }


def available() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False


def supports(m: int) -> bool:
    return m <= M_MAX


def score_pair(qp, sp, m, n, mode: Mode, sc: LinearScoring,
               H: int | None = None, interpret: bool = False,
               emit_col: bool | None = None):
    """Score-only linear-memory DP via the Pallas wavefront kernel.

    qp, sp: int32 arrays (host padding is fine; kernel repads internally).
    Returns the same output dict as xla_linmem.score_rows. When
    ``emit_col`` is False, ``last_col`` contains garbage (local mode does
    not need it). ``H`` is accepted for API compatibility and ignored
    (the sweep is continuous; there are no bands).
    """
    mode = Mode.parse(mode)
    m_i = int(m)
    n_i = int(n)
    if m_i > M_MAX:
        raise ValueError(
            f"pallas kernel supports m <= {M_MAX}; use the XLA engine or "
            "the sharded path for taller problems"
        )
    if emit_col is None:
        emit_col = mode is not Mode.LOCAL
    M_pad = _bucket(m_i)
    N_pad = _bucket(n_i)

    def _fit(arr, size, fill):
        out = jnp.full((size,), fill, jnp.int32)
        k = min(arr.shape[0], size)
        return out.at[:k].set(arr[:k]).reshape(size // LANES, LANES)

    q2 = _fit(qp, M_pad, 0)
    s2 = _fit(sp, N_pad, 255)

    return _score_padded(q2, s2, jnp.int32(m_i), jnp.int32(n_i),
                         mode, sc, emit_col, interpret)
