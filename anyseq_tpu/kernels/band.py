"""Pallas TPU wavefront kernel: continuous-column anti-diagonal sweeps.

TPU-first design (NOT a translation of the reference's GPU path):

* A *window* is W = 8*128 = 1024 consecutive subject positions held as one
  (8, 128) vector register (j = sublane*128 + lane, row-major). Each
  window sweeps the ENTIRE query height in one parallelogram of
  ~``m + W`` anti-diagonal steps; every step relaxes 1024 DP cells with
  full-width VPU ops. Because the sweep is continuous there are no
  horizontal band boundaries at all -- the top boundary row is a closed
  form injected per step, and parallelogram efficiency is ~100% for large
  m (the reference GPU pays kernel-launch barriers per 128-wide block
  anti-diagonal instead, iteration_acc.impala:30-83).

* The dataflow is *fully positional* -- no cross-lane reductions on the
  critical path. Rolling state in vector registers, all shifted by one
  position per step via two ``pltpu.roll``s and a lane fixup:
    d1, d2s  -- previous two anti-diagonals (shift right)
    qd       -- query symbols along the diagonal (shift right)
    qfeed    -- upcoming query symbols; position 0 is always q[t]
                (shift left, chunk-reloaded every W steps)
    colfeed  -- upcoming left-boundary values; position 0 is always
                cell(t, j0-1) (shift left, chunk-reloaded)
    colacc   -- outgoing boundary column; each step the value at the
                window's last position enters at position W-1 and shifts
                left, so a finished chunk is exactly in layout order and
                flushes with one aligned vector store every W steps.

* The only inter-window state is the boundary column (the linear-memory
  "column" vector of the reference, scoring.impala:218-259) in a VMEM
  scratch updated in place; chunk reads always precede the in-place
  writes of the same rows by a full window width.

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


def _shift_r(x, lane_iota):
    """shifted[p] = x[p-1] (row-major). Position (0,0) gets wrap garbage."""
    a = pltpu.roll(x, 1, 1)
    b = pltpu.roll(a, 1, 0)
    return jnp.where(lane_iota == 0, b, a)


def _shift_l(x, lane_iota):
    """shifted[p] = x[p+1]. Position (R-1,127) gets wrap garbage.
    (pltpu.roll requires non-negative shifts; left = roll by size-1.)"""
    a = pltpu.roll(x, LANES - 1, 1)
    b = pltpu.roll(a, R - 1, 0)
    return jnp.where(lane_iota == LANES - 1, b, a)


def _extract(vec, mask):
    """Scalar value of the single position where mask is True (off the
    hot path -- only used for edge-column emission)."""
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
               best_out_ref, colbuf_s, qfeed_s, colfeed_s, lastrow_s,
               colacc_s, ecol_s, vmax_s, vimax_s, smem_s):
        w = pl.program_id(0)
        m = dims_ref[0]
        n = dims_ref[1]
        j0 = w * W
        edge = n - 1 - j0  # position of the true last column, if in [0, W)
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

        if emit_col:
            ecol_s[:, :] = jnp.zeros((R, LANES), Score)
        if local:
            vmax_s[:, :] = jnp.full((R, LANES), SCORE_MIN, Score)
            vimax_s[:, :] = jnp.zeros((R, LANES), jnp.int32)

        s_syms = s_ref[:, :]

        # Initial rolling state: d1 = D_{-1} (pos 0 = up of cell(0, j0) =
        # topval(j0)); d2s = shift(D_{-2}) (pos 0 = corner topval(j0-1)).
        d1 = jnp.where(flat_iota == 0, topval(j0), 0).astype(Score)
        d2s = jnp.where(flat_iota == 0, topval(j0 - 1), 0).astype(Score)
        qd = jnp.zeros((R, LANES), jnp.int32)
        qfeed_s[:, :] = q_ref[0:R, :]
        colfeed_s[:, :] = colbuf_s[0:R, :]
        lastrow_s[:, :] = jnp.zeros((R, LANES), Score)
        colacc_s[:, :] = jnp.zeros((R, LANES), Score)

        # Sweep to the end of the last (possibly padding) chunk so every
        # colacc chunk flushes inside the loop; the trip count is a
        # multiple of the unroll factor U (8 | W so chunk events land on
        # fixed substeps).
        U = 16
        Mr_used = jax.lax.div(m + W - 1, W)
        T = Mr_used * W + W  # multiple of U covering Mr_used*W + W - 1

        def iter8(it, carry):
            d1, d2s, qd = carry
            t0 = it * U
            tm = jax.lax.rem(t0, W)
            fresh = tm == 0
            # chunk loads clamp at m-1: values are only consumed for t < m
            crow = pl.multiple_of(
                jax.lax.div(jnp.minimum(t0, m - 1), W) * R, R
            )
            qfeed = jnp.where(fresh, q_ref[pl.ds(crow, R), :],
                              qfeed_s[:, :])
            colfeed = jnp.where(fresh, colbuf_s[pl.ds(crow, R), :],
                                colfeed_s[:, :])
            lastrow = lastrow_s[:, :]
            colacc = colacc_s[:, :]
            if local:
                vmax = vmax_s[:, :]
                vimax = vimax_s[:, :]

            for k in range(U):
                t = t0 + k

                # Query symbol entering the diagonal at position 0: q[t]
                # == qfeed position 0 (purely positional select).
                qd = _shift_r(qd, lane_iota)
                qd = jnp.where(flat_iota == 0, qfeed, qd)

                # Left boundary cell(t, j0-1) at position 0 (window 0
                # uses the closed-form init column, scoring.impala:224).
                if is_global:
                    lcb0 = (t + 1) * gap
                else:
                    lcb0 = 0
                d1s = _shift_r(d1, lane_iota)
                d1s = jnp.where(
                    flat_iota == 0,
                    jnp.where(w == 0, lcb0, colfeed),
                    d1s,
                )

                sub = jnp.where(
                    qd == s_syms, sc.match, sc.mismatch
                ).astype(Score)
                new = d2s + sub
                new = jnp.maximum(new, d1s + gap)
                new = jnp.maximum(new, d1 + gap)
                if local:
                    new = jnp.maximum(new, 0)

                # Outgoing boundary column: the value at position W-1
                # (cell (t-W+1, j0+W-1)) enters colacc at position W-1
                # and shifts left; a complete chunk is in layout order.
                colacc = jnp.where(last_mask, new,
                                   _shift_l(colacc, lane_iota))

                # Chunk flush when (t+2) % W == 0, i.e. substep W-2 mod U
                if k == (W - 2) % U:
                    @pl.when(jnp.logical_and(
                        t >= 2 * W - 2, jax.lax.rem(t + 2, W) == 0
                    ))
                    def _(colacc=colacc, t=t):
                        c = jax.lax.div(t + 2, W) - 2
                        orow = pl.multiple_of(c * R, R)
                        colbuf_s[pl.ds(orow, R), :] = colacc

                if emit_col:
                    # Exact last-column emission (edge window only; the
                    # reduce is off the hot path: 1/num_windows of steps)
                    @pl.when(is_edge_w)
                    def _(new=new, t=t):
                        i_e = t - edge
                        v_e = _extract(new, flat_iota == edge)
                        ecol = jnp.where(
                            flat_iota == jax.lax.rem(i_e, W), v_e,
                            ecol_s[:, :],
                        )
                        ecol_s[:, :] = ecol

                        @pl.when(jnp.logical_and(i_e >= 0, i_e < m))
                        def _():
                            erow = pl.multiple_of(
                                jax.lax.div(i_e, W) * R, R
                            )
                            col_out_ref[pl.ds(erow, R), :] = ecol

                # Bottom row H[m-1]: position t-(m-1) per step
                lastrow = jnp.where(flat_iota == t - (m - 1), new, lastrow)

                if local:
                    valid = jnp.logical_and(
                        jnp.logical_and(flat_iota <= t, flat_iota > t - m),
                        j0 + flat_iota < n,
                    )
                    better = jnp.logical_and(valid, new > vmax)
                    vimax = jnp.where(better, t - flat_iota, vimax)
                    vmax = jnp.where(better, new, vmax)

                # Top boundary row injection for D_t: position t+1 =
                # topval(j0+t+1) (closed-form broadcast select).
                rw = jnp.where(flat_iota == t + 1, topval(j0 + t + 1), new)

                d2s = d1s
                d1 = rw
                qfeed = _shift_l(qfeed, lane_iota)
                colfeed = _shift_l(colfeed, lane_iota)

            qfeed_s[:, :] = qfeed
            colfeed_s[:, :] = colfeed
            lastrow_s[:, :] = lastrow
            colacc_s[:, :] = colacc
            if local:
                vmax_s[:, :] = vmax
                vimax_s[:, :] = vimax
            return d1, d2s, qd

        carry = (d1, d2s, qd)
        carry = jax.lax.fori_loop(0, jax.lax.div(T, U), iter8, carry)

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
            pltpu.VMEM((MR, LANES), Score),     # colbuf
            pltpu.VMEM((R, LANES), jnp.int32),  # qfeed
            pltpu.VMEM((R, LANES), Score),      # colfeed
            pltpu.VMEM((R, LANES), Score),      # lastrow
            pltpu.VMEM((R, LANES), Score),      # colacc
            pltpu.VMEM((R, LANES), Score),      # ecol
            pltpu.VMEM((R, LANES), Score),      # vmax
            pltpu.VMEM((R, LANES), jnp.int32),  # vimax
            pltpu.SMEM((8,), jnp.int32),        # running best
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
