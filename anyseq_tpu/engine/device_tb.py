"""On-device traceback over the kernel's packed predecessor layout.

The full-matrix traceback path traditionally fetches the O(m*n) pred
matrix to the host and walks there (reference: predc.get_matrix_cpu +
traceback_offset, align.impala:202-205). On a tunneled/remote TPU that
fetch dominates end-to-end time (tens of MB per alignment). Instead the
walk runs as a Pallas kernel on the TPU SCALAR CORE (XLA graph scalar
ops cost ~150 ns each on the serial decode chain; the scalar core runs
them at ~1 cycle): blocks of 8 steps decode from a handful of
row-aligned DMA windows, emitting only a packed code stream whose
positions are reconstructed as vectorized prefix sums -- only the
O(m+n) gapped strings leave the device. Size note: the code stream is
an SMEM output of (m+n)/2 bytes (affine: m+n); full-matrix traceback
at sizes where this could press SMEM limits is already HBM-infeasible
(the packed pred matrix itself is O(m*n/4) bytes) -- `align()` routes
such problems to the Hirschberg path.

Packed layout (see kernels/band.py): word for cell (i, j) at flat index
(w * p_pl + t // 16) * W + p with w = j // W, p = j % W, t = i + p; code
bits [2*(t%16), 2*(t%16)+2), codes per align.impala:37-40. Emission
convention matches ref/oracle.traceback (out position i + j + 1, gap
symbol '_').
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anyseq_tpu.core.types import (
    EMPTY_SYM,
    GAP_SYM,
    PRED_GAP_Q,
    PRED_GAP_S,
    PRED_NO_GAP,
    PRED_NONE,
    SCORE_MIN,
    Mode,
)
from anyseq_tpu.kernels.band import W



def _extract_traced(outs, m, n, M_pad, N_pad, mode: Mode):
    """Traced mirror of xla_linmem.extract_score_from_outputs (same
    candidate order and tie-breaking, boundary-wins-ties semiglobal)."""
    if mode is Mode.GLOBAL:
        lc = outs["last_col"]
        return lc[m - 1], m - 1, n - 1
    if mode is Mode.LOCAL:
        b = outs["best"]
        return b[0], b[1], b[2]
    NEGS = jnp.int32(SCORE_MIN)
    lrow = jnp.where(jnp.arange(N_pad) < n, outs["last_row"], NEGS)
    lcol = jnp.where(jnp.arange(M_pad) < m, outs["last_col"], NEGS)
    rmax = jnp.max(lrow)
    rarg = jnp.argmax(lrow).astype(jnp.int32)
    score = jnp.maximum(rmax, 0)
    ej = jnp.where(0 >= rmax, jnp.int32(-1), rarg)
    ei = jnp.int32(m - 1)
    cmax = jnp.max(lcol)
    carg = jnp.argmax(lcol).astype(jnp.int32)
    cscore = jnp.maximum(cmax, 0)
    ci = jnp.where(0 >= cmax, jnp.int32(-1), carg)
    take = cscore > score
    score = jnp.where(take, cscore, score)
    ei = jnp.where(take, ci, ei)
    ej = jnp.where(take, jnp.int32(n - 1), ej)
    return score, ei, ej


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "G", "out_len", "interpret"),
)
def _fulltb_fused(q2, s2, m, n, mode: Mode, sc, G, out_len: int,
                  interpret: bool = False):
    """Full-matrix traceback in ONE dispatch: pred-emitting wavefront
    sweep, on-device score/end extraction, on-device packed walk. One
    fetch returns everything (r4 ran these as 3+ dispatches with a
    host fetch between each -- ~5 tunnel round trips of the 295 ms
    'local fulltb 10k' suite row; reference runs score + host walk,
    align.impala:190-216)."""
    from anyseq_tpu.core.types import AffineScoring
    from anyseq_tpu.kernels import band as _b

    affine = isinstance(sc, AffineScoring)
    emit_col = mode is not Mode.LOCAL
    M_pad = q2.shape[0] * 128
    N_pad = s2.shape[0] * 128
    outs = _b._score_padded(q2, s2, m, n, mode, sc, emit_col=emit_col,
                            G=G, emit_preds=True, interpret=interpret)
    score, ei, ej = _extract_traced(outs, m, n, M_pad, N_pad, mode)
    # static packed-plane count (mirror of _score_padded's p_pl)
    p_pl = (M_pad + 2 * W) // (8 if affine else 16)
    walk = _walk_affine_pallas if affine else _walk_pallas
    oq, os, si, sj = walk(
        outs["packed_preds"], q2.reshape(-1), s2.reshape(-1), ei, ej,
        mode, p_pl, out_len, interpret=interpret)
    return jnp.stack([score, ei, ej, si, sj]), oq, os


def fulltb_fused(qp, sp, m, n, mode, sc, interpret=False):
    """Host driver for :func:`_fulltb_fused`. Returns
    (score, end, out_q, out_s, start) with one device round trip."""
    from anyseq_tpu.core.types import AffineScoring
    from anyseq_tpu.kernels import band as _b

    mode = Mode.parse(mode)
    m_i, n_i = int(m), int(n)
    emit_col = mode is not Mode.LOCAL
    G = _b._pick_g(m_i, n_i, emit_col,
                   isinstance(sc, AffineScoring))
    M_pad = _b._bucket(m_i, _b.W)
    if M_pad - m_i < _b.LANES:
        M_pad = _b._round_up(m_i + _b.LANES, _b.W)
    N_pad = _b._round_up(_b._bucket(n_i, _b.W), G * _b.W)
    q2 = _b._fit_padded(qp, M_pad, m_i, _b.PAD_Q)
    s2 = _b._fit_padded(sp, N_pad, n_i, _b.PAD_S)
    out_len = -(-(m_i + n_i + 1) // 256) * 256
    vals, oq, os = jax.device_get(_fulltb_fused(
        q2, s2, jnp.int32(m_i), jnp.int32(n_i), mode, sc, G, out_len,
        interpret=interpret,
    ))
    score, ei, ej, si, sj = (int(x) for x in vals)
    return (score, (ei, ej), np.asarray(oq)[: m_i + n_i],
            np.asarray(os)[: m_i + n_i], (si, sj))


def _make_walk_kernel(mode: Mode, p_pl: int, NB: int):
    """Pallas scalar-core walk: the XLA scan pays ~150 ns per scalar
    graph op on the serial decode chain (~50 us per 8-step block); on
    the TPU scalar core the same decode is ~1 cycle/op. Each block
    DMAs FOUR contiguous 8-word slices (two t-planes for the current
    window's columns p0-7..p0, two for the previous window when the
    column range wraps) and decodes 8 steps from SMEM registers,
    emitting one packed 16-bit code word per block; i/j positions are
    reconstructed vectorized afterwards (moves are a prefix sum of the
    codes)."""
    is_global = mode is Mode.GLOBAL

    def kernel(dims_ref, packed_ref, codes_ref, ij_ref, wbuf, sem):
        rows = packed_ref.shape[0]

        def block(b, carry):
            i0, j0 = carry
            j0c = jnp.maximum(j0, 0)
            p0 = jax.lax.rem(j0c, W)
            w0 = j0c // W
            tH = (i0 + p0) // 16
            base_cur = (w0 * p_pl + tH) * W
            tP = (i0 + W - 1) // 16
            base_prv = ((w0 - 1) * p_pl + tP) * W
            # four 8-word slices -> four row-aligned (2, 128) DMAs
            starts = (base_cur + p0 - 7, base_cur + p0 - 7 - W,
                      base_prv + W + p0 - 7, base_prv + p0 - 7)
            bases = []
            dmas = []
            for k_, s_ in enumerate(starts):
                r_ = jnp.clip(s_ // 128, 0, rows - 2)
                d = pltpu.make_async_copy(
                    packed_ref.at[pl.ds(r_, 2), :],
                    wbuf.at[pl.ds(k_ * 2, 2), :],
                    sem.at[k_],
                )
                d.start()
                dmas.append(d)
                bases.append(r_ * 128)
            for d in dmas:
                d.wait()

            i, j = i0, j0
            codesw = jnp.int32(0)
            for k in range(8):
                c = j0 - j
                prevwin = c > p0
                pcur = jnp.where(prevwin, W + p0 - c, p0 - c)
                t = i + pcur
                hi = (t // 16) == jnp.where(prevwin, tP, tH)
                addr = (jnp.where(prevwin, base_prv, base_cur)
                        + pcur - jnp.where(hi, 0, W))
                b_sel = jnp.where(
                    prevwin,
                    jnp.where(hi, bases[2], bases[3]),
                    jnp.where(hi, bases[0], bases[1]),
                )
                slot = jnp.where(
                    prevwin, jnp.where(hi, 2, 3), jnp.where(hi, 0, 1)
                )
                local = jnp.clip(addr - b_sel, 0, 255)
                word = wbuf[slot * 2 + local // 128,
                            jax.lax.rem(local, 128)]
                interior = (word >> (2 * jax.lax.rem(t, 16))) & 3
                if is_global:
                    bdy = jnp.where(
                        jnp.logical_and(i < 0, j < 0), PRED_NONE,
                        jnp.where(i < 0, PRED_GAP_Q, PRED_GAP_S),
                    )
                else:
                    bdy = jnp.int32(PRED_NONE)
                code = jnp.where(jnp.logical_or(i < 0, j < 0), bdy,
                                 interior)
                codesw = codesw | (code << (2 * k))
                live = code != PRED_NONE
                tq = jnp.logical_or(code == PRED_NO_GAP,
                                    code == PRED_GAP_S)
                ts_ = jnp.logical_or(code == PRED_NO_GAP,
                                     code == PRED_GAP_Q)
                i = i - jnp.logical_and(live, tq).astype(jnp.int32)
                j = j - jnp.logical_and(live, ts_).astype(jnp.int32)
            codes_ref[b] = codesw
            return i, j

        i, j = jax.lax.fori_loop(
            0, NB, block, (dims_ref[0], dims_ref[1])
        )
        ij_ref[0] = i
        ij_ref[1] = j

    return kernel


def _make_walk_kernel_affine(mode: Mode, p_pl: int, NB: int):
    """Affine (3-state Gotoh) scalar-core walk: 4-bit codes pack 8 per
    word (one 8-t-value plane per word), so a block of 8 steps (t span
    <= 16) needs THREE planes per window group -- six row-aligned
    (2, 128) DMAs. Each step emits a 4-bit token (di | dj<<1 | emit<<2)
    packed into one word per block; the state machine itself stays in
    the scalar carry. Semantics identical to _walk_affine."""
    is_global = mode is Mode.GLOBAL
    H_, E_, F_ = 0, 1, 2

    def kernel(dims_ref, packed_ref, tok_ref, ij_ref, wbuf, sem):
        rows = packed_ref.shape[0]

        def block(b, carry):
            i0, j0, st0 = carry
            j0c = jnp.maximum(j0, 0)
            p0 = jax.lax.rem(j0c, W)
            w0 = j0c // W
            tH = (i0 + p0) // 8
            base_cur = (w0 * p_pl + tH) * W
            tP = (i0 + W - 1) // 8
            base_prv = ((w0 - 1) * p_pl + tP) * W
            starts = (base_cur + p0 - 7,
                      base_cur + p0 - 7 - W,
                      base_cur + p0 - 7 - 2 * W,
                      base_prv + W + p0 - 7,
                      base_prv + p0 - 7,
                      base_prv - W + p0 - 7)
            bases = []
            dmas = []
            for k_, s_ in enumerate(starts):
                r_ = jnp.clip(s_ // 128, 0, rows - 2)
                d = pltpu.make_async_copy(
                    packed_ref.at[pl.ds(r_, 2), :],
                    wbuf.at[pl.ds(k_ * 2, 2), :],
                    sem.at[k_],
                )
                d.start()
                dmas.append(d)
                bases.append(r_ * 128)
            for d in dmas:
                d.wait()

            i, j, state = i0, j0, st0
            tokw = jnp.int32(0)
            for k in range(8):
                c = j0 - j
                prevwin = c > p0
                pcur = jnp.where(prevwin, W + p0 - c, p0 - c)
                t = i + pcur
                dpl = jnp.where(prevwin, tP, tH) - t // 8  # 0..2
                addr = (jnp.where(prevwin, base_prv, base_cur)
                        + pcur - dpl * W)
                slot = jnp.where(prevwin, 3, 0) + jnp.clip(dpl, 0, 2)
                b_sel = jnp.where(
                    prevwin,
                    jnp.where(dpl == 0, bases[3],
                              jnp.where(dpl == 1, bases[4], bases[5])),
                    jnp.where(dpl == 0, bases[0],
                              jnp.where(dpl == 1, bases[1], bases[2])),
                )
                local = jnp.clip(addr - b_sel, 0, 255)
                word = wbuf[slot * 2 + local // 128,
                            jax.lax.rem(local, 128)]
                c4 = (word >> (4 * jax.lax.rem(t, 8))) & 15
                ph_i, pe_i, pf_i = c4 & 3, (c4 >> 2) & 1, (c4 >> 3) & 1
                if is_global:
                    ph_b = jnp.where(
                        jnp.logical_and(i < 0, j < 0), PRED_NONE,
                        jnp.where(i < 0, PRED_GAP_Q, PRED_GAP_S),
                    )
                else:
                    ph_b = jnp.int32(PRED_NONE)
                off = jnp.logical_or(i < 0, j < 0)
                ph = jnp.where(off, ph_b, ph_i)
                pe = jnp.where(off, jnp.where(j >= 1, 1, 0), pe_i)
                pf = jnp.where(off, jnp.where(i >= 1, 1, 0), pf_i)

                stop_h = jnp.logical_and(state == H_, ph == PRED_NONE)
                done = jnp.logical_and(i < 0, j < 0)
                live = jnp.logical_not(jnp.logical_or(stop_h, done))
                in_h = state == H_
                diag = jnp.logical_and(in_h, ph == PRED_NO_GAP)
                to_e = jnp.logical_and(in_h, ph == PRED_GAP_Q)
                to_f = jnp.logical_and(in_h, ph == PRED_GAP_S)
                in_e = state == E_
                in_f = state == F_
                emit = jnp.logical_and(
                    live,
                    jnp.logical_or(diag, jnp.logical_or(in_e, in_f)),
                )
                di = jnp.logical_and(
                    live, jnp.logical_or(diag, in_f)).astype(jnp.int32)
                dj = jnp.logical_and(
                    live, jnp.logical_or(diag, in_e)).astype(jnp.int32)
                tok = di | (dj << 1) | (emit.astype(jnp.int32) << 2)
                tokw = tokw | (tok << (4 * k))
                new_state = jnp.where(
                    to_e, E_,
                    jnp.where(
                        to_f, F_,
                        jnp.where(jnp.logical_and(in_e, pe == 1), E_,
                                  jnp.where(jnp.logical_and(in_f,
                                                            pf == 1),
                                            F_, H_)),
                    ),
                )
                state = jnp.where(live, new_state, state)
                i = i - di
                j = j - dj
            tok_ref[b] = tokw
            return i, j, state

        i, j, _ = jax.lax.fori_loop(
            0, NB, block, (dims_ref[0], dims_ref[1], jnp.int32(H_))
        )
        ij_ref[0] = i
        ij_ref[1] = j

    return kernel


@functools.partial(
    jax.jit, static_argnames=("mode", "p_pl", "out_len", "interpret")
)
def _walk_affine_pallas(packed, q, s, end_i, end_j, mode: Mode,
                        p_pl: int, out_len: int,
                        interpret: bool = False):
    """Affine scalar-core walk + vectorized reconstruction. Scan
    length 2 * out_len as in _walk_affine (one non-emitting H -> E/F
    transition per gap run)."""
    steps = 2 * out_len
    NB = steps // 8
    kernel = _make_walk_kernel_affine(mode, p_pl, NB)
    toks, ij = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((12, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(jnp.stack([end_i, end_j]).astype(jnp.int32), packed)

    kidx = jnp.arange(steps)
    tok = (toks[kidx // 8] >> (4 * jax.lax.rem(kidx, 8))) & 15
    di = tok & 1
    dj = (tok >> 1) & 1
    emit = (tok >> 2) & 1
    ib = end_i - (jnp.cumsum(di) - di)
    jb = end_j - (jnp.cumsum(dj) - dj)
    # emitting steps always move; sym source = the moved-along axis
    sym_q = jnp.where(di == 1, q[jnp.maximum(ib, 0)].astype(jnp.uint8),
                      GAP_SYM)
    sym_s = jnp.where(dj == 1, s[jnp.maximum(jb, 0)].astype(jnp.uint8),
                      GAP_SYM)
    posb = jnp.where(emit == 1, ib + jb + 1, out_len - 1)
    posb = jnp.clip(posb, 0, out_len - 1)
    oq0 = jnp.full((out_len,), EMPTY_SYM, jnp.uint8)
    oq = oq0.at[posb].set(sym_q).at[out_len - 1].set(EMPTY_SYM)
    os = oq0.at[posb].set(sym_s).at[out_len - 1].set(EMPTY_SYM)
    return oq, os, ij[0] + 1, ij[1] + 1


@functools.partial(
    jax.jit, static_argnames=("mode", "p_pl", "out_len", "interpret")
)
def _walk_pallas(packed, q, s, end_i, end_j, mode: Mode, p_pl: int,
                 out_len: int, interpret: bool = False):
    """Scalar-core block walk (see _make_walk_kernel) + vectorized
    reconstruction: the kernel emits only the 2-bit code stream and the
    final (i, j); positions are a prefix sum over the decoded moves."""
    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as _pltpu

    NB = out_len // 8
    kernel = _make_walk_kernel(mode, p_pl, NB)
    codes, ij = _pl.pallas_call(
        kernel,
        in_specs=[
            _pl.BlockSpec(memory_space=_pltpu.SMEM),
            _pl.BlockSpec(memory_space=_pl.ANY),
        ],
        out_specs=[
            _pl.BlockSpec(memory_space=_pltpu.SMEM),
            _pl.BlockSpec(memory_space=_pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            _pltpu.SMEM((8, 128), jnp.int32),
            _pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(jnp.stack([end_i, end_j]).astype(jnp.int32), packed)

    kidx = jnp.arange(out_len)
    cb = (codes[kidx // 8] >> (2 * jax.lax.rem(kidx, 8))) & 3
    live = cb != PRED_NONE
    takes_q = jnp.logical_or(cb == PRED_NO_GAP, cb == PRED_GAP_S)
    takes_s = jnp.logical_or(cb == PRED_NO_GAP, cb == PRED_GAP_Q)
    mq = jnp.logical_and(live, takes_q).astype(jnp.int32)
    ms_ = jnp.logical_and(live, takes_s).astype(jnp.int32)
    ib = end_i - (jnp.cumsum(mq) - mq)      # exclusive prefix sums
    jb = end_j - (jnp.cumsum(ms_) - ms_)
    sym_q = jnp.where(takes_q, q[jnp.maximum(ib, 0)].astype(jnp.uint8),
                      GAP_SYM)
    sym_s = jnp.where(takes_s, s[jnp.maximum(jb, 0)].astype(jnp.uint8),
                      GAP_SYM)
    posb = jnp.where(live, ib + jb + 1, out_len - 1)
    oq0 = jnp.full((out_len,), EMPTY_SYM, jnp.uint8)
    oq = oq0.at[posb].set(sym_q).at[out_len - 1].set(EMPTY_SYM)
    os = oq0.at[posb].set(sym_s).at[out_len - 1].set(EMPTY_SYM)
    return oq, os, ij[0] + 1, ij[1] + 1


def walk_packed(outs, qp, sp, m, n, end, mode, interpret=None):
    """Walk the packed preds from `band.score_pair(..., emit_preds=True)`
    outputs. Returns (out_q, out_s, (start_i, start_j)) as numpy/ints."""
    from anyseq_tpu.kernels import band as _band

    mode = Mode.parse(mode)
    if interpret is None:
        interpret = not _band.available()
    # +1: slot out_len-1 is the reserved dead-park slot, never a live
    # position (without it, (m+n) % 256 == 0 would collide the final
    # alignment symbol with the reserved slot)
    out_len = -(-(m + n + 1) // 256) * 256
    oq, os, si, sj = _walk_pallas(
        outs["packed_preds"], qp, sp,
        jnp.int32(end[0]), jnp.int32(end[1]),
        mode, int(outs["p_pl"]), out_len, interpret=interpret,
    )
    return (np.asarray(oq)[: m + n], np.asarray(os)[: m + n],
            (int(si), int(sj)))



def walk_packed_affine(outs, qp, sp, m, n, end, mode, interpret=None):
    """Affine analog of :func:`walk_packed`."""
    from anyseq_tpu.kernels import band as _band

    mode = Mode.parse(mode)
    if interpret is None:
        interpret = not _band.available()
    # +1: slot out_len-1 is the dummy write target, never in [0, m+n)
    out_len = -(-(m + n + 1) // 256) * 256
    oq, os, si, sj = _walk_affine_pallas(
        outs["packed_preds"], qp, sp,
        jnp.int32(end[0]), jnp.int32(end[1]),
        mode, int(outs["p_pl"]), out_len, interpret=interpret,
    )
    return (np.asarray(oq)[: m + n], np.asarray(os)[: m + n],
            (int(si), int(sj)))
