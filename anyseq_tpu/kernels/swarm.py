"""Pallas TPU "swarm" kernel: one problem per vector-lane position.

TPU-first engine for BATCHES of small pairs (the BASELINE 10k-pair
data-parallel workload; reference analog: one-task-per-part blockwise
iteration, iteration_cpu.impala:121-157 -- re-designed, not translated).

The wavefront kernel (kernels/band.py) is built for ONE large problem:
a 256 bp pair leaves >90% of its windows as padding and its dependency
chains latency-bound. The swarm layout instead assigns each of the 1024
positions of an (8, 128) vreg tile its OWN problem and sweeps all of
them in lockstep, row-major:

    step (i, j): every lane position p relaxes cell (i, j) of problem p.

All DP state is positional per lane -- there are NO cross-lane ops at
all (no rolls, no reductions on the hot path):

  prev row   H[i-1][*]  -- the ``last_row`` output buffer itself, read
                           at j (``up``) and overwritten at j after use.
  diag       H[i-1][j-1] -- register (last step's ``up``).
  left       H[i][j-1]   -- register (last step's ``new``).
  E (affine) E[i][j-1]   -- register (left-to-right recurrence).
  F (affine) F[i-1][j]   -- a second row buffer (scratch).

Per step: 2 aligned (8,128) loads (s[j], up), 1 store, and ~8 VPU ops
for 1024 cells -- no window padding, no stagger fill, any per-problem
(m, n) raggedness handled by exact lane masks. A tile sweeps M*N steps
for 1024 problems; the grid runs tiles sequentially in ONE dispatch.

Ragged lengths: per-problem (m, n) live in (8,128) registers; the
``act = i < m`` row mask freezes the last_row buffer, ``j == n-1``
collects the last column, and the local tracker masks on both -- exact
for ANY scoring scheme (no reliance on decaying pads, unlike the
band kernel's fast paths).

Predecessor emission (full-matrix construction): each step's 2-bit code
(4-bit affine, layout of engine/xla_affine.score_rows_affine_with_preds)
packs into an int32 word over SPW consecutive j; each finished row's
word plane DMAs to HBM from a double-buffered staging slot, overlapping
the next row's compute. ``unpack_preds_batch`` recovers dense (B, M, N)
matrices on device for the batched walk (predecessors.impala:36-46,
traceback.impala:47-80 semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anyseq_tpu.core.types import (
    SCORE_MIN,
    AffineScoring,
    LinearScoring,
    Mode,
    Score,
)
from anyseq_tpu.kernels.band import NEG, PAD_Q, PAD_S, _bucket, _round_up

LANES = 128
SUBL = 8
TILE = SUBL * LANES          # problems per tile

# Inner-loop unroll (one packed pred word per U steps for linear codes).
U = 16

# VMEM budget: q(M) + s(N) + last_row(N) + last_col(M) [+ frow(N) affine]
# blocks of 4 KiB each; keep one tile's working set under ~12 MiB of the
# 16 MiB scoped window.
def fits(M: int, N: int, affine: bool, emit_preds: bool) -> bool:
    rows = 2 * M + 2 * N + (N if affine else 0)
    if emit_preds:
        rows += 2 * (N // (8 if affine else 16)) * 2   # staging slots
    return rows * SUBL * LANES * 4 <= (12 << 20) and N % U == 0


def _make_kernel(mode: Mode, sc, M: int, N: int, emit_preds: bool,
                 need_pos: bool = True):
    local = mode is Mode.LOCAL
    is_global = mode is Mode.GLOBAL
    affine = isinstance(sc, AffineScoring)
    if affine:
        go, ge = sc.gap_open, sc.gap_extend
    else:
        g = sc.gap
    SPW = 8 if affine else 16     # codes per packed int32 word
    PB = 32 // SPW                # bits per code
    WPR = N // SPW                # words per row
    assert U % SPW == 0 or SPW % U == 0

    def _bc(v):
        """(8,128) broadcast of a scalar."""
        return jnp.zeros((SUBL, LANES), jnp.int32) + v

    def colb(i, sgap):
        """Left boundary H[i][-1] (i = -1 is the corner)."""
        if not is_global:
            return _bc(0)
        if affine:
            normal = jnp.where(i < 0, 0, go + (i + 1) * ge)
            return jnp.where(sgap == 1, jnp.int32(NEG), normal) + \
                jnp.zeros((SUBL, LANES), jnp.int32)
        return _bc(jnp.where(i < 0, 0, (i + 1) * g))

    def row0(j, sgap):
        """Top boundary H[-1][j]."""
        if not is_global:
            return _bc(0)
        if affine:
            return jnp.where(sgap == 1, (j + 1) * ge,
                             go + (j + 1) * ge) + \
                jnp.zeros((SUBL, LANES), jnp.int32)
        return _bc((j + 1) * g)

    def kernel(*refs):
        rest = list(refs)
        dims_ref = rest.pop(0)
        q_ref = rest.pop(0)
        s_ref = rest.pop(0)
        lastrow_ref = rest.pop(0)
        lastcol_ref = rest.pop(0)
        best_ref = rest.pop(0)
        pred_out_ref = rest.pop(0) if emit_preds else None
        frow_s = rest.pop(0) if affine else None
        if emit_preds:
            packstage_s = rest.pop(0)
            pack_sem = rest.pop(0)

        t = pl.program_id(0)
        m_arr = dims_ref[0:SUBL, :]
        n_arr = dims_ref[SUBL:2 * SUBL, :]
        sg_arr = dims_ref[2 * SUBL:3 * SUBL, :] if affine else None
        n_m1 = n_arr - 1
        m_m1 = m_arr - 1

        # --- init the row buffers with the top boundary
        def init_body(j, _):
            lastrow_ref[pl.ds(j * SUBL, SUBL), :] = row0(j, sg_arr)
            if affine:
                frow_s[pl.ds(j * SUBL, SUBL), :] = _bc(NEG)
            return 0

        jax.lax.fori_loop(0, N, init_body, 0)

        zero = jnp.zeros((SUBL, LANES), jnp.int32)
        neg = _bc(SCORE_MIN)

        def row_body(i, carry):
            score, colmax, vmax, vi, vj = carry
            act = i < m_arr                     # (8,128) row-live mask
            qi = q_ref[pl.ds(i * SUBL, SUBL), :]
            creg = colb(i, sg_arr)
            dreg = colb(i - 1, sg_arr)
            ereg = _bc(NEG)                     # unused unless affine
            lc = zero

            if emit_preds:
                # The staging slot for this row (i % 2) was last read by
                # the DMA started at the end of row i-2: drain it before
                # the first word lands in it.
                @pl.when(i >= 2)
                def _():
                    slot = jax.lax.rem(i, 2)
                    pltpu.make_async_copy(
                        packstage_s.at[pl.ds(slot * WPR * SUBL,
                                             WPR * SUBL), :],
                        pred_out_ref.at[pl.ds(0, WPR * SUBL), :],
                        pack_sem.at[slot],
                    ).wait()

            def jb_body(jb, jcarry):
                creg, dreg, ereg, lc, vmax, vi, vj = jcarry
                for ku in range(U):
                    j = jb * U + ku
                    sj = s_ref[pl.ds(j * SUBL, SUBL), :]
                    up = lastrow_ref[pl.ds(j * SUBL, SUBL), :]
                    sub = jnp.where(qi == sj, sc.match,
                                    sc.mismatch).astype(Score)
                    if affine:
                        fup = frow_s[pl.ds(j * SUBL, SUBL), :]
                        f_new = jnp.maximum(up + (go + ge), fup + ge)
                        e_new = jnp.maximum(creg + (go + ge), ereg + ge)
                        T_ = jnp.maximum(dreg + sub, f_new)
                        if local:
                            T_ = jnp.maximum(T_, 0)
                        new = jnp.maximum(T_, e_new)
                        frow_s[pl.ds(j * SUBL, SUBL), :] = f_new
                        ereg = e_new
                    else:
                        new = jnp.maximum(
                            dreg + sub,
                            jnp.maximum(up, creg) + g,
                        )
                        if local:
                            new = jnp.maximum(new, 0)

                    if emit_preds:
                        # codes per align.impala:37-64 / the affine
                        # 4-bit layout of xla_affine (PH | PE<<2 | PF<<3)
                        if affine:
                            ph = jnp.where(
                                new == dreg + sub, 3,
                                jnp.where(new == e_new, 1,
                                          jnp.where(new == f_new, 2, 0)),
                            )
                            pe = jnp.where(e_new == creg + (go + ge),
                                           0, 1)
                            pf = jnp.where(f_new == up + (go + ge),
                                           0, 1)
                            code = ph | (pe << 2) | (pf << 3)
                        else:
                            code = jnp.where(
                                new == dreg + sub, 3,
                                jnp.where(new == creg + g, 1,
                                          jnp.where(new == up + g, 2,
                                                    0)),
                            )
                        kw = ku % SPW
                        if kw == 0:
                            packw = code
                        else:
                            packw = packw | (code << (PB * kw))
                        if kw == SPW - 1:
                            # finished word -> staging slot (i % 2)
                            wj = jb * (U // SPW) + ku // SPW
                            slot = jax.lax.rem(i, 2)
                            packstage_s[
                                pl.ds((slot * WPR + wj) * SUBL, SUBL), :
                            ] = packw

                    # freeze the last_row buffer past each problem's
                    # final row (exact ragged-height handling)
                    store = jnp.where(act, new, up)
                    lastrow_ref[pl.ds(j * SUBL, SUBL), :] = store

                    lc = jnp.where(j == n_m1, new, lc)
                    if local:
                        better = jnp.logical_and(
                            new > vmax,
                            jnp.logical_and(act, j < n_arr),
                        )
                        vmax = jnp.where(better, new, vmax)
                        if need_pos:
                            vi = jnp.where(better, i, vi)
                            vj = jnp.where(better, j, vj)
                    dreg = up
                    creg = new
                return creg, dreg, ereg, lc, vmax, vi, vj

            (creg, dreg, ereg, lc, vmax, vi, vj) = jax.lax.fori_loop(
                0, N // U, jb_body,
                (creg, dreg, ereg, lc, vmax, vi, vj),
            )
            # per-row drains: the true last column, the mode trackers
            lastcol_ref[pl.ds(i * SUBL, SUBL), :] = lc
            if is_global:
                score = jnp.where(i == m_m1, lc, score)
            elif not local:
                colmax = jnp.where(act, jnp.maximum(colmax, lc), colmax)

            if emit_preds:
                # DMA the finished row's word plane to HBM (overlaps
                # the next row's compute; the slot is drained at i+2).
                slot = jax.lax.rem(i, 2)
                dst = (t * M + i) * WPR * SUBL
                pltpu.make_async_copy(
                    packstage_s.at[pl.ds(slot * WPR * SUBL,
                                         WPR * SUBL), :],
                    pred_out_ref.at[pl.ds(dst, WPR * SUBL), :],
                    pack_sem.at[slot],
                ).start()
            return score, colmax, vmax, vi, vj

        init = (neg, neg, neg, zero, zero)
        score, colmax, vmax, vi, vj = jax.lax.fori_loop(
            0, M, row_body, init
        )

        if emit_preds:
            # drain the last two row DMAs (M is static)
            for back in (2, 1):
                if M >= back:
                    pltpu.make_async_copy(
                        packstage_s.at[
                            pl.ds(((M - back) % 2) * WPR * SUBL,
                                  WPR * SUBL), :],
                        pred_out_ref.at[pl.ds(0, WPR * SUBL), :],
                        pack_sem.at[(M - back) % 2],
                    ).wait()

        if local:
            # vmax >= 0 always (cell (0, 0) is valid and clamped), and
            # the strict-> tracking already gives the batch engine's
            # (0, 0) position for an all-zero matrix.
            best_ref[0:SUBL, :] = jnp.maximum(vmax, 0)
            best_ref[SUBL:2 * SUBL, :] = vi
            best_ref[2 * SUBL:3 * SUBL, :] = vj
        elif is_global:
            best_ref[0:SUBL, :] = score
            best_ref[SUBL:2 * SUBL, :] = m_m1
            best_ref[2 * SUBL:3 * SUBL, :] = n_m1
        else:
            best_ref[0:SUBL, :] = colmax   # max over last column
            best_ref[SUBL:2 * SUBL, :] = zero
            best_ref[2 * SUBL:3 * SUBL, :] = zero

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "M", "N", "emit_preds", "need_pos",
                     "interpret"),
)
def _swarm_padded(dims, q, s, mode: Mode, sc, M: int, N: int,
                  emit_preds: bool = False, need_pos: bool = True,
                  interpret: bool = False):
    """dims: (T*3*8, 128) int32 [m | n | sgap] blocks per tile;
    q: (T*M*8, 128); s: (T*N*8, 128) -- problem p of tile t lives at
    (sublane p//128, lane p%128) of each block. Returns
    (last_rows, last_cols, best3[, packed_preds]) in the same layout."""
    affine = isinstance(sc, AffineScoring)
    T = q.shape[0] // (M * SUBL)
    SPW = 8 if affine else 16
    WPR = N // SPW

    kernel = _make_kernel(mode, sc, M, N, emit_preds, need_pos)

    def blk(rows):
        return pl.BlockSpec((rows, LANES), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((T * N * SUBL, LANES), jnp.int32),
        jax.ShapeDtypeStruct((T * M * SUBL, LANES), jnp.int32),
        jax.ShapeDtypeStruct((T * 3 * SUBL, LANES), jnp.int32),
    ]
    out_specs = [blk(N * SUBL), blk(M * SUBL), blk(3 * SUBL)]
    scratch = []
    if emit_preds:
        out_shape.append(jax.ShapeDtypeStruct(
            (T * M * WPR * SUBL, LANES), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if affine:
        scratch.append(pltpu.VMEM((N * SUBL, LANES), jnp.int32))
    if emit_preds:
        scratch += [
            pltpu.VMEM((2 * WPR * SUBL, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[blk(3 * SUBL), blk(M * SUBL), blk(N * SUBL)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(dims, q, s)
    return outs


def _to_tiles(arr2d, T, L):
    """(B, L) -> (T*L*8, 128) problem-per-lane tile layout."""
    a = arr2d.reshape(T, TILE, L).transpose(0, 2, 1)   # (T, L, 1024)
    return a.reshape(T * L * SUBL, LANES)


def _from_tiles(dev, T, L):
    """(T*L*8, 128) -> (T*1024, L)."""
    return dev.reshape(T, L, SUBL * LANES).transpose(0, 2, 1).reshape(
        T * TILE, L)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "M", "N", "emit_preds", "need_pos",
                     "interpret", "T"),
)
def _swarm_run(qarr, sarr, ms, ns, sgaps, mode: Mode, sc, M: int, N: int,
               T: int, emit_preds: bool = False, need_pos: bool = True,
               interpret: bool = False):
    """Device-side layout transform + kernel + inverse transform.
    qarr/sarr: (T*1024, M)/(T*1024, N) int32 (pre-padded rows);
    ms/ns/sgaps: (T*1024,) int32. Returns dict of (B, .) arrays."""
    dims = jnp.stack([
        ms.reshape(T, TILE), ns.reshape(T, TILE),
        sgaps.reshape(T, TILE),
    ], axis=1).reshape(T * 3, TILE)                    # (T*3, 1024)
    dims = dims.reshape(T * 3 * SUBL, LANES)
    # sequences arrive as uint8 (cheap transfer); widen on device
    q = _to_tiles(qarr, T, M).astype(jnp.int32)
    s = _to_tiles(sarr, T, N).astype(jnp.int32)
    outs = _swarm_padded(dims, q, s, mode, sc, M, N,
                         emit_preds=emit_preds, need_pos=need_pos,
                         interpret=interpret)
    res = {
        "last_rows": _from_tiles(outs[0], T, N),
        "last_cols": _from_tiles(outs[1], T, M),
        "best": _from_tiles(outs[2], T, 3),
    }
    if emit_preds:
        res["packed_preds"] = outs[3]
    return res


def extract_batch(res, ms, ns, mode: Mode):
    """Vectorized on-device mirror of
    xla_linmem.extract_score_from_outputs: (B,) scores + (B, 2) end
    positions, same candidate order and tie-breaking."""
    mode = Mode.parse(mode)
    B, N = res["last_rows"].shape
    M = res["last_cols"].shape[1]
    ms = ms.astype(jnp.int32)
    ns = ns.astype(jnp.int32)
    if mode is Mode.GLOBAL:
        score = jnp.take_along_axis(
            res["last_cols"], (ms - 1)[:, None], axis=1)[:, 0]
        return score, jnp.stack([ms - 1, ns - 1], axis=1)
    if mode is Mode.SEMIGLOBAL:
        NEGS = jnp.int32(SCORE_MIN)
        lr = jnp.where(jnp.arange(N)[None, :] < ns[:, None],
                       res["last_rows"], NEGS)
        lc = jnp.where(jnp.arange(M)[None, :] < ms[:, None],
                       res["last_cols"], NEGS)
        rmax = jnp.max(lr, axis=1)
        rarg = jnp.argmax(lr, axis=1).astype(jnp.int32)
        # row candidates with the j = -1 zero boundary prepended:
        # boundary wins ties (argmax over the concat picks index 0)
        score = jnp.maximum(rmax, 0)
        ej = jnp.where(0 >= rmax, -1, rarg)
        ei = ms - 1
        cmax = jnp.max(lc, axis=1)
        carg = jnp.argmax(lc, axis=1).astype(jnp.int32)
        cscore = jnp.maximum(cmax, 0)
        ci = jnp.where(0 >= cmax, -1, carg)
        take = cscore > score
        score = jnp.where(take, cscore, score)
        ei = jnp.where(take, ci, ei)
        ej = jnp.where(take, ns - 1, ej)
        return score, jnp.stack([ei, ej], axis=1)
    best = res["best"]
    return best[:, 0], best[:, 1:3]


def unpack_preds_batch(packed, T: int, M: int, N: int,
                       affine: bool = False):
    """Dense (T*1024, M, N) uint8 predecessor matrices from the swarm
    kernel's packed row-major word planes (device-side)."""
    SPW = 8 if affine else 16
    PB = 32 // SPW
    WPR = N // SPW
    w = packed.reshape(T, M, WPR, SUBL, LANES)
    w = w.transpose(0, 3, 4, 1, 2).reshape(T * TILE, M, WPR)
    shifts = (PB * jnp.arange(SPW, dtype=jnp.int32))[None, None, None, :]
    codes = (w[..., None] >> shifts) & ((1 << PB) - 1)
    return codes.reshape(T * TILE, M, N).astype(jnp.uint8)


def _pad_batch(qarr, sarr, ms, ns, sgaps=None):
    """Bucket + tile-pad a ragged batch for the swarm kernel.

    Sequences ship as uint8 (4x less host->device traffic than i32;
    on a tunneled TPU the upload otherwise dominates the whole batch).
    Pad bytes are ARBITRARY and may even collide with real symbols:
    every swarm tracker is exact-masked on (m, n), and cells outside a
    problem's true rectangle can never feed back into it (row-major
    sweep, strictly decreasing dependencies), so pads are inert."""
    ms = np.asarray(ms, np.int64)
    ns = np.asarray(ns, np.int64)
    B = int(ms.shape[0])
    M = _bucket(int(ms.max()), U)
    N = _bucket(int(ns.max()), U)
    T = -(-B // TILE)
    Bp = T * TILE

    q3 = np.full((Bp, M), 254, np.uint8)
    s3 = np.full((Bp, N), 255, np.uint8)
    qin = np.asarray(qarr)[:, :M]
    sin = np.asarray(sarr)[:, :N]
    q3[:B, :qin.shape[1]] = qin
    s3[:B, :sin.shape[1]] = sin
    msp = np.pad(ms, (0, Bp - B), constant_values=1).astype(np.int32)
    nsp = np.pad(ns, (0, Bp - B), constant_values=1).astype(np.int32)
    sg = np.zeros(Bp, np.int32)
    if sgaps is not None:
        sg[:B] = np.asarray(sgaps, np.int32)
    return q3, s3, msp, nsp, sg, M, N, T, B


def fits_batch(max_m: int, max_n: int, affine: bool,
               emit_preds: bool) -> bool:
    """VMEM feasibility on the raw (unbucketed) batch dims."""
    return fits(_bucket(max(int(max_m), 1), U),
                _bucket(max(int(max_n), 1), U), affine, emit_preds)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "M", "N", "T", "interpret"),
)
def _swarm_scores_jit(q3, s3, msp, nsp, sg, mode: Mode, sc, M, N, T,
                      interpret=False):
    res = _swarm_run(q3, s3, msp, nsp, sg, mode, sc, M, N, T,
                     need_pos=True, interpret=interpret)
    return extract_batch(res, msp, nsp, mode)


def score_batch_swarm(qarr, sarr, ms, ns, mode, sc, sgaps=None,
                      interpret: bool = False):
    """Scores + end positions for a batch of small pairs in ONE
    dispatch: swarm sweep + on-device extraction. Returns numpy
    ((B,) int scores, (B, 2) ends)."""
    mode = Mode.parse(mode)
    q3, s3, msp, nsp, sg, M, N, T, B = _pad_batch(qarr, sarr, ms, ns,
                                                  sgaps)
    score, end = _swarm_scores_jit(
        jnp.asarray(q3), jnp.asarray(s3), jnp.asarray(msp),
        jnp.asarray(nsp), jnp.asarray(sg), mode, sc, M, N, T,
        interpret=interpret,
    )
    score, end = jax.device_get((score, end))
    return np.asarray(score)[:B], np.asarray(end)[:B]


def score_pairs_swarm(qarr, sarr, ms, ns, mode, sc, sgaps=None,
                      need_pos: bool = True, interpret: bool = False,
                      emit_preds: bool = False):
    """Host driver: batch of small pairs through the swarm kernel.

    qarr: (B, >=max m) int-like; sarr: (B, >=max n); ms/ns: per-problem
    true lengths (host ints). Returns dict with last_rows (B, N),
    last_cols (B, M), best (B, 3) -- same per-problem contract as
    xla_linmem.score_rows -- plus packed_preds/T/M/N when
    ``emit_preds``. Caller must check :func:`fits` first.
    """
    mode = Mode.parse(mode)
    affine = isinstance(sc, AffineScoring)
    q3, s3, msp, nsp, sg, M, N, T, B = _pad_batch(qarr, sarr, ms, ns,
                                                  sgaps)
    res = _swarm_run(
        jnp.asarray(q3), jnp.asarray(s3), jnp.asarray(msp),
        jnp.asarray(nsp), jnp.asarray(sg), mode, sc, M, N, T,
        need_pos=need_pos, interpret=interpret, emit_preds=emit_preds,
    )
    out = {k: v[:B] for k, v in res.items() if k != "packed_preds"}
    if emit_preds:
        out["packed_preds"] = res["packed_preds"]
        out["T"], out["M"], out["N"] = T, M, N
    return out


def score_pairs_swarm_preds(qarr, sarr, ms, ns, mode, sc, sgaps=None,
                            interpret: bool = False):
    """Like :func:`score_pairs_swarm` with dense (B, M, N) uint8
    predecessor matrices unpacked on device (testing / host walks)."""
    res = score_pairs_swarm(qarr, sarr, ms, ns, mode, sc, sgaps=sgaps,
                            interpret=interpret, emit_preds=True)
    B = len(np.asarray(ms))
    res["preds"] = unpack_preds_batch(
        res["packed_preds"], res["T"], res["M"], res["N"],
        affine=isinstance(sc, AffineScoring))[:B]
    return res
