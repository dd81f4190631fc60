"""Linear-memory (Hirschberg) traceback engine.

Capability parity with the reference's default alignment-construction path
(``traceback_lintime``, align.impala:237-311 + traceback_lintime.impala),
re-designed for correctness and the TPU engine stack:

* The divide step aligns the left subject half forward and the right half
  on *reversed* sequences, then merges the two boundary columns with
  ``argmax_k L[k] + R[h-k-2]`` including the +-1 edge cases -- exactly the
  reference's ``hb_sum`` (traceback_lintime.impala:44-135) and reversed
  half accessors (traceback_lintime.impala:137-148).

* Deliberate deviations (documented; the reference's construct paths for
  non-global schemes are semantically unreliable, see SURVEY.md Q1/Q6):
  - semiglobal/local alignments are reduced to a global Hirschberg on the
    end-point rectangle found by forward + reverse score passes (the
    standard score-preserving reduction); the returned score is the true
    DP score (the reference returns a bogus score from a fresh unwritten
    matrix for these paths, align.impala:244+264).
  - split ties resolve to the smallest k (reference ties depend on block
    iteration order).
  - subject splits at n//2 instead of the reference's next-pow-2 part
    grid; equal-score alignments may differ in tie cells only.

Memory: O(m + n) per level plus O(h * MIN_WIDTH) for the final predecessor
stripes -- the reference's ragged blockwise predecessor matrix
(predecessors.impala:36-46).
"""
from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from anyseq_tpu.core.types import (
    EMPTY_SYM,
    SCORE_MIN,
    AffineScoring,
    Alignment,
    LinearScoring,
    Mode,
    as_u8,
)
from anyseq_tpu.engine import tb
from anyseq_tpu.ref import oracle

# Width at which divide-and-conquer stops and a predecessor stripe is
# materialized (reference MIN_PART_WIDTH_HB = 128, align.impala:18; we use a
# wider stripe since the engines vectorize over 128-lane windows anyway).
MIN_WIDTH = 256

# Env ANYSEQ_TIMING=1: print per-phase construction timings (stderr)
# and append them to TIMING_LOG (consumed by bench/suite.py for the
# committed per-phase breakdown artifact).
TIMING_LOG: list[str] = []


def _tlog(msg):
    if os.environ.get("ANYSEQ_TIMING") == "1":
        import sys

        TIMING_LOG.append(msg)
        print(f"[hb] {msg}", file=sys.stderr, flush=True)


# Kernel gates for divide levels. Shallow levels (few, wide halves) run
# one kernel dispatch PER HALF -- that path chains band sweeps above
# band.M_MAX, so it must own the widest levels. Every other level runs
# as ONE batched kernel launch for the whole level
# (band.score_pairs_batched, grid over halves): measured on the
# tunneled v5e, a kernel DISPATCH costs ~35 ms, so per-half dispatch at
# P = 16 parts costs more than the level's entire compute -- one launch
# per level is the dispatch-minimal shape (the reference runs the same
# hot loop for all halves in one sweep, iteration_cpu.impala:59-119).
# P = 8 measured faster per-half than the batched launch at genome
# scale (951 vs 1025 ms at 1 Mbp: the 16 async dispatches pipeline, and
# the >= 32768 width gate keeps narrow levels on the batched launch).
KERNEL_MAX_PARTS = 8
KERNEL_MIN_MID = 2048


class _HbCheckpoint:
    """Durable level-granular state for the Hirschberg construction
    (VERDICT r1 item 7; the reference's Splits vector is morally this
    state, traceback_lintime.impala:9-42). Each completed level (and each
    completed terminal chunk) atomically rewrites one npz; a killed run
    resumes at the last completed unit, producing a byte-identical
    alignment."""

    def __init__(self, path, key: str):
        self.path = path
        self.key = key

    def load(self):
        import os

        if not self.path or not os.path.exists(self.path):
            return None
        ck = np.load(self.path, allow_pickle=False)
        if str(ck["key"]) != self.key:
            raise ValueError("checkpoint does not match this problem")
        return ck

    def save(self, **arrays):
        import os
        import tempfile

        if not self.path:
            return
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self.path)) or "."
        )
        os.close(fd)
        np.savez(tmp, key=self.key, **arrays)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   self.path)


def _ckpt_key(q8, s8, mode, scoring, min_width) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(q8.tobytes())
    h.update(s8.tobytes())
    h.update(repr((mode.value, scoring, min_width)).encode())
    return h.hexdigest()


def _score_outputs(q8, s8, mode, scoring, engine, emit_col=True,
                   mesh=None):
    """Run a score pass, returning numpy outputs dict. With ``mesh`` the
    pass runs subject-sharded over the mesh (dist/sharded.py)."""
    from anyseq_tpu.engine import api, xla_linmem

    m, n = len(q8), len(s8)
    if mesh is not None:
        import jax as _jax

        from anyseq_tpu.dist.sharded import score_pair_sharded

        outs = score_pair_sharded(q8, s8, mode, scoring, mesh,
                                  engine=engine)
        return _jax.device_get(outs)
    _, _, _, _, qp, sp = api._prep(q8, s8)
    use_pallas = False
    if engine in ("auto", "pallas"):
        from anyseq_tpu.kernels import band

        use_pallas = band.available() or engine == "pallas"
    if use_pallas:
        from anyseq_tpu.kernels import band

        outs = band.score_pair(qp, sp, m, n, mode, scoring, emit_col=emit_col)
    elif isinstance(scoring, AffineScoring):
        from anyseq_tpu.engine import xla_affine

        outs = xla_affine.score_rows_affine(qp, sp, m, n, mode, scoring)
    else:
        outs = xla_linmem.score_rows(qp, sp, m, n, mode, scoring)
    import jax as _jax

    return _jax.device_get(outs)  # one round trip for all outputs


def _write_all_gap_subject(s8, off_i, off_j, out_q, out_s):
    """Emit subject symbols against query gaps (empty query side).

    These ops belong to boundary cells (-1, j), whose sparse position is
    i + j + 1 = j (reference traceback.impala:61 with i = -1). Vectorized
    numpy slice writes: a degenerate h==0 part at Mbp scale must not burn
    interpreter time per symbol."""
    n = len(s8)
    if n == 0:
        return
    base = off_i + off_j
    out_q[base: base + n] = ord("_")
    out_s[base: base + n] = (
        s8 if isinstance(s8, np.ndarray) else np.frombuffer(s8, np.uint8)
    )


def _write_all_gap_query(q8, off_i, off_j, out_q, out_s):
    m = len(q8)
    if m == 0:
        return
    base = off_i + off_j
    out_q[base: base + m] = (
        q8 if isinstance(q8, np.ndarray) else np.frombuffer(q8, np.uint8)
    )
    out_s[base: base + m] = ord("_")


def _merge_halves(L, Rv, h, mid_w, right_w, g):
    """hb_sum: F(k) = L[k] + R[h-k-2], k in [-1, h-1]; edges use the
    all-gap init scores (reference hb_sum edge handling,
    traceback_lintime.impala:69-83). Returns (k, score); ties -> smallest
    k."""
    F = np.empty(h + 1, dtype=np.int64)
    F[0] = mid_w * g + Rv[h - 1]        # k = -1: left half all gaps
    F[1:h] = L[: h - 1] + Rv[: h - 1][::-1]
    F[h] = L[h - 1] + right_w * g       # k = h-1: right half all gaps
    k = int(np.argmax(F)) - 1
    return k, int(F[k + 1])


def _hb_global(q8, s8, off_i, off_j, out_q, out_s, scoring, engine,
               min_width=MIN_WIDTH, mesh=None, sp_min_width=None,
               ckpt=None):
    """Level-synchronous global Hirschberg; returns the global score.

    All forward-left and reversed-right halves of one level run as ONE
    batched device sweep (the reference's iteration_partitioned wavefront
    over all halves of all parts, iteration_cpu.impala:59-119), and all
    terminal predecessor stripes run as a handful of batched sweeps (the
    reference's iteration_blockwise, iteration_cpu.impala:121-157). Host
    work per level is the tiny argmax merge. This keeps the number of
    device round-trips at O(log n) instead of O(n / min_width).

    With ``mesh``, every phase is distributed (SURVEY.md:148-150,
    "Hirschberg across chips"): shallow wide halves run subject-sharded
    over the mesh (boundary columns via the pipelined stripe wavefront,
    dist/sharded.py), deep levels and terminal stripes run data-parallel
    over all devices (dist/batch.py), and the hb_sum argmax merge stays
    on host (O(m) per level). Results are bit-identical to the
    single-device path (same integer recurrences, same tie-breaks).
    ``sp_min_width``: minimum half width for the subject-sharded phase
    (default: 2048 columns per device).
    """
    from anyseq_tpu.engine import api, batch, xla_linmem

    m, n = len(q8), len(s8)
    g = scoring.gap
    if m == 0:
        _write_all_gap_subject(s8, off_i, off_j, out_q, out_s)
        return g * n
    if n == 0:
        _write_all_gap_query(q8, off_i, off_j, out_q, out_s)
        return g * m

    q32 = q8.astype(np.int32)
    s32 = s8.astype(np.int32)

    if n <= min_width or n < 2 or m <= 1:
        # Single terminal stripe: one pred pass, exact score.
        _, _, _, _, qp, sp = api._prep(q8, s8)
        outs = xla_linmem.score_rows_with_preds(
            qp, sp, m, n, Mode.GLOBAL, scoring
        )
        P = api._haloed_preds(np.asarray(outs["preds"]), m, n, Mode.GLOBAL)
        tb.walk_linear(q8, s8, P, (m - 1, n - 1), out_q, out_s,
                       off_i, off_j)
        return int(np.asarray(outs["last_col"])[m - 1])

    root_score = None
    active = [(0, m, 0, n)]            # (qlo, qhi, slo, shi)
    terminals = []
    term_done = 0
    _RS_NONE = -(2**62)

    if ckpt is not None:
        ck = ckpt.load()
        if ck is not None:
            active = [tuple(map(int, r)) for r in ck["active"].reshape(-1, 4)]
            terminals = [tuple(map(int, r))
                         for r in ck["terminals"].reshape(-1, 4)]
            out_q[:] = ck["out_q"]
            out_s[:] = ck["out_s"]
            rs = int(ck["root_score"])
            root_score = None if rs == _RS_NONE else rs
            term_done = int(ck["term_done"])

    def _save_level():
        if ckpt is not None:
            ckpt.save(
                active=np.asarray(active, np.int64).reshape(-1, 4),
                terminals=np.asarray(terminals, np.int64).reshape(-1, 4),
                out_q=out_q, out_s=out_s,
                root_score=np.int64(
                    _RS_NONE if root_score is None else root_score
                ),
                term_done=np.int64(term_done),
            )

    def classify(part):
        qlo, qhi, slo, shi = part
        h, w = qhi - qlo, shi - slo
        if h == 0:
            _write_all_gap_subject(s8[slo:shi], off_i + qlo, off_j + slo,
                                   out_q, out_s)
        elif w <= min_width or w < 2 or h <= 1:
            terminals.append(part)
        else:
            active.append(part)

    from anyseq_tpu.kernels import band

    use_kernel = engine in ("auto", "pallas") and band.available()
    # Device-resident sequences for the on-device level step (uploaded
    # once; every divide level then ships only its (P, 4) parts array
    # and fetches only the (P,) split rows + scores).
    qdev = jnp.asarray(q32) if (use_kernel and mesh is None) else None
    sdev = jnp.asarray(s32) if (use_kernel and mesh is None) else None
    from anyseq_tpu.dist import batch as dist_batch  # fetch() on all paths

    if mesh is not None:
        import math

        from anyseq_tpu.dist.sharded import score_pair_sharded

        n_dev = math.prod(mesh.shape.values())
        if sp_min_width is None:
            sp_min_width = 2048 * n_dev

    while active:
        _lt0 = time.perf_counter()
        parts = active
        active = []
        P = len(parts)
        hs = [p[1] - p[0] for p in parts]
        mids = [(p[3] - p[2]) // 2 for p in parts]

        if (use_kernel and mesh is None and P == 1
                and parts[0] == (0, m, 0, n)
                and (n + 1) // 2 <= band.M_MAX
                # beyond M_MAX the fused level-2 sweeps pad their
                # (traced) widths to the full m bucket -- measured
                # SLOWER at 1 Mbp than per-half levels, which win there
                and m <= band.M_MAX
                and not isinstance(scoring, AffineScoring)):
            # Root levels P=1 and P=2 in ONE dispatch: the halves run
            # the full single-pair wide-window geometry (persistent
            # R=32/64) with on-device hb_sum merges and on-device
            # level-2 part construction (subject cuts are static).
            top = band.score_top_levels_fused(qdev, sdev, m, n, scoring)
            if top is not None:
                k0, score0, k2a, k2b = (int(x) for x in top)
                if root_score is None:
                    root_score = score0
                mid0 = n // 2
                kids = [(0, k0 + 1, 0, mid0), (k0 + 1, m, mid0, n)]
                for j, kid in enumerate(kids):
                    qlo, qhi, slo, shi = kid
                    h, wk = qhi - qlo, shi - slo
                    if h == 0 or wk <= min_width or wk < 2 or h <= 1:
                        classify(kid)
                    else:
                        k = (k2a, k2b)[j]
                        mid2 = wk // 2
                        classify((qlo, qlo + k + 1, slo, slo + mid2))
                        classify((qlo + k + 1, qhi, slo + mid2, shi))
                _tlog(f"level P=1+2 maxh={m} maxmid={n // 2} "
                      f"path=top-fused "
                      f"{(time.perf_counter()-_lt0)*1e3:.0f}ms")
                _save_level()
                continue

        if mesh is not None and P <= 4 and min(mids) >= sp_min_width:
            # Wide halves: subject-sharded pipelined wavefront per half
            # over the whole mesh; the half's boundary column is the
            # sweep's last-column output. Dispatches are async; fetch
            # everything in ONE device round trip (the tunnel round trip
            # otherwise dominates the level).
            cols_dev = []
            for p, (qlo, qhi, slo, shi) in enumerate(parts):
                h, mid = hs[p], mids[p]
                for qa, sa in (
                    (q8[qlo:qhi], s8[slo:slo + mid]),
                    (q8[qlo:qhi][::-1], s8[slo + mid:shi][::-1]),
                ):
                    outs = score_pair_sharded(
                        np.ascontiguousarray(qa),
                        np.ascontiguousarray(sa),
                        Mode.GLOBAL, scoring, mesh, engine=engine,
                    )
                    cols_dev.append(outs["last_col"])
            import jax as _jax

            cols_list = [c[:hs[i // 2]]
                         for i, c in enumerate(_jax.device_get(cols_dev))]
            for p, (qlo, qhi, slo, shi) in enumerate(parts):
                h, mid = hs[p], mids[p]
                L = cols_list[2 * p].astype(np.int64)
                Rv = cols_list[2 * p + 1].astype(np.int64)
                k, score = _merge_halves(
                    L, Rv, h, mid, shi - slo - mid, g
                )
                if root_score is None:
                    root_score = score
                classify((qlo, qlo + k + 1, slo, slo + mid))
                classify((qlo + k + 1, qhi, slo + mid, shi))
            _tlog(f"level P={P} maxh={max(hs)} maxmid={max(mids)} "
                  f"path=mesh-sp {(time.perf_counter()-_lt0)*1e3:.0f}ms")
            _save_level()
            continue

        per_half_ok = (
            mesh is None and use_kernel
            and P <= KERNEL_MAX_PARTS
            and min(mids) >= KERNEL_MIN_MID
            and (max(hs) > band.M_MAX
                 # wide sub-M_MAX levels: closed-form persistent
                 # transposed per-half sweeps beat the slotted level
                 # kernel's EPP clock (~174 vs ~150 Gcells/s measured
                 # at 1 Mbp), and the per-half dispatch overhead is
                 # negligible at these sizes
                 or (min(mids) >= 32768
                     and not isinstance(scoring, AffineScoring)))
        )
        if per_half_ok:
            # Genome-scale shallow levels: per-half dispatch. The merge
            # needs each half's boundary COLUMN H[i][w-1] -- which is
            # the bottom ROW of the TRANSPOSED half (GLOBAL linear DP
            # is transpose-symmetric), and row collection is an
            # in-place masked select while column collection pays the
            # rotating ecol machinery (~111 vs ~180 Gcells/s measured).
            # So swap (q, s) whenever the half's width fits the column
            # scratch as the transposed HEIGHT; band.score_pair then
            # also runs CLOSED-FORM persistent (no band chaining) when
            # mid <= M_MAX. Falls back to the direct orientation
            # (chained bands, last_col) otherwise. All slices come off
            # the device-resident sequences (no per-level upload).
            cols_dev = []
            for p, (qlo, qhi, slo, shi) in enumerate(parts):
                h, mid = hs[p], mids[p]
                for qa, sa in (
                    (qdev[qlo:qhi], sdev[slo:slo + mid]),
                    (jnp.flip(qdev[qlo:qhi]),
                     jnp.flip(sdev[slo + mid:shi])),
                ):
                    transpose = (int(sa.shape[0]) <= band.M_MAX
                                 and not isinstance(scoring,
                                                    AffineScoring))
                    if transpose:
                        outs = band.score_pair(
                            sa, qa, int(sa.shape[0]), int(qa.shape[0]),
                            Mode.GLOBAL, scoring, emit_col=False,
                        )
                        cols_dev.append(outs["last_row"])
                    else:
                        outs = band.score_pair(
                            qa, sa, int(qa.shape[0]), int(sa.shape[0]),
                            Mode.GLOBAL, scoring,
                        )
                        cols_dev.append(outs["last_col"])
            # one fetch for the whole level (async dispatches pipeline;
            # per-array np.asarray would pay a tunnel round trip each)
            import jax as _jax

            cols_list = [c[:hs[i // 2]]
                         for i, c in enumerate(_jax.device_get(cols_dev))]
            for p, (qlo, qhi, slo, shi) in enumerate(parts):
                h, mid = hs[p], mids[p]
                L = cols_list[2 * p].astype(np.int64)
                Rv = cols_list[2 * p + 1].astype(np.int64)
                k, score = _merge_halves(
                    L, Rv, h, mid, shi - slo - mid, g
                )
                if root_score is None:
                    root_score = score
                classify((qlo, qlo + k + 1, slo, slo + mid))
                classify((qlo + k + 1, qhi, slo + mid, shi))
            _tlog(f"level P={P} maxh={max(hs)} maxmid={max(mids)} "
                  f"path=per-half {(time.perf_counter()-_lt0)*1e3:.0f}ms")
            _save_level()
            continue

        if use_kernel and mesh is None and max(hs) <= band.M_MAX:
            # Fully on-device level: gather the half-problems from the
            # resident sequences, run the slotted kernel, merge hb_sum
            # on device -- only the (P,) split rows and scores come
            # back (the per-level problem-array upload + column fetch
            # otherwise dominates deep levels on a tunneled TPU).
            # Deep levels fuse TWO levels per dispatch (children are
            # built on device from the split rows), halving the ~65 ms
            # round-trip floor that dominates them.
            fused = None
            if P >= 4:
                fused = band.score_levels_fused(
                    qdev, sdev, np.asarray(parts, np.int64), scoring,
                    depth=2,
                )
            if fused is not None:
                (ks0, sc0), (ks1, _) = fused
                kids = []
                for p, (qlo, qhi, slo, shi) in enumerate(parts):
                    mid = mids[p]
                    if root_score is None:
                        root_score = int(sc0[p])
                    k = int(ks0[p])
                    kids.append((qlo, qlo + k + 1, slo, slo + mid))
                    kids.append((qlo + k + 1, qhi, slo + mid, shi))
                for j, kid in enumerate(kids):
                    qlo, qhi, slo, shi = kid
                    h, wk = qhi - qlo, shi - slo
                    if h == 0 or wk <= min_width or wk < 2 or h <= 1:
                        classify(kid)
                    else:
                        k = int(ks1[j])
                        mid2 = wk // 2
                        classify((qlo, qlo + k + 1, slo, slo + mid2))
                        classify((qlo + k + 1, qhi, slo + mid2, shi))
                _tlog(f"level P={P}+{2*P} maxh={max(hs)} "
                      f"maxmid={max(mids)} path=device-level-fused "
                      f"{(time.perf_counter()-_lt0)*1e3:.0f}ms")
                _save_level()
                continue
            lvl = band.score_level_parts(
                qdev, sdev, np.asarray(parts, np.int64), scoring
            )
            if lvl is not None:
                ks_arr, sc_arr = lvl
                for p, (qlo, qhi, slo, shi) in enumerate(parts):
                    mid = mids[p]
                    if root_score is None:
                        root_score = int(sc_arr[p])
                    k = int(ks_arr[p])
                    classify((qlo, qlo + k + 1, slo, slo + mid))
                    classify((qlo + k + 1, qhi, slo + mid, shi))
                _tlog(f"level P={P} maxh={max(hs)} maxmid={max(mids)} "
                      f"path=device-level "
                      f"{(time.perf_counter()-_lt0)*1e3:.0f}ms")
                _save_level()
                continue
        Mb = batch._bucket(max(hs))
        Nb = batch._bucket(max(max(mids), max(
            (p[3] - p[2]) - mi for p, mi in zip(parts, mids)
        )), 128)
        B = 2 * P
        qarr = np.full((B, Mb), batch._PAD_Q, np.int32)
        sarr = np.full((B, Nb), batch._PAD_S, np.int32)
        ms = np.empty(B, np.int32)
        ns = np.empty(B, np.int32)
        for p, (qlo, qhi, slo, shi) in enumerate(parts):
            h, mid = hs[p], mids[p]
            qarr[2 * p, :h] = q32[qlo:qhi]
            qarr[2 * p + 1, :h] = q32[qlo:qhi][::-1]
            sarr[2 * p, :mid] = s32[slo:slo + mid]
            sarr[2 * p + 1, : shi - slo - mid] = s32[slo + mid:shi][::-1]
            ms[2 * p] = ms[2 * p + 1] = h
            ns[2 * p] = mid
            ns[2 * p + 1] = shi - slo - mid
        if mesh is not None:
            cols = dist_batch.fetch(dist_batch.last_cols_batch_sharded(
                jnp.asarray(qarr), jnp.asarray(sarr),
                jnp.asarray(ms), jnp.asarray(ns), scoring, mesh,
            )).T                                   # -> (B, M)
        elif use_kernel and max(hs) <= band.M_MAX:
            # ONE kernel launch for the whole level (grid over halves).
            cols = np.asarray(band.score_pairs_batched(
                qarr, sarr, ms, ns, Mode.GLOBAL, scoring,
            )["last_cols"])
        else:
            cols = np.asarray(batch.last_cols_batch(
                jnp.asarray(qarr), jnp.asarray(sarr),
                jnp.asarray(ms), jnp.asarray(ns), scoring,
            )).T                                   # -> (B, M)
        for p, (qlo, qhi, slo, shi) in enumerate(parts):
            h, mid = hs[p], mids[p]
            L = cols[2 * p, :h].astype(np.int64)
            Rv = cols[2 * p + 1, :h].astype(np.int64)
            k, score = _merge_halves(L, Rv, h, mid, shi - slo - mid, g)
            if root_score is None:
                root_score = score
            classify((qlo, qlo + k + 1, slo, slo + mid))
            classify((qlo + k + 1, qhi, slo + mid, shi))
        _tlog(f"level P={P} maxh={max(hs)} maxmid={max(mids)} "
              f"path=batched {(time.perf_counter()-_lt0)*1e3:.0f}ms")
        _save_level()

    _tt0 = time.perf_counter()
    # Terminal stripes, batched by shape bucket (chunk index `ci` is the
    # checkpoint resume unit).
    groups: dict[tuple[int, int], list] = {}
    for t in terminals:
        h, w = t[1] - t[0], t[3] - t[2]
        groups.setdefault(
            (batch._bucket(h), batch._bucket(w, 128)), []
        ).append(t)
    ci = -1
    for (Hb, Wb), ts in groups.items():
        for lo in range(0, len(ts), 512):
            ci += 1
            if ci < term_done:
                continue
            chunk = ts[lo: lo + 512]
            B = len(chunk)
            qarr = np.full((B, Hb), batch._PAD_Q, np.int32)
            sarr = np.full((B, Wb), batch._PAD_S, np.int32)
            ms = np.empty(B, np.int32)
            ns = np.empty(B, np.int32)
            for b, (qlo, qhi, slo, shi) in enumerate(chunk):
                h, w = qhi - qlo, shi - slo
                qarr[b, :h] = q32[qlo:qhi]
                sarr[b, :w] = s32[slo:shi]
                ms[b] = h
                ns[b] = w
            if mesh is not None:
                preds, _ = dist_batch.preds_batch_sharded(
                    jnp.asarray(qarr), jnp.asarray(sarr),
                    jnp.asarray(ms), jnp.asarray(ns), scoring, mesh,
                )
                preds = dist_batch.fetch(preds)
                for b, (qlo, qhi, slo, shi) in enumerate(chunk):
                    h, w = qhi - qlo, shi - slo
                    Pm = api._haloed_preds(
                        preds[b, :h, :w], h, w, Mode.GLOBAL
                    )
                    tb.walk_linear(
                        q8[qlo:qhi], s8[slo:shi], Pm, (h - 1, w - 1),
                        out_q, out_s, off_i + qlo, off_j + slo,
                    )
            else:
                # On-device batched walk: only the O(B*(H+W)) aligned
                # strings leave the device (the dense O(B*H*W) pred
                # fetch dominated the terminal phase on tunneled TPUs).
                # Pred sweep + walk fused in ONE dispatch, ONE fetch.
                oq, osub = jax.device_get(batch.preds_walk_batch(
                    jnp.asarray(qarr), jnp.asarray(sarr),
                    jnp.asarray(ms), jnp.asarray(ns), scoring,
                ))
                from anyseq_tpu.core.types import EMPTY_SYM
                for b, (qlo, qhi, slo, shi) in enumerate(chunk):
                    h, w = qhi - qlo, shi - slo
                    base = off_i + qlo + off_j + slo
                    # Replicate the host walk's write pattern exactly:
                    # only the walked path positions (EMPTY positions
                    # are skipped-by-diagonal slots that may belong to
                    # other writers in the shared sparse buffer). The
                    # walk's halo tail (cells at i = -1 or j = -1)
                    # reaches local position 0, so the copy starts at
                    # local 0 = global `base`.
                    ln = min(h + w, len(out_q) - base)
                    seg_q = oq[b, :ln]
                    seg_s = osub[b, :ln]
                    sel = (seg_q != EMPTY_SYM) | (seg_s != EMPTY_SYM)
                    out_q[base: base + ln][sel] = seg_q[sel]
                    out_s[base: base + ln][sel] = seg_s[sel]
            term_done = ci + 1
            _save_level()
    _tlog(f"terminals n={len(terminals)} "
          f"{(time.perf_counter()-_tt0)*1e3:.0f}ms")
    return root_score


def _merge_halves_affine(HL, EL, HR, ER, h, mid_w, right_w, sc,
                         sgap, egap):
    """Myers-Miller merge at a subject cut: over k in [-1, h-1],
    type1 (cut crossed in H state)  = HL[k] + HR[h-2-k]
    type2 (one horizontal gap run spans the cut) = EL[k] + ER[h-2-k] - go
    with closed-form k = -1 / r = -1 boundary entries (an all-gap
    boundary-row run, whose gap_open is dropped when the part's own
    start/end flag says the run is paid by the caller).

    Returns (k, crosses_in_gap, score); ties -> smallest k, type1 first.
    """
    go, ge = sc.gap_open, sc.gap_extend
    HLv = np.empty(h + 1, np.int64)
    ELv = np.empty(h + 1, np.int64)
    HLv[0] = ELv[0] = mid_w * ge + (0 if sgap else go)
    HLv[1:] = HL[:h]
    ELv[1:] = EL[:h]
    HRv = np.empty(h + 1, np.int64)
    ERv = np.empty(h + 1, np.int64)
    HRv[:h] = HR[:h][::-1]
    ERv[:h] = ER[:h][::-1]
    HRv[h] = ERv[h] = right_w * ge + (0 if egap else go)
    t1 = HLv + HRv
    t2 = ELv + ERv - go
    b1, b2 = int(np.max(t1)), int(np.max(t2))
    if b1 >= b2:
        return int(np.argmax(t1)) - 1, False, b1
    return int(np.argmax(t2)) - 1, True, b2


def _haloed_affine_preds_mm(packed, h, w, sgap):
    """Haloed PH/PE/PF planes for a Myers-Miller terminal stripe (always
    GLOBAL scheme; ``sgap`` selects the continuing-run boundary-row
    convention: the boundary E run never 'opens' inside the stripe)."""
    from anyseq_tpu.core.types import PRED_GAP_Q, PRED_GAP_S

    PH = np.zeros((h + 1, w + 1), dtype=np.uint8)
    PE = np.zeros((h + 1, w + 1), dtype=np.uint8)
    PF = np.zeros((h + 1, w + 1), dtype=np.uint8)
    PH[1:, 1:] = packed & 3
    PE[1:, 1:] = (packed >> 2) & 1
    PF[1:, 1:] = (packed >> 3) & 1
    PH[0, 1:] = PRED_GAP_Q
    PH[1:, 0] = PRED_GAP_S
    if sgap:
        PE[0, 1:] = 1     # run continues past the stripe boundary
    else:
        PE[0, 2:] = 1     # run opens at column 0 (from the corner)
    PF[2:, 0] = 1
    return PH, PE, PF


def _hb_global_affine(q8, s8, off_i, off_j, out_q, out_s, sc, engine,
                      min_width=MIN_WIDTH, sgap=False, egap=False,
                      ckpt=None, mesh=None, sp_min_width=None):
    """Linear-memory affine (Gotoh) alignment construction: the
    Myers-Miller divide-and-conquer. Level-synchronous like
    :func:`_hb_global`; parts carry (start-in-gap, end-in-gap) flags so
    horizontal gap runs crossing a cut are charged exactly one gap_open
    (engine passes: batch.last_cols_batch_affine / preds_batch_affine).

    With ``mesh``, wide levels run subject-sharded over the device mesh
    (full Gotoh state in the superstep messages, incl. the start_gap
    continuing-run init per crossing flag) and deep levels / terminal
    stripes run data-parallel -- bit-identical to the single-device
    result.

    Beyond-reference capability (the reference's affine scoring is dead
    code, align.impala:153-166 / SURVEY.md Q3); returns the true global
    affine score."""
    from anyseq_tpu.engine import api, batch
    from anyseq_tpu.engine import xla_affine

    m, n = len(q8), len(s8)
    go, ge = sc.gap_open, sc.gap_extend
    if m == 0:
        _write_all_gap_subject(s8, off_i, off_j, out_q, out_s)
        return (0 if sgap else go) + ge * n if n else 0
    if n == 0:
        _write_all_gap_query(q8, off_i, off_j, out_q, out_s)
        return go + ge * m

    q32 = q8.astype(np.int32)
    s32 = s8.astype(np.int32)

    root_score = None
    active = []
    terminals = []
    term_done = 0
    _RS_NONE = -(2**62)

    def classify(part):
        qlo, qhi, slo, shi, sg, eg = part
        h, w = qhi - qlo, shi - slo
        if h == 0:
            _write_all_gap_subject(s8[slo:shi], off_i + qlo, off_j + slo,
                                   out_q, out_s)
        elif w <= min_width or w < 2 or h <= 1:
            terminals.append(part)
        else:
            active.append(part)

    classify((0, m, 0, n, sgap, egap))

    if ckpt is not None:
        ck = ckpt.load()
        if ck is not None:
            active = [tuple(map(int, r))
                      for r in ck["active"].reshape(-1, 6)]
            terminals = [tuple(map(int, r))
                         for r in ck["terminals"].reshape(-1, 6)]
            out_q[:] = ck["out_q"]
            out_s[:] = ck["out_s"]
            rs = int(ck["root_score"])
            root_score = None if rs == _RS_NONE else rs
            term_done = int(ck["term_done"])

    def _save_level():
        if ckpt is not None:
            ckpt.save(
                active=np.asarray(active, np.int64).reshape(-1, 6),
                terminals=np.asarray(terminals, np.int64).reshape(-1, 6),
                out_q=out_q, out_s=out_s,
                root_score=np.int64(
                    _RS_NONE if root_score is None else root_score
                ),
                term_done=np.int64(term_done),
            )

    from anyseq_tpu.kernels import band

    use_kernel = engine in ("auto", "pallas") and band.available()
    from anyseq_tpu.dist import batch as dist_batch  # fetch() on all paths

    # Device-resident sequences for the fused kernel levels (uploaded
    # once; levels then ship only the (P, 6) parts array and fetch only
    # the per-level split rows + crossing flags + scores).
    qdev = jnp.asarray(q32) if (use_kernel and mesh is None) else None
    sdev = jnp.asarray(s32) if (use_kernel and mesh is None) else None

    if mesh is not None:
        import math

        from anyseq_tpu.dist.sharded import score_pair_sharded

        n_dev = math.prod(mesh.shape.values())
        if sp_min_width is None:
            sp_min_width = 2048 * n_dev

    while active:
        _lt0 = time.perf_counter()
        parts = active
        active = []
        P = len(parts)
        hs = [p[1] - p[0] for p in parts]
        mids = [(p[3] - p[2]) // 2 for p in parts]

        if mesh is not None and P <= 4 and min(mids) >= sp_min_width:
            # Wide halves: subject-sharded Gotoh wavefront per half over
            # the whole mesh (H and E last columns; start_gap per
            # crossing flag); one fetch per level.
            cols_dev = []
            for p, (qlo, qhi, slo, shi, sg, eg) in enumerate(parts):
                h, mid = hs[p], mids[p]
                for (qa, sa, fl) in (
                    (q8[qlo:qhi], s8[slo:slo + mid], sg),
                    (q8[qlo:qhi][::-1], s8[slo + mid:shi][::-1], eg),
                ):
                    outs = score_pair_sharded(
                        np.ascontiguousarray(qa),
                        np.ascontiguousarray(sa),
                        Mode.GLOBAL, sc, mesh, engine=engine,
                        start_gap=bool(fl),
                    )
                    cols_dev.append((outs["last_col"],
                                     outs["last_col_e"]))
            import jax as _jax

            cols_host = _jax.device_get(cols_dev)
            for p, (qlo, qhi, slo, shi, sg, eg) in enumerate(parts):
                h, mid = hs[p], mids[p]
                HL, EL = cols_host[2 * p]
                HR, ER = cols_host[2 * p + 1]
                k, in_gap, score = _merge_halves_affine(
                    HL[:h].astype(np.int64), EL[:h].astype(np.int64),
                    HR[:h].astype(np.int64), ER[:h].astype(np.int64),
                    h, mid, shi - slo - mid, sc, sg, eg,
                )
                if root_score is None:
                    root_score = score
                classify((qlo, qlo + k + 1, slo, slo + mid, sg, in_gap))
                classify((qlo + k + 1, qhi, slo + mid, shi, in_gap, eg))
            _tlog(f"aff level P={P} maxh={max(hs)} maxmid={max(mids)} "
                  f"path=mesh-sp {(time.perf_counter()-_lt0)*1e3:.0f}ms")
            _save_level()
            continue

        if (mesh is None and use_kernel and max(hs) > band.M_MAX
                and P <= KERNEL_MAX_PARTS
                and min(mids) >= KERNEL_MIN_MID):
            # Genome-scale shallow levels through per-half kernel
            # dispatch (H and E last columns; start_gap per
            # crossing-state flag; score_pair_chained above M_MAX).
            # Levels that fit M_MAX run as ONE batched launch below.
            outs_dev = []
            for p, (qlo, qhi, slo, shi, sg, eg) in enumerate(parts):
                h, mid = hs[p], mids[p]
                for (qa, sa, fl) in (
                    (q32[qlo:qhi], s32[slo:slo + mid], sg),
                    (q32[qlo:qhi][::-1], s32[slo + mid:shi][::-1], eg),
                ):
                    outs = band.score_pair(
                        jnp.asarray(np.ascontiguousarray(qa)),
                        jnp.asarray(np.ascontiguousarray(sa)),
                        len(qa), len(sa), Mode.GLOBAL, sc,
                        start_gap=bool(fl),
                    )
                    outs_dev.append((outs["last_col"],
                                     outs["last_col_e"]))
            import jax as _jax

            cols_host = _jax.device_get(outs_dev)
            for p, (qlo, qhi, slo, shi, sg, eg) in enumerate(parts):
                h, mid = hs[p], mids[p]
                HL, EL = cols_host[2 * p]
                HR, ER = cols_host[2 * p + 1]
                k, in_gap, score = _merge_halves_affine(
                    HL[:h].astype(np.int64), EL[:h].astype(np.int64),
                    HR[:h].astype(np.int64), ER[:h].astype(np.int64),
                    h, mid, shi - slo - mid, sc, sg, eg,
                )
                if root_score is None:
                    root_score = score
                classify((qlo, qlo + k + 1, slo, slo + mid, sg, in_gap))
                classify((qlo + k + 1, qhi, slo + mid, shi, in_gap, eg))
            _tlog(f"aff level P={P} maxh={max(hs)} maxmid={max(mids)} "
                  f"path=per-half {(time.perf_counter()-_lt0)*1e3:.0f}ms")
            _save_level()
            continue

        if mesh is None and use_kernel and max(hs) <= band.M_MAX:
            # Fully on-device fused levels: gather halves from the
            # resident sequences, sweep + merge + build children on
            # device for EVERY remaining divide level in one dispatch
            # (half widths halve deterministically, so the remaining
            # depth is known up front); only the per-level (2^d * P,)
            # split rows / crossing flags / scores come back. Children
            # the host classifies as terminal are swept as harmless
            # garbage rows and their deeper entries ignored.
            wmax = max(p[3] - p[2] for p in parts)
            D = 0
            wcur = wmax
            while wcur > min_width and wcur >= 2 and D < 6:
                D += 1
                wcur = (wcur + 1) // 2
            fused = band.score_levels_fused_affine(
                qdev, sdev, np.asarray(parts, np.int64), sc,
                depth=max(D, 1),
            )
            if fused is not None:
                lvl_parts = list(parts)
                Dr = len(fused)
                for d, (ks_d, gp_d, sc_d) in enumerate(fused):
                    nxt = []
                    for idx, part in enumerate(lvl_parts):
                        if part is None:
                            nxt += [None, None]
                            continue
                        qlo, qhi, slo, shi, sgf, egf = part
                        if root_score is None:
                            root_score = int(sc_d[idx])
                        k = int(ks_d[idx])
                        cross = bool(gp_d[idx])
                        mid = (shi - slo) // 2
                        kids = (
                            (qlo, qlo + k + 1, slo, slo + mid, sgf,
                             cross),
                            (qlo + k + 1, qhi, slo + mid, shi, cross,
                             egf),
                        )
                        for c in kids:
                            hC, wC = c[1] - c[0], c[3] - c[2]
                            if (d + 1 < Dr and hC > 1
                                    and wC > min_width and wC >= 2):
                                nxt.append(c)
                            else:
                                classify(c)
                                nxt.append(None)
                    lvl_parts = nxt
                _tlog(f"aff level P={P} x{Dr} maxh={max(hs)} "
                      f"maxmid={max(mids)} path=device-fused "
                      f"{(time.perf_counter()-_lt0)*1e3:.0f}ms")
                _save_level()
                continue

        Mb = batch._bucket(max(hs))
        Nb = batch._bucket(max(max(mids), max(
            (p[3] - p[2]) - mi for p, mi in zip(parts, mids)
        )), 128)
        B = 2 * P
        qarr = np.full((B, Mb), batch._PAD_Q, np.int32)
        sarr = np.full((B, Nb), batch._PAD_S, np.int32)
        ms = np.empty(B, np.int32)
        ns = np.empty(B, np.int32)
        sgaps = np.zeros(B, bool)
        for p, (qlo, qhi, slo, shi, sg, eg) in enumerate(parts):
            h, mid = hs[p], mids[p]
            qarr[2 * p, :h] = q32[qlo:qhi]
            qarr[2 * p + 1, :h] = q32[qlo:qhi][::-1]
            sarr[2 * p, :mid] = s32[slo:slo + mid]
            sarr[2 * p + 1, : shi - slo - mid] = s32[slo + mid:shi][::-1]
            ms[2 * p] = ms[2 * p + 1] = h
            ns[2 * p] = mid
            ns[2 * p + 1] = shi - slo - mid
            sgaps[2 * p] = sg       # forward half inherits start flag
            sgaps[2 * p + 1] = eg   # reversed half: end flag -> start
        if mesh is not None:
            cols_h, cols_e = dist_batch.last_cols_batch_affine_sharded(
                jnp.asarray(qarr), jnp.asarray(sarr),
                jnp.asarray(ms), jnp.asarray(ns), sc,
                jnp.asarray(sgaps), mesh,
            )
            cols_h = dist_batch.fetch(cols_h).T    # -> (B, M)
            cols_e = dist_batch.fetch(cols_e).T
        elif use_kernel and max(hs) <= band.M_MAX:
            # ONE kernel launch for the whole level (grid over halves;
            # per-problem start_gap flags ride the dims rows).
            outs = band.score_pairs_batched(
                qarr, sarr, ms, ns, Mode.GLOBAL, sc, sgaps=sgaps,
            )
            cols_h = np.asarray(outs["last_cols"])
            cols_e = np.asarray(outs["last_cols_e"])
        else:
            cols_h, cols_e = batch.last_cols_batch_affine(
                jnp.asarray(qarr), jnp.asarray(sarr),
                jnp.asarray(ms), jnp.asarray(ns), sc, jnp.asarray(sgaps),
            )
            cols_h = np.asarray(cols_h).T          # -> (B, M)
            cols_e = np.asarray(cols_e).T
        for p, (qlo, qhi, slo, shi, sg, eg) in enumerate(parts):
            h, mid = hs[p], mids[p]
            k, in_gap, score = _merge_halves_affine(
                cols_h[2 * p, :h].astype(np.int64),
                cols_e[2 * p, :h].astype(np.int64),
                cols_h[2 * p + 1, :h].astype(np.int64),
                cols_e[2 * p + 1, :h].astype(np.int64),
                h, mid, shi - slo - mid, sc, sg, eg,
            )
            if root_score is None:
                root_score = score
            classify((qlo, qlo + k + 1, slo, slo + mid, sg, in_gap))
            classify((qlo + k + 1, qhi, slo + mid, shi, in_gap, eg))
        _tlog(f"aff level P={P} maxh={max(hs)} maxmid={max(mids)} "
              f"path={'mesh-batch' if mesh is not None else 'batched-kernel' if (use_kernel and max(hs) <= band.M_MAX) else 'xla-batch'} "
              f"{(time.perf_counter()-_lt0)*1e3:.0f}ms")
        _save_level()

    # Terminal stripes, batched by shape bucket (chunk index `ci` is the
    # checkpoint resume unit).
    _tt0 = time.perf_counter()
    from anyseq_tpu.core.types import PRED_GAP_Q
    from anyseq_tpu.engine import tb

    groups: dict[tuple[int, int], list] = {}
    for t in terminals:
        h, w = t[1] - t[0], t[3] - t[2]
        groups.setdefault(
            (batch._bucket(h), batch._bucket(w, 128)), []
        ).append(t)
    ci = -1
    for (Hb, Wb), ts in groups.items():
        for lo in range(0, len(ts), 512):
            ci += 1
            if ci < term_done:
                continue
            chunk = ts[lo: lo + 512]
            B = len(chunk)
            qarr = np.full((B, Hb), batch._PAD_Q, np.int32)
            sarr = np.full((B, Wb), batch._PAD_S, np.int32)
            ms = np.empty(B, np.int32)
            ns = np.empty(B, np.int32)
            sgaps = np.zeros(B, bool)
            egaps = np.zeros(B, bool)
            for b, (qlo, qhi, slo, shi, sg, eg) in enumerate(chunk):
                h, w = qhi - qlo, shi - slo
                qarr[b, :h] = q32[qlo:qhi]
                sarr[b, :w] = s32[slo:shi]
                ms[b] = h
                ns[b] = w
                sgaps[b] = sg
                egaps[b] = eg
            if mesh is not None:
                preds, cols_h, cols_e = dist_batch.preds_batch_affine_sharded(
                    jnp.asarray(qarr), jnp.asarray(sarr),
                    jnp.asarray(ms), jnp.asarray(ns), sc,
                    jnp.asarray(sgaps), mesh,
                )
                preds = dist_batch.fetch(preds)
                cols_h = dist_batch.fetch(cols_h)
                cols_e = dist_batch.fetch(cols_e)
                for b, (qlo, qhi, slo, shi, sg, eg) in enumerate(chunk):
                    h, w = qhi - qlo, shi - slo
                    if (root_score is None
                            and (qhi - qlo, shi - slo) == (m, n)):
                        # The whole problem was one terminal stripe.
                        root_score = int(
                            (cols_e if eg else cols_h)[h - 1, b]
                        )
                    PH, PE, PF = _haloed_affine_preds_mm(
                        preds[b, :h, :w], h, w, sg
                    )
                    if eg:
                        # Start the walk in E state: the path must leave
                        # the stripe's last cell inside a horizontal run.
                        PH[h, w] = PRED_GAP_Q
                    tb.walk_affine(
                        q8[qlo:qhi], s8[slo:shi], PH, PE, PF,
                        (h - 1, w - 1),
                        out_q, out_s, off_i + qlo, off_j + slo,
                    )
            else:
                # Fused pred sweep + on-device 3-state walk: ONE
                # dispatch, ONE fetch of the O(B*(H+W)) aligned strings
                # (the dense packed-pred fetch + per-stripe host walks
                # dominated the affine terminal phase on tunneled TPUs).
                oq, osub, tscores = jax.device_get(
                    batch.preds_walk_batch_affine(
                        jnp.asarray(qarr), jnp.asarray(sarr),
                        jnp.asarray(ms), jnp.asarray(ns), sc,
                        jnp.asarray(sgaps), jnp.asarray(egaps),
                    )
                )
                from anyseq_tpu.core.types import EMPTY_SYM
                for b, (qlo, qhi, slo, shi, sg, eg) in enumerate(chunk):
                    h, w = qhi - qlo, shi - slo
                    if (root_score is None
                            and (qhi - qlo, shi - slo) == (m, n)):
                        root_score = int(tscores[b])
                    base = off_i + qlo + off_j + slo
                    # Copy only walked path positions (EMPTY slots may
                    # belong to other writers of the shared sparse
                    # buffer), exactly as the linear terminal phase.
                    ln = min(h + w, len(out_q) - base)
                    seg_q = oq[b, :ln]
                    seg_s = osub[b, :ln]
                    sel = (seg_q != EMPTY_SYM) | (seg_s != EMPTY_SYM)
                    out_q[base: base + ln][sel] = seg_q[sel]
                    out_s[base: base + ln][sel] = seg_s[sel]
            term_done = ci + 1
            _save_level()
    _tlog(f"aff terminals n={len(terminals)} "
          f"{(time.perf_counter()-_tt0)*1e3:.0f}ms")
    return root_score


def _find_end(q8, s8, mode, scoring, engine, mesh=None):
    """Forward score pass: (score, end position)."""
    from anyseq_tpu.engine import xla_linmem

    outs = _score_outputs(q8, s8, mode, scoring, engine, mesh=mesh)
    return xla_linmem.extract_score_from_outputs(
        outs, len(q8), len(s8), mode, scoring
    )


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "geo", "fwd_persistent", "interpret"),
)
def _endpoint_fused_jit(q2, s2, m, n, mode, sc, geo, fwd_persistent,
                        interpret=False):
    """BOTH endpoint-reduction passes in one dispatch (semiglobal/local,
    linear scoring, kernel path): forward sweep, on-device end
    extraction (bit-exact mirror of extract_score_from_outputs incl.
    the semiglobal 0-boundary candidates and first-max tie order),
    on-device reversed-prefix construction, reverse sweep, on-device
    start extraction (mirror of the host reverse-pass logic). Saves a
    dispatch + fetch round trip (~120 ms on a tunneled TPU).

    Returns int32 [score, ei, ej, rscore, ri, rj]."""
    from anyseq_tpu.kernels import band as _b

    G, R, U = geo
    M_pad = q2.shape[0] * 128
    N_pad = s2.shape[0] * 128
    NEGS = jnp.int32(SCORE_MIN)
    local = mode is Mode.LOCAL

    outs_f = _b._score_padded(
        q2, s2, m, n, mode, sc, emit_col=not local, G=G, rw=R, uu=U,
        persistent=fwd_persistent, need_pos=True, interpret=interpret,
    )
    if local:
        best = outs_f["best"]
        score, ei, ej = best[0], best[1], best[2]
    else:
        lrow = jnp.where(jnp.arange(N_pad) < n, outs_f["last_row"], NEGS)
        lcol = jnp.where(jnp.arange(M_pad) < m, outs_f["last_col"], NEGS)
        rmax = jnp.max(lrow)
        rarg = jnp.argmax(lrow).astype(jnp.int32)
        # row candidates prepended with the 0 boundary at j = -1:
        # boundary wins ties (np.argmax over the concat picks index 0)
        score = jnp.maximum(rmax, 0)
        ej = jnp.where(0 >= rmax, jnp.int32(-1), rarg)
        ei = jnp.int32(m - 1)
        cmax = jnp.max(lcol)
        carg = jnp.argmax(lcol).astype(jnp.int32)
        cscore = jnp.maximum(cmax, 0)
        ci_ = jnp.where(0 >= cmax, jnp.int32(-1), carg)
        take = cscore > score
        score = jnp.where(take, cscore, score)
        ei = jnp.where(take, ci_, ei)
        ej = jnp.where(take, jnp.int32(n - 1), ej)

    # Reversed end-prefix, built on device (positions past the prefix
    # are out-of-range pads, as the kernel fast paths require).
    mr = ei + 1
    nr = ej + 1
    iq = ei - jnp.arange(M_pad)
    qr = jnp.where(
        iq >= 0,
        q2.reshape(-1)[jnp.clip(iq, 0, M_pad - 1)], _b.PAD_Q
    ).astype(jnp.int32)
    js = ej - jnp.arange(N_pad)
    sr = jnp.where(
        js >= 0,
        s2.reshape(-1)[jnp.clip(js, 0, N_pad - 1)], _b.PAD_S
    ).astype(jnp.int32)
    qr2 = qr.reshape(-1, 128)
    sr2 = sr.reshape(-1, 128)
    mr_c = jnp.maximum(mr, 1)
    nr_c = jnp.maximum(nr, 1)

    if local:
        outs_r = _b._score_padded(
            qr2, sr2, mr_c, nr_c, mode, sc, emit_col=False, G=G, rw=R,
            uu=U, persistent=False, need_pos=True, interpret=interpret,
        )
        bestr = outs_r["best"]
        rscore, ri, rj = bestr[0], bestr[1], bestr[2]
    else:
        # GLOBAL boundary inits, semiglobal-style extraction with the
        # all-gap boundary candidates (host reverse-pass logic).
        outs_r = _b._score_padded(
            qr2, sr2, mr_c, nr_c, Mode.GLOBAL, sc, emit_col=True, G=G,
            rw=R, uu=U, persistent=False, need_pos=True,
            interpret=interpret,
        )
        g = jnp.int32(sc.gap)
        lrow = jnp.where(jnp.arange(N_pad) < nr, outs_r["last_row"],
                         NEGS)
        lcol = jnp.where(jnp.arange(M_pad) < mr, outs_r["last_col"],
                         NEGS)
        rj_ = jnp.argmax(lrow).astype(jnp.int32)
        rscore = lrow[rj_]
        ri = mr - 1
        rj = rj_
        ci = jnp.argmax(lcol).astype(jnp.int32)
        take = lcol[ci] > rscore
        rscore = jnp.where(take, lcol[ci], rscore)
        ri = jnp.where(take, ci, ri)
        rj = jnp.where(take, nr - 1, rj)
        take = g * mr > rscore
        rscore = jnp.where(take, g * mr, rscore)
        ri = jnp.where(take, mr - 1, ri)
        rj = jnp.where(take, jnp.int32(-1), rj)
        take = g * nr > rscore
        rscore = jnp.where(take, g * nr, rscore)
        ri = jnp.where(take, jnp.int32(-1), ri)
        rj = jnp.where(take, nr - 1, rj)

    return jnp.stack([score, ei, ej, rscore, ri, rj]).astype(jnp.int32)


def _endpoint_reduction_fused(q8, s8, mode, scoring, engine,
                              interpret=False):
    """Host driver for :func:`_endpoint_fused_jit`, or None when the
    configuration keeps the two-pass path (affine, no kernel, LOCAL
    empty-score early-exit handled by the caller either way).
    ``interpret`` runs the kernels in interpret mode (CPU tests)."""
    from anyseq_tpu.engine import api
    from anyseq_tpu.kernels import band as _b

    if isinstance(scoring, AffineScoring):
        return None
    if not interpret and not (engine in ("auto", "pallas")
                              and _b.available()):
        return None
    m, n = len(q8), len(s8)
    _, _, _, _, qp, sp = api._prep(q8, s8)
    emit_col = mode is not Mode.LOCAL
    if interpret:
        G, R, U = 2, 8, None
    else:
        G, R, U = _b._pick_geometry(m, n, emit_col, False)
    W = R * _b.LANES
    M_pad = _b._bucket(m, W)
    if M_pad - m < _b.LANES:
        M_pad = (m + _b.LANES + W - 1) // W * W
    if M_pad > _b.M_MAX:
        return None
    N_pad = -(-_b._bucket(n, W) // (G * W)) * (G * W)
    q2 = _b._fit_padded(qp, M_pad, m, _b.PAD_Q)
    s2 = _b._fit_padded(sp, N_pad, n, _b.PAD_S)
    T_est = 128 * (-(-m // 128)) + W + (W if emit_col else 0)
    fwd_persistent = (N_pad // (G * W) > 1
                      and (G - 1) * (W + 128) + W + 254 <= T_est)
    out = np.asarray(_endpoint_fused_jit(
        q2, s2, jnp.int32(m), jnp.int32(n), mode, scoring,
        (G, R, U), fwd_persistent, interpret=interpret,
    ))
    return tuple(int(x) for x in out)


def align_hirschberg(query, subject, mode, scoring=LinearScoring(),
                     engine="auto", min_width=None, mesh=None,
                     sp_min_width=None, checkpoint_path=None) -> Alignment:
    """Linear-memory alignment construction: Hirschberg for linear gap
    scoring, Myers-Miller for affine (Gotoh). With ``mesh`` the linear
    construction is distributed over the device mesh and bit-identical
    to the single-device result (see :func:`_hb_global`).

    ``checkpoint_path``: durable npz state updated after every completed
    unit of work; a killed run re-invoked with the same arguments resumes
    and produces a byte-identical alignment. A checkpoint from different
    inputs or parameters is rejected. Covers every construction mode:
    GLOBAL saves divide levels + terminal chunks under ``checkpoint_path``
    itself (affine Myers-Miller included); semiglobal/local additionally
    save the endpoint-reduction stages (forward end, reverse start) under
    ``checkpoint_path`` with the rectangle construction state in
    ``checkpoint_path + ".rect"``."""
    mode = Mode.parse(mode)
    affine = isinstance(scoring, AffineScoring)
    q8 = as_u8(query)
    s8 = as_u8(subject)
    m, n = len(q8), len(s8)
    if m == 0 or n == 0:
        raise ValueError("empty sequences are not supported")
    if min_width is None:
        # Each divide level costs a fixed dispatch + fetch round trip
        # (~65 ms on a tunneled TPU) regardless of its compute, so on
        # the kernel path it pays to stop dividing ~2 levels earlier
        # and hand wider stripes to the batched terminal pred sweep
        # (memory stays O(B * h * 1024) packed 2-bit). CPU/XLA keeps
        # the narrower stripes (no dispatch economics, smaller preds).
        from anyseq_tpu.kernels import band as _bandmod

        min_width = 1024 if (engine in ("auto", "pallas")
                             and _bandmod.available()) else MIN_WIDTH

    def hb_rect(qr8, sr8, oi, oj):
        rc = None
        if checkpoint_path is not None:
            path = (checkpoint_path if mode is Mode.GLOBAL
                    else checkpoint_path + ".rect")
            rc = _HbCheckpoint(
                path,
                _ckpt_key(qr8, sr8, Mode.GLOBAL, scoring, min_width),
            )
        if affine:
            return _hb_global_affine(qr8, sr8, oi, oj, out_q, out_s,
                                     scoring, engine, min_width, ckpt=rc,
                                     mesh=mesh, sp_min_width=sp_min_width)
        return _hb_global(qr8, sr8, oi, oj, out_q, out_s, scoring,
                          engine, min_width, mesh=mesh,
                          sp_min_width=sp_min_width, ckpt=rc)

    out_q = np.full(m + n, EMPTY_SYM, dtype=np.uint8)
    out_s = np.full(m + n, EMPTY_SYM, dtype=np.uint8)

    if mode is Mode.GLOBAL:
        score = hb_rect(q8, s8, 0, 0)
        return Alignment(score, bytes(out_q), bytes(out_s), (0, 0))

    # semiglobal / local: endpoint reduction to a global sub-rectangle.
    # The two reduction passes are the checkpoint stages for these modes
    # (stage 1 = forward end found, stage 2 = reverse start found); the
    # rectangle construction then has its own level-granular state.
    outer = None
    stage = None
    if checkpoint_path is not None:
        outer = _HbCheckpoint(
            checkpoint_path, _ckpt_key(q8, s8, mode, scoring, min_width)
        )
        ck = outer.load()
        if ck is not None:
            stage = {k: int(ck[k]) for k in
                     ("stage", "score", "ei", "ej", "rscore", "ri", "rj")}

    fused6 = None
    if stage is None and mesh is None:
        _et0 = time.perf_counter()
        fused6 = _endpoint_reduction_fused(q8, s8, mode, scoring, engine)
        if fused6 is not None:
            _tlog(f"endpoint fused "
                  f"{(time.perf_counter()-_et0)*1e3:.0f}ms")

    if fused6 is not None:
        score, ei, ej, _rscore_f, _ri_f, _rj_f = fused6
        stage = {"stage": 2, "score": score, "ei": ei, "ej": ej,
                 "rscore": _rscore_f, "ri": _ri_f, "rj": _rj_f}
        if outer is not None:
            outer.save(stage=np.int64(2), score=np.int64(score),
                       ei=np.int64(ei), ej=np.int64(ej),
                       rscore=np.int64(_rscore_f), ri=np.int64(_ri_f),
                       rj=np.int64(_rj_f))
    elif stage is not None and stage["stage"] >= 1:
        score, (ei, ej) = stage["score"], (stage["ei"], stage["ej"])
    else:
        _ft0 = time.perf_counter()
        score, end = _find_end(q8, s8, mode, scoring, engine, mesh=mesh)
        _tlog(f"fwd pass {(time.perf_counter()-_ft0)*1e3:.0f}ms")
        ei, ej = end
        if outer is not None:
            outer.save(stage=np.int64(1), score=np.int64(score),
                       ei=np.int64(ei), ej=np.int64(ej),
                       rscore=np.int64(0), ri=np.int64(0),
                       rj=np.int64(0))
    if ei < 0 or ej < 0 or (mode is Mode.LOCAL and score <= 0):
        # Empty alignment (boundary maximum / all-negative local matrix)
        return Alignment(score, bytes(out_q), bytes(out_s), (ei + 1, ej + 1))

    # Reverse pass on the end-prefix finds the start position.
    #
    # local: a plain reverse local pass (symmetric).
    # semiglobal: the reverse problem must pin its start to the original
    # end cell, which means GLOBAL boundary inits with semiglobal-style
    # max-over-last-row/col extraction (free original start on the top/left
    # boundary maps to the reverse matrix's last row/column).
    qr = q8[: ei + 1][::-1]
    sr = s8[: ej + 1][::-1]
    _rt0 = time.perf_counter()
    if stage is not None and stage["stage"] >= 2:
        rscore, ri, rj = stage["rscore"], stage["ri"], stage["rj"]
    elif mode is Mode.LOCAL:
        rscore, rend = _find_end(qr, sr, mode, scoring, engine, mesh=mesh)
        ri, rj = rend
    else:
        outs = _score_outputs(qr, sr, Mode.GLOBAL, scoring, engine,
                              mesh=mesh)
        mr, nr = len(qr), len(sr)
        # Candidates include the -1 boundary entries of the reverse-global
        # matrix (all-gap overlap: H_rev[mr-1][-1] = mr*g, H_rev[-1][nr-1]
        # = nr*g), which can tie the interior maxima when the optimal
        # semiglobal path degenerates to pure gaps. Interior candidates
        # win ties (strict > below) so the picked rectangle is non-empty
        # whenever a non-empty representation of the score exists.
        lrow = outs["last_row"][:nr]
        lcol = outs["last_col"][:mr]
        rj_ = int(np.argmax(lrow))
        rscore = int(lrow[rj_])
        ri, rj = mr - 1, rj_
        ci = int(np.argmax(lcol))
        if int(lcol[ci]) > rscore:
            rscore = int(lcol[ci])
            ri, rj = ci, nr - 1
        def all_gap(L):
            if affine:
                return scoring.gap_open + scoring.gap_extend * L
            return scoring.gap * L

        if all_gap(mr) > rscore:
            rscore = all_gap(mr)
            ri, rj = mr - 1, -1
        if all_gap(nr) > rscore:
            rscore = all_gap(nr)
            ri, rj = -1, nr - 1
    _tlog(f"rev pass {(time.perf_counter()-_rt0)*1e3:.0f}ms")
    if outer is not None and (stage is None or stage["stage"] < 2):
        outer.save(stage=np.int64(2), score=np.int64(score),
                   ei=np.int64(ei), ej=np.int64(ej),
                   rscore=np.int64(rscore), ri=np.int64(ri),
                   rj=np.int64(rj))
    si = ei - ri
    sj = ej - rj
    # si/sj may be ei+1/ej+1 if the reverse max sits on the -1 boundary
    # (empty overlap); the rectangle is then empty.
    sub_q = q8[si: ei + 1]
    sub_s = s8[sj: ej + 1]
    if len(sub_q) == 0 or len(sub_s) == 0:
        return Alignment(score, bytes(out_q), bytes(out_s), (si, sj))
    sub_score = hb_rect(sub_q, sub_s, si, sj)
    if not (sub_score == score == rscore):
        raise RuntimeError(
            f"hirschberg endpoint reduction mismatch: fwd={score} "
            f"rev={rscore} rect={sub_score} (mode={mode}, m={m}, n={n}, "
            f"end=({ei},{ej}), start=({si},{sj})) -- please report"
        )
    return Alignment(score, bytes(out_q), bytes(out_s), (si, sj))
