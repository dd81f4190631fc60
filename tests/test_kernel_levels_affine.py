"""Affine (Gotoh) fused Myers-Miller levels kernel engine
(interpret mode on CPU). Own file: the depth-3 fused dispatch is a
large XLA:CPU interpreter compile (see run_tests.py)."""
import numpy as np
import pytest

from anyseq_tpu.core.types import AffineScoring
from anyseq_tpu.kernels import band

from conftest import random_dna


def test_kernel_fused_levels_affine(rng):
    """score_levels_fused_affine (all Myers-Miller divide levels in one
    dispatch, on-device Gotoh merges + crossing-flag propagation) is
    bit-identical -- split rows, crossing flags, AND merged scores -- to
    the XLA batch sweep + host merge at every fused sub-level.

    depth=2 here: chaining three interpreted slotted kernels in one jit
    deterministically crashes the XLA:CPU compiler (the same upstream
    fragility run_tests.py isolates); deeper fusion is covered on real
    TPU by the bench parity gate and the construction's score
    cross-check."""
    import jax.numpy as jnp

    from anyseq_tpu.engine import batch
    from anyseq_tpu.engine.hirschberg import _merge_halves_affine

    sc = AffineScoring(2, -1, -3, -1)
    m, n = 700, 900
    q32 = np.asarray(rng.integers(0, 4, m), np.int32)
    s32 = np.asarray(rng.integers(0, 4, n), np.int32)
    parts = np.array(
        [[0, 350, 0, 450, 0, 1], [350, 700, 450, 900, 1, 0]], np.int64)
    fused = band.score_levels_fused_affine(
        jnp.asarray(q32), jnp.asarray(s32), parts, sc, depth=2,
        interpret=True)
    assert fused is not None and len(fused) == 2

    def host_level(lvl):
        P = len(lvl)
        Mb = batch._bucket(max(p[1] - p[0] for p in lvl))
        Nb = batch._bucket(
            max(max((p[3] - p[2]) // 2,
                    (p[3] - p[2]) - (p[3] - p[2]) // 2) for p in lvl),
            128)
        qarr = np.full((2 * P, Mb), batch._PAD_Q, np.int32)
        sarr = np.full((2 * P, Nb), batch._PAD_S, np.int32)
        ms = np.empty(2 * P, np.int32)
        ns = np.empty(2 * P, np.int32)
        sg = np.zeros(2 * P, bool)
        for p, (qlo, qhi, slo, shi, sgf, egf) in enumerate(lvl):
            h, w = qhi - qlo, shi - slo
            mid = w // 2
            qarr[2 * p, :h] = q32[qlo:qhi]
            qarr[2 * p + 1, :h] = q32[qlo:qhi][::-1]
            sarr[2 * p, :mid] = s32[slo:slo + mid]
            sarr[2 * p + 1, :w - mid] = s32[slo + mid:shi][::-1]
            ms[2 * p] = ms[2 * p + 1] = h
            ns[2 * p] = mid
            ns[2 * p + 1] = w - mid
            sg[2 * p] = sgf
            sg[2 * p + 1] = egf
        ch, ce = batch.last_cols_batch_affine(
            jnp.asarray(qarr), jnp.asarray(sarr), jnp.asarray(ms),
            jnp.asarray(ns), sc, jnp.asarray(sg))
        ch = np.asarray(ch).T
        ce = np.asarray(ce).T
        out = []
        for p, (qlo, qhi, slo, shi, sgf, egf) in enumerate(lvl):
            h, w = qhi - qlo, shi - slo
            mid = w // 2
            out.append(_merge_halves_affine(
                ch[2 * p, :h].astype(np.int64),
                ce[2 * p, :h].astype(np.int64),
                ch[2 * p + 1, :h].astype(np.int64),
                ce[2 * p + 1, :h].astype(np.int64),
                h, mid, w - mid, sc, bool(sgf), bool(egf)))
        return out

    lvl = [tuple(map(int, p)) for p in parts]
    for d in range(len(fused)):
        exp = host_level(lvl)
        ks_d, gp_d, sc_d = fused[d]
        nxt = []
        for idx, part in enumerate(lvl):
            k, ing, scv = exp[idx]
            assert (int(ks_d[idx]), bool(gp_d[idx]), int(sc_d[idx])) \
                == (k, ing, scv), (d, idx)
            qlo, qhi, slo, shi, sgf, egf = part
            mid = (shi - slo) // 2
            nxt.append((qlo, qlo + k + 1, slo, slo + mid, sgf, ing))
            nxt.append((qlo + k + 1, qhi, slo + mid, shi, ing, egf))
        lvl = nxt
