"""Hirschberg-level kernel engines (interpret mode on CPU): the
on-device level step, wide-window levels, fused multi-level dispatch,
and the fused root P=1+P=2 levels. Own file: these are the largest
XLA:CPU interpreter compiles in the suite (see run_tests.py)."""
import numpy as np
import pytest

from anyseq_tpu.core.types import AffineScoring, LinearScoring, Mode
from anyseq_tpu.engine import api, xla_affine, xla_linmem
from anyseq_tpu.kernels import band

from conftest import random_dna

from test_kernel import _prep, _check, LIN, AFF


def test_kernel_device_level_step(rng):
    """Fully on-device Hirschberg level (gathers + slotted kernel +
    hb_sum merge) returns the same (split, score) as the host merge
    over the XLA engines."""
    import jax.numpy as jnp

    from anyseq_tpu.engine import xla_linmem
    from anyseq_tpu.engine.hirschberg import _merge_halves

    m, n = 1500, 1600
    q32 = np.asarray(rng.integers(0, 4, m), np.int32)
    s32 = np.asarray(rng.integers(0, 4, n), np.int32)
    partsets = [
        [(0, 700, 0, 600), (700, 1500, 600, 1600)],
    ]
    for parts in partsets:
        got = band.score_level_parts(
            jnp.asarray(q32), jnp.asarray(s32),
            np.asarray(parts, np.int64), LIN, interpret=True,
        )
        assert got is not None
        # direct (untransposed) orientation stays bit-identical
        got_d = band.score_level_parts(
            jnp.asarray(q32), jnp.asarray(s32),
            np.asarray(parts, np.int64), LIN, interpret=True,
            transposed=False,
        )
        assert got_d is not None
        np.testing.assert_array_equal(got[0], got_d[0])
        np.testing.assert_array_equal(got[1], got_d[1])
        ks, scs = got
        for p, (qlo, qhi, slo, shi) in enumerate(parts):
            h, w = qhi - qlo, shi - slo
            mid = w // 2
            qa = q32[qlo:qhi]
            sa = s32[slo:slo + mid]
            qb = np.ascontiguousarray(qa[::-1])
            sb = np.ascontiguousarray(s32[slo + mid:shi][::-1])
            L = np.asarray(xla_linmem.score_rows(
                jnp.asarray(qa), jnp.asarray(sa), h, mid,
                Mode.GLOBAL, LIN)["last_col"])[:h].astype(np.int64)
            Rv = np.asarray(xla_linmem.score_rows(
                jnp.asarray(qb), jnp.asarray(sb), h, w - mid,
                Mode.GLOBAL, LIN)["last_col"])[:h].astype(np.int64)
            k_ref, s_ref = _merge_halves(L, Rv, h, mid, w - mid,
                                         LIN.gap)
            assert (int(ks[p]), int(scs[p])) == (k_ref, s_ref)


def test_kernel_device_level_wide_windows(rng):
    """score_level_parts with a tall-window override (rw=16): the wide
    shallow Hirschberg levels stream tall windows on TPU (~2-3x,
    tools/perf_sweep.py); bit-identical splits/scores vs the base
    geometry."""
    import jax.numpy as jnp

    LIN2 = LinearScoring(2, -1, -1)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    q = alpha[rng.integers(0, 4, 5000)].astype(np.int32)
    s = alpha[rng.integers(0, 4, 9000)].astype(np.int32)
    parts = np.array([[0, 4500, 0, 8800], [4500, 5000, 8800, 9000]],
                     np.int64)
    lvl8 = band.score_level_parts(jnp.asarray(q), jnp.asarray(s), parts,
                                  LIN2, interpret=True, rw=8)
    lvl16 = band.score_level_parts(jnp.asarray(q), jnp.asarray(s), parts,
                                   LIN2, interpret=True, rw=16)
    assert lvl8 is not None and lvl16 is not None
    np.testing.assert_array_equal(lvl8[0], lvl16[0])
    np.testing.assert_array_equal(lvl8[1], lvl16[1])


def test_kernel_fused_levels(rng):
    """score_levels_fused (two divide levels per dispatch, children
    built on device) is bit-identical to two sequential
    score_level_parts rounds, including garbage-row clamping for
    degenerate children."""
    import jax.numpy as jnp

    LIN2 = LinearScoring(2, -1, -1)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    q = alpha[rng.integers(0, 4, 3000)].astype(np.int32)
    s = alpha[rng.integers(0, 4, 5000)].astype(np.int32)
    parts = np.array(
        [[0, 1400, 0, 2400], [1400, 2900, 2400, 4700],
         [2900, 2960, 4700, 4800], [2960, 3000, 4800, 5000]], np.int64)
    fused = band.score_levels_fused(jnp.asarray(q), jnp.asarray(s),
                                    parts, LIN2, depth=2, interpret=True)
    assert fused is not None
    (ks0, sc0), (ks1, sc1) = fused
    ref0 = band.score_level_parts(jnp.asarray(q), jnp.asarray(s), parts,
                                  LIN2, interpret=True)
    np.testing.assert_array_equal(ks0, ref0[0])
    np.testing.assert_array_equal(sc0, ref0[1])
    kids = []
    for p, (qlo, qhi, slo, shi) in enumerate(parts):
        k = int(ref0[0][p])
        mid = (shi - slo) // 2
        kids.append([qlo, qlo + k + 1, slo, slo + mid])
        kids.append([qlo + k + 1, qhi, slo + mid, shi])
    kids = np.array(kids, np.int64)
    ref1 = band.score_level_parts(jnp.asarray(q), jnp.asarray(s), kids,
                                  LIN2, interpret=True)
    valid = (kids[:, 1] - kids[:, 0] > 1) & (kids[:, 3] - kids[:, 2] >= 2)
    np.testing.assert_array_equal(np.asarray(ks1)[valid], ref1[0][valid])
    np.testing.assert_array_equal(np.asarray(sc1)[valid], ref1[1][valid])


def test_kernel_top_levels_fused(rng):
    """score_top_levels_fused (root P=1+P=2 levels in one dispatch,
    full wide-window half sweeps + on-device merges) is bit-identical
    to sequential score_level_parts levels."""
    import jax.numpy as jnp

    LIN2 = LinearScoring(2, -1, -1)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    m, n = 2500, 8300
    q = alpha[rng.integers(0, 4, m)].astype(np.int32)
    s = alpha[rng.integers(0, 4, n)].astype(np.int32)
    top = band.score_top_levels_fused(q, s, m, n, LIN2, interpret=True)
    assert top is not None
    k0, score0, k2a, k2b = (int(x) for x in top)
    ref0 = band.score_level_parts(
        jnp.asarray(q), jnp.asarray(s),
        np.array([[0, m, 0, n]], np.int64), LIN2, interpret=True)
    assert (k0, score0) == (int(ref0[0][0]), int(ref0[1][0]))
    mid = n // 2
    kids = np.array([[0, k0 + 1, 0, mid], [k0 + 1, m, mid, n]],
                    np.int64)
    ref1 = band.score_level_parts(jnp.asarray(q), jnp.asarray(s), kids,
                                  LIN2, interpret=True)
    assert (k2a, k2b) == (int(ref1[0][0]), int(ref1[0][1]))
