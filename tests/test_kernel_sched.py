"""Pallas kernel scheduling-mode parity tests (interpret mode on CPU).

The batched / slotted / persistent / device-level execution modes of the
wavefront kernel (anyseq_tpu/kernels/band.py _make_kernel), bit-exact vs
the XLA engines. Split from test_kernel.py so the two slowest kernel
files load-balance across the test driver's workers (run_tests.py)."""
import numpy as np
import pytest

from anyseq_tpu.core.types import AffineScoring, LinearScoring, Mode
from anyseq_tpu.engine import api, xla_affine, xla_linmem
from anyseq_tpu.kernels import band

from conftest import random_dna

from test_kernel import _prep, _check, LIN, AFF


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL])
def test_kernel_batched_problems(mode, rng):
    """score_pairs_batched: many independent problems in ONE launch
    (grid over problems, per-problem dims), bit-identical boundary
    columns vs the XLA engine -- the construction-level engine."""
    B = 5
    ms = [300, 150, 257, 300, 64]
    ns = [900, 1100, 512, 700, 1500]
    qarr = np.zeros((B, 300), np.int32)
    sarr = np.zeros((B, 1500), np.int32)
    for b in range(B):
        qarr[b, :ms[b]] = rng.integers(65, 69, ms[b])
        sarr[b, :ns[b]] = rng.integers(65, 69, ns[b])
    outs = band.score_pairs_batched(qarr, sarr, ms, ns, mode, LIN,
                                    interpret=True)
    cols = np.asarray(outs["last_cols"])
    rows = np.asarray(outs["last_rows"])
    for b in range(B):
        ref = xla_linmem.score_rows(qarr[b], sarr[b], ms[b], ns[b],
                                    mode, LIN)
        np.testing.assert_array_equal(
            cols[b, :ms[b]], np.asarray(ref["last_col"])[:ms[b]]
        )
        np.testing.assert_array_equal(
            rows[b, :ns[b]], np.asarray(ref["last_row"])[:ns[b]]
        )


def test_kernel_batched_affine_sgap(rng):
    """Batched affine problems with PER-PROBLEM Myers-Miller start_gap
    flags (dynamic dims row): H and E columns match the XLA engine."""
    from anyseq_tpu.engine import xla_affine

    B = 4
    ms = [200, 130, 256, 90]
    ns = [400, 340, 384, 600]  # Nb=1024: NW=1, G=4 (small compile)
    sgaps = [0, 1, 0, 1]
    qarr = np.zeros((B, 256), np.int32)
    sarr = np.zeros((B, 600), np.int32)
    for b in range(B):
        qarr[b, :ms[b]] = rng.integers(65, 69, ms[b])
        sarr[b, :ns[b]] = rng.integers(65, 69, ns[b])
    outs = band.score_pairs_batched(qarr, sarr, ms, ns, Mode.GLOBAL,
                                    AFF, sgaps=sgaps, interpret=True)
    cols = np.asarray(outs["last_cols"])
    cols_e = np.asarray(outs["last_cols_e"])
    for b in range(B):
        ref = xla_affine.score_rows_affine(
            qarr[b], sarr[b], ms[b], ns[b], Mode.GLOBAL, AFF,
            start_gap=bool(sgaps[b]), emit_col_e=True,
        )
        np.testing.assert_array_equal(
            cols[b, :ms[b]], np.asarray(ref["last_col"])[:ms[b]]
        )
        np.testing.assert_array_equal(
            cols_e[b, :ms[b]], np.asarray(ref["last_col_e"])[:ms[b]]
        )


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
@pytest.mark.parametrize("sc", [LIN, AFF], ids=["linear", "affine"])
def test_kernel_persistent_chains(mode, sc, rng):
    """Persistent-chain mode (continuous rebirth, one grid step) is
    bit-identical to grid mode across multiple epochs per chain.

    Shapes satisfy the cross-epoch column-scratch constraint
    (G-1)*STAGGER + W + 254 <= T with G=2 and give 3 window groups, so
    every chain retires and is reborn at least twice."""
    m, n, qp, sp = _prep(rng, 1500, 4100)
    ref = band.score_pair(qp, sp, m, n, mode, sc, interpret=True, G=2,
                          persistent=False)
    outs = band.score_pair(qp, sp, m, n, mode, sc, interpret=True, G=2,
                           persistent=True)
    _check(outs, ref, m, n, mode)
    if mode is not Mode.LOCAL:
        np.testing.assert_array_equal(
            np.asarray(outs["last_row"])[:n],
            np.asarray(ref["last_row"])[:n],
        )
    if isinstance(sc, AffineScoring) and mode is not Mode.LOCAL:
        np.testing.assert_array_equal(
            np.asarray(outs["last_col_e"])[:m],
            np.asarray(ref["last_col_e"])[:m],
        )


def test_kernel_persistent_need_pos_false(rng):
    """Score-only local tracking (need_pos=False): same score, sentinel
    positions -- the reference's score() returns the score alone
    (align.impala:218-235)."""
    m, n, qp, sp = _prep(rng, 1500, 4100)
    ref = band.score_pair(qp, sp, m, n, Mode.LOCAL, LIN, interpret=True,
                          G=2, persistent=False)
    outs = band.score_pair(qp, sp, m, n, Mode.LOCAL, LIN, interpret=True,
                           G=2, persistent=True, need_pos=False)
    b, rb = np.asarray(outs["best"]), np.asarray(ref["best"])
    assert b[0] == rb[0]
    assert tuple(b[1:]) == (-1, -1)


def test_kernel_persistent_start_gap(rng):
    """Affine GLOBAL start_gap (Myers-Miller continuing-run init) under
    persistent chains."""
    m, n, qp, sp = _prep(rng, 1500, 4100)
    ref = band.score_pair(qp, sp, m, n, Mode.GLOBAL, AFF, interpret=True,
                          G=2, persistent=False, start_gap=True)
    outs = band.score_pair(qp, sp, m, n, Mode.GLOBAL, AFF, interpret=True,
                           G=2, persistent=True, start_gap=True)
    np.testing.assert_array_equal(
        np.asarray(outs["last_col"])[:m], np.asarray(ref["last_col"])[:m]
    )


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL])
@pytest.mark.parametrize("sc", [LIN, AFF], ids=["linear", "affine"])
def test_kernel_slotted_problems_as_chains(mode, sc, rng):
    """Slotted batched mode (NW=1: every chain an independent problem)
    is bit-identical to the per-problem engines."""
    from anyseq_tpu.engine import xla_affine, xla_linmem

    # affine: 3 problems (the G=3 kernel graph compiles ~3x faster than
    # G=5 in interpret mode and covers the same code paths)
    B = 3 if isinstance(sc, AffineScoring) else 5
    ms = [int(rng.integers(150, 300)) for _ in range(B)]
    ns = [int(rng.integers(400, 900)) for _ in range(B)]
    qarr = np.full((B, max(ms)), 254, np.int32)
    sarr = np.full((B, max(ns)), 255, np.int32)
    qps, sps = [], []
    for b in range(B):
        m, n, qp, sp = _prep(rng, ms[b], ns[b])
        qarr[b, :m] = np.asarray(qp)[:m]
        sarr[b, :n] = np.asarray(sp)[:n]
        qps.append(qp)
        sps.append(sp)
    out = band.score_pairs_batched(qarr, sarr, ms, ns, mode, sc,
                                   interpret=True)
    cols = np.asarray(out["last_cols"])
    for b in range(B):
        if isinstance(sc, AffineScoring):
            ref = xla_affine.score_rows_affine(
                qps[b], sps[b], ms[b], ns[b], mode, sc
            )
        else:
            ref = xla_linmem.score_rows(
                qps[b], sps[b], ms[b], ns[b], mode, sc
            )
        np.testing.assert_array_equal(
            cols[b, :ms[b]], np.asarray(ref["last_col"])[:ms[b]]
        )


def test_kernel_slotted_multiwindow_problems(rng):
    """Slotted mode with NW=3 windows per problem (mixed
    window/problem chain assignment) and with NW > G (persistent-style
    multi-epoch problems)."""
    from anyseq_tpu.engine import xla_linmem

    # (B, mlo, nlo, nhi, g_cap): partset 1 = NW=3 windows with PPE
    # problem mixing; partset 2 = NW=4; partset 3 lowers g_cap to 2 so
    # NW=3 > G forces the EPP>1 multi-epoch slot clock (in production
    # that path needs n > 20*W -- too big for interpret mode).
    for B, mlo, nlo, nhi, g_cap in (
        (6, 250, 2200, 3000, 20),
        (2, 600, 4200, 4700, 20),
        (2, 600, 3100, 3200, 2),
    ):
        ms = [int(rng.integers(mlo, mlo + 100)) for _ in range(B)]
        ns = [int(rng.integers(nlo, nhi)) for _ in range(B)]
        qarr = np.full((B, max(ms)), 254, np.int32)
        sarr = np.full((B, max(ns)), 255, np.int32)
        qps, sps = [], []
        for b in range(B):
            m, n, qp, sp = _prep(rng, ms[b], ns[b])
            qarr[b, :m] = np.asarray(qp)[:m]
            sarr[b, :n] = np.asarray(sp)[:n]
            qps.append(qp)
            sps.append(sp)
        out = band.score_pairs_batched(qarr, sarr, ms, ns, Mode.GLOBAL,
                                       LIN, interpret=True, g_cap=g_cap)
        cols = np.asarray(out["last_cols"])
        rows = np.asarray(out["last_rows"])
        for b in range(B):
            ref = xla_linmem.score_rows(
                qps[b], sps[b], ms[b], ns[b], Mode.GLOBAL, LIN
            )
            np.testing.assert_array_equal(
                cols[b, :ms[b]], np.asarray(ref["last_col"])[:ms[b]]
            )
            np.testing.assert_array_equal(
                rows[b, :ns[b]], np.asarray(ref["last_row"])[:ns[b]]
            )
