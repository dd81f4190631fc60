"""Pallas wavefront-kernel parity tests (interpret mode on CPU).

Pins the staggered-concurrent-window kernel (anyseq_tpu/kernels/band.py)
bit-exactly against the XLA engines for every scheme, including the
multi-window boundary-column chaining, the rotated last-column gather,
and the affine (Gotoh) recurrence."""
import numpy as np
import pytest

from anyseq_tpu.core.types import AffineScoring, LinearScoring, Mode
from anyseq_tpu.engine import api, xla_affine, xla_linmem
from anyseq_tpu.kernels import band

from conftest import random_dna

LIN = LinearScoring(2, -1, -1)
AFF = AffineScoring(2, -1, -3, -1)


def _prep(rng, m, n):
    q = random_dna(rng, m)
    s = random_dna(rng, n)
    _, _, m, n, qp, sp = api._prep(q, s)
    return m, n, qp, sp


def _check(outs, ref, m, n, mode, last_row=None):
    """Contract: LOCAL closed-form score_pair defines only `best`
    (last_row collection is elided from the hot loop); boundary-mode
    calls always define last_row (pass last_row=True to force)."""
    if last_row is None:
        last_row = mode is not Mode.LOCAL
    if last_row:
        np.testing.assert_array_equal(
            np.asarray(outs["last_row"])[:n], np.asarray(ref["last_row"])[:n]
        )
    if mode is Mode.LOCAL:
        np.testing.assert_array_equal(
            np.asarray(outs["best"]), np.asarray(ref["best"])
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(outs["last_col"])[:m], np.asarray(ref["last_col"])[:m]
        )


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
def test_kernel_linear_multiwindow(mode, rng):
    """2 staggered chains, 2+ windows: exercises colbuf chaining."""
    m, n, qp, sp = _prep(rng, 300, 2400)
    ref = xla_linmem.score_rows(qp, sp, m, n, mode, LIN)
    outs = band.score_pair(qp, sp, m, n, mode, LIN, interpret=True, G=2)
    _check(outs, ref, m, n, mode)


def test_kernel_linear_single_window(rng):
    m, n, qp, sp = _prep(rng, 50, 80)
    ref = xla_linmem.score_rows(qp, sp, m, n, Mode.GLOBAL, LIN)
    outs = band.score_pair(qp, sp, m, n, Mode.GLOBAL, LIN, interpret=True)
    _check(outs, ref, m, n, Mode.GLOBAL)


def test_kernel_tall(rng):
    """m >> n: many boundary-column chunks per window."""
    m, n, qp, sp = _prep(rng, 2500, 300)
    ref = xla_linmem.score_rows(qp, sp, m, n, Mode.LOCAL, LIN)
    outs = band.score_pair(qp, sp, m, n, Mode.LOCAL, LIN, interpret=True)
    _check(outs, ref, m, n, Mode.LOCAL)


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
def test_kernel_packed_preds_and_device_walk(mode, rng):
    """Packed 2-bit pred emission == XLA pred matrix, and the on-device
    packed walk reproduces the oracle alignment exactly."""
    from anyseq_tpu.engine import device_tb
    from anyseq_tpu.ref import oracle

    q = random_dna(rng, 200)
    s = random_dna(rng, 1100)
    _, _, m, n, qp, sp = api._prep(q, s)
    ref = xla_linmem.score_rows_with_preds(qp, sp, m, n, mode, LIN)
    refP = np.asarray(ref["preds"])[:m, :n]
    outs = band.score_pair(qp, sp, m, n, mode, LIN, interpret=True, G=2,
                           emit_preds=True)
    P = band.unpack_preds_host(outs["packed_preds"], outs["p_pl"], m, n)
    np.testing.assert_array_equal(P, refP)

    score, end = xla_linmem.extract_score_from_outputs(
        {k: np.asarray(v) for k, v in outs.items()}, m, n, mode, LIN,
    )
    oq, os, start = device_tb.walk_packed(outs, qp, sp, m, n, end, mode)
    exp_score, exp_q, exp_s, exp_start = oracle.align(q, s, mode, LIN)
    assert score == exp_score
    assert bytes(oq) == bytes(exp_q)
    assert bytes(os) == bytes(exp_s)
    assert start == exp_start


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
    ns = [700, 640, 384, 1100]
    sgaps = [0, 1, 0, 1]
    qarr = np.zeros((B, 256), np.int32)
    sarr = np.zeros((B, 1100), np.int32)
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


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL,
                                  Mode.LOCAL])
def test_kernel_affine_packed_preds_and_walk(mode, rng):
    """Packed 4-bit affine pred emission == the XLA affine pred planes,
    and the on-device 3-state walk reproduces the affine oracle
    alignment exactly (VERDICT r2 item 6)."""
    from anyseq_tpu.engine import device_tb, xla_affine
    from anyseq_tpu.ref import oracle_affine

    asc = AffineScoring(2, -1, -3, -1)
    q = random_dna(rng, 200)
    s = random_dna(rng, 1100)
    _, _, m, n, qp, sp = api._prep(q, s)
    ref = xla_affine.score_rows_affine_with_preds(qp, sp, m, n, mode, asc)
    refP = np.asarray(ref["preds"])[:m, :n]
    outs = band.score_pair(qp, sp, m, n, mode, asc, interpret=True, G=2,
                           emit_preds=True)
    P = band.unpack_preds_host(outs["packed_preds"], outs["p_pl"], m, n,
                               affine=True)
    np.testing.assert_array_equal(P, refP)

    score, end = xla_linmem.extract_score_from_outputs(
        {k: np.asarray(v) for k, v in outs.items()}, m, n, mode, asc,
    )
    oq, os, start = device_tb.walk_packed_affine(outs, qp, sp, m, n, end,
                                                 mode)
    exp = oracle_affine.align_affine(q, s, mode, asc)
    exp_score, exp_q, exp_s, exp_start = exp
    assert score == exp_score
    assert bytes(oq) == bytes(exp_q)
    assert bytes(os) == bytes(exp_s)
    assert start == exp_start


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.LOCAL])
def test_kernel_affine(mode, rng):
    """Gotoh kernel vs the XLA affine engine, incl. the E boundary
    stream across windows."""
    m, n, qp, sp = _prep(rng, 300, 1300)
    ref = xla_affine.score_rows_affine(qp, sp, m, n, mode, AFF)
    outs = band.score_pair(qp, sp, m, n, mode, AFF, interpret=True, G=2)
    _check(outs, ref, m, n, mode)


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
def test_kernel_chained_bands_linear(mode, rng):
    """Boundary-mode band chaining (m > band_rows): bit-exact vs the
    single-sweep XLA engine, including the cross-band local best merge."""
    m, n, qp, sp = _prep(rng, 2100, 1500)
    ref = xla_linmem.score_rows(qp, sp, m, n, mode, LIN)
    outs = band.score_pair_chained(qp, sp, m, n, mode, LIN,
                                   band_rows=1024, interpret=True)
    _check(outs, ref, m, n, mode, last_row=True)
    rs, rp = xla_linmem.extract_score_from_outputs(
        {k: np.asarray(v) for k, v in ref.items()}, m, n, mode, LIN)
    os_, op = xla_linmem.extract_score_from_outputs(
        {k: np.asarray(v) for k, v in outs.items()}, m, n, mode, LIN)
    assert (rs, rp) == (os_, op)


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
def test_kernel_chained_bands_affine(mode, rng):
    """Affine band chaining: H and F boundary rows stream across bands."""
    m, n, qp, sp = _prep(rng, 1400, 900)
    ref = xla_affine.score_rows_affine(qp, sp, m, n, mode, AFF)
    outs = band.score_pair_chained(qp, sp, m, n, mode, AFF,
                                   band_rows=1024, interpret=True)
    _check(outs, ref, m, n, mode, last_row=True)


def test_kernel_band_boundary_inputs(rng):
    """score_band with hand-built boundary state must equal the matching
    rows of a full sweep (the restartable-boundary contract)."""
    import jax.numpy as jnp

    m, n, qp, sp = _prep(rng, 512, 640)
    ref = xla_linmem.score_rows(qp, sp, m, n, Mode.GLOBAL, LIN)
    # Full matrix via oracle rows: band 2 covers rows [256, 512).
    from anyseq_tpu.ref import oracle

    q8 = np.asarray(qp)[:m].astype(np.uint8)
    s8 = np.asarray(sp)[:n].astype(np.uint8)
    H, _ = oracle.dp_full(q8, s8, Mode.GLOBAL, LIN)  # (m+1, n+1) haloed
    i0 = 256
    N_pad = 1024 * 2  # bucket(640, 1024) -> 1024; G*W alignment below
    G = 1
    N_pad = 1024
    row_in = np.full(N_pad, 0, np.int32)
    row_in[:n] = H[i0, 1:]
    col_in = np.zeros(512, np.int32)
    col_in[:m - i0] = ((i0 + np.arange(m - i0) + 1) * LIN.gap)
    corners = band._band_corners(
        jnp.asarray(row_in), jnp.int32(i0 * LIN.gap), N_pad // band.W
    )
    outs = band._score_band_padded(
        jnp.asarray(np.concatenate([
            np.asarray(qp)[i0:m], np.zeros(512 - (m - i0), np.int32)
        ])).reshape(-1, 128),
        jnp.asarray(np.concatenate([
            np.asarray(sp)[:n], np.full(N_pad - n, 255, np.int32)
        ])).reshape(-1, 128),
        jnp.asarray(row_in).reshape(-1, 128),
        jnp.asarray(col_in).reshape(-1, 128),
        corners, jnp.int32(m - i0), jnp.int32(n),
        Mode.GLOBAL, LIN, emit_col=True, interpret=True, G=G,
    )
    np.testing.assert_array_equal(
        np.asarray(outs["last_row"])[:n], H[m, 1:n + 1]
    )
    np.testing.assert_array_equal(
        np.asarray(outs["last_col"])[:m - i0], H[i0 + 1:, n]
    )
    # col_out = right edge of the padded matrix width; check vs the
    # last_row/col consistency instead of padded values: the first
    # (m - i0) entries must equal column N_pad-1 of a padded DP -- cheap
    # sanity: finite int32 values present.
    assert np.asarray(outs["col_out"]).shape[0] == 512


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

    B = 5
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

    for B, mlo, nlo, nhi in ((6, 250, 2200, 3000), (3, 1400, 9000, 9800)):
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
                                       LIN, interpret=True)
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
