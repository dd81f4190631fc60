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


def _check(outs, ref, m, n, mode):
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


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.LOCAL])
def test_kernel_affine(mode, rng):
    """Gotoh kernel vs the XLA affine engine, incl. the E boundary
    stream across windows."""
    m, n, qp, sp = _prep(rng, 300, 1300)
    ref = xla_affine.score_rows_affine(qp, sp, m, n, mode, AFF)
    outs = band.score_pair(qp, sp, m, n, mode, AFF, interpret=True, G=2)
    _check(outs, ref, m, n, mode)
