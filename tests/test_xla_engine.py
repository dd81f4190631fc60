"""Parity tests: XLA linmem engine vs the numpy oracle (scores, positions,
predecessor matrices, and full-traceback alignments)."""
import numpy as np
import pytest

import anyseq_tpu
from anyseq_tpu.core.types import LinearScoring, Mode
from anyseq_tpu.engine import api, xla_linmem
from anyseq_tpu.ref import oracle

from conftest import random_dna, mutate

MODES = [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL]
SCORINGS = [LinearScoring(2, -1, -1), LinearScoring(3, -2, -2), LinearScoring(1, -3, 0)]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("sc", SCORINGS)
def test_score_parity_small(mode, sc):
    rng = np.random.default_rng(7)
    for _ in range(3):
        q = random_dna(rng, int(rng.integers(1, 90)))
        s = random_dna(rng, int(rng.integers(1, 90)))
        expected = oracle.align_score(q, s, mode, sc)
        got = anyseq_tpu.align_score(q, s, mode, sc, engine="xla")
        if got != expected:
            # full DP state in the failure message (utils/debug.py)
            from anyseq_tpu.utils.debug import format_dp_state

            state = (format_dp_state(q[:24], s[:24], mode, sc)
                     if max(len(q), len(s)) <= 24 else "")
            raise AssertionError(
                f"{mode} {sc} got={got} expected={expected}\n"
                f"q={q!r}\ns={s!r}\n{state}"
            )


@pytest.mark.parametrize("mode", MODES)
def test_score_parity_related_pairs(mode):
    sc = LinearScoring(2, -1, -1)
    rng = np.random.default_rng(11)
    q = random_dna(rng, 300)
    s = mutate(rng, q)
    assert anyseq_tpu.align_score(q, s, mode, sc) == oracle.align_score(q, s, mode, sc)


@pytest.mark.parametrize("mode", MODES)
def test_rows_and_cols_match_oracle(mode):
    sc = LinearScoring(2, -1, -1)
    rng = np.random.default_rng(13)
    q = random_dna(rng, 70)
    s = random_dna(rng, 50)
    m, n = len(q), len(s)
    H, _ = oracle.dp_full(q, s, mode, sc)
    _, _, _, _, qp, sp = api._prep(q, s)
    outs = xla_linmem.score_rows(qp, sp, m, n, mode, sc)
    np.testing.assert_array_equal(np.asarray(outs["last_row"])[:n], H[m, 1:])
    np.testing.assert_array_equal(np.asarray(outs["last_col"])[:m], H[1:, n])


@pytest.mark.parametrize("mode", MODES)
def test_preds_match_oracle(mode):
    sc = LinearScoring(2, -1, -1)
    rng = np.random.default_rng(17)
    q = random_dna(rng, 40)
    s = random_dna(rng, 60)
    m, n = len(q), len(s)
    _, P = oracle.dp_full(q, s, mode, sc)
    _, _, _, _, qp, sp = api._prep(q, s)
    outs = xla_linmem.score_rows_with_preds(qp, sp, m, n, mode, sc)
    np.testing.assert_array_equal(np.asarray(outs["preds"])[:m, :n], P[1:, 1:])


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("seed", [0, 1])
def test_full_tb_alignment_parity(mode, seed):
    sc = LinearScoring(2, -1, -1)
    rng = np.random.default_rng(seed)
    q = random_dna(rng, 80)
    s = mutate(rng, q)
    exp_score, exp_q, exp_s, exp_start = oracle.align(q, s, mode, sc)
    got = anyseq_tpu.align_full_tb(q, s, mode, sc)
    assert got.score == exp_score
    assert got.query_aligned == bytes(exp_q)
    assert got.subject_aligned == bytes(exp_s)
    assert got.start == tuple(exp_start)


def test_self_alignment_full_tb():
    s = b"ACGTTGCAACGT" * 4
    a = anyseq_tpu.align_full_tb(s, s, Mode.GLOBAL)
    assert a.score == 2 * len(s)
    dq, ds = a.compact()
    assert dq == ds == s.decode()


def test_rectangular_extremes():
    sc = LinearScoring(2, -1, -1)
    for q, s in [(b"A", b"ACGTACGTAAAA"), (b"ACGTACGTAAAA", b"A"), (b"A", b"A")]:
        for mode in MODES:
            assert anyseq_tpu.align_score(q, s, mode, sc) == oracle.align_score(
                q, s, mode, sc
            ), (mode, q, s)
