"""Affine (Gotoh) scoring tests: brute-force cross-check, engine/oracle
parity, degeneracy to linear scoring, traceback validity."""
import functools

import numpy as np
import pytest

import anyseq_tpu
from anyseq_tpu.core.types import AffineScoring, LinearScoring, Mode
from anyseq_tpu.engine import api, xla_affine, xla_linmem
from anyseq_tpu.ref import oracle, oracle_affine

from conftest import random_dna, mutate

SC = AffineScoring(match=2, mismatch=-1, gap_open=-3, gap_extend=-1)
MODES = [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL]


@pytest.mark.parametrize("mode", MODES)
def test_oracle_affine_vs_bruteforce(mode):
    q = b"GATTAC"
    s = b"GCATGCT"
    go, ge = SC.gap_open, SC.gap_extend

    @functools.lru_cache(maxsize=None)
    def rec(i, j, state):
        # state: 0=H, 1=E (gap in query), 2=F (gap in subject)
        if state == 0:
            if i < 0 and j < 0:
                return 0
            cands = []
            if mode is Mode.GLOBAL:
                if i < 0 or j < 0:
                    return max(rec(i, j, 1), rec(i, j, 2))
            else:
                if i < 0 or j < 0:
                    return 0
            sub = SC.match if q[i] == s[j] else SC.mismatch
            cands.append(rec(i - 1, j - 1, 0) + sub)
            cands.append(rec(i, j, 1))
            cands.append(rec(i, j, 2))
            v = max(cands)
            if mode is Mode.LOCAL:
                v = max(v, 0)
            return v
        if state == 1:  # E: ends with gap in query at column j
            if j < 0:
                return -(10**9)
            return max(rec(i, j - 1, 0) + go + ge, rec(i, j - 1, 1) + ge)
        if i < 0:
            return -(10**9)
        return max(rec(i - 1, j, 0) + go + ge, rec(i - 1, j, 2) + ge)

    H, *_ = oracle_affine.dp_full_affine(q, s, mode, SC)
    for i in range(len(q)):
        for j in range(len(s)):
            assert H[i + 1, j + 1] == rec(i, j, 0), (i, j, mode)


@pytest.mark.parametrize("mode", MODES)
def test_affine_degenerates_to_linear(mode):
    """go=0 affine == linear with gap=ge, for scores."""
    rng = np.random.default_rng(41)
    q = random_dna(rng, 70)
    s = mutate(rng, q)
    aff = AffineScoring(2, -1, 0, -1)
    lin = LinearScoring(2, -1, -1)
    assert oracle_affine.align_score_affine(q, s, mode, aff) == \
        oracle.align_score(q, s, mode, lin)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("seed", [0, 1])
def test_engine_affine_parity(mode, seed):
    rng = np.random.default_rng(seed)
    q = random_dna(rng, 60)
    s = mutate(rng, q)
    m, n = len(q), len(s)
    H, E, F, PH, PE, PF = oracle_affine.dp_full_affine(q, s, mode, SC)
    _, _, _, _, qp, sp = api._prep(q, s)
    outs = xla_affine.score_rows_affine(qp, sp, m, n, mode, SC)
    np.testing.assert_array_equal(np.asarray(outs["last_row"])[:n], H[m, 1:])
    np.testing.assert_array_equal(np.asarray(outs["last_col"])[:m], H[1:, n])
    score, _ = xla_linmem.extract_score_from_outputs(outs, m, n, mode, SC)
    exp, _ = oracle_affine.extract_score_affine(H, mode)
    assert score == exp

    # packed preds parity
    outs2 = xla_affine.score_rows_affine_with_preds(qp, sp, m, n, mode, SC)
    PH2, PE2, PF2 = api._haloed_affine_preds(
        np.asarray(outs2["preds"]), m, n, mode
    )
    np.testing.assert_array_equal(PH2[1:, 1:], PH[1:, 1:])
    np.testing.assert_array_equal(PE2[1:, 1:], PE[1:, 1:])
    np.testing.assert_array_equal(PF2[1:, 1:], PF[1:, 1:])


def _rescore_affine(aln, sc=SC):
    dq, ds = aln.compact()
    total = 0
    in_gap = False
    for cq, cs in zip(dq, ds):
        if cq == "_" or cs == "_":
            total += sc.gap_extend + (0 if in_gap else sc.gap_open)
            in_gap = True
        else:
            in_gap = False
            total += sc.match if cq == cs else sc.mismatch
    return total


@pytest.mark.parametrize("mode", MODES)
def test_affine_full_tb_alignment(mode):
    rng = np.random.default_rng(43)
    q = random_dna(rng, 80)
    s = mutate(rng, q, indel_rate=0.15)
    aln = anyseq_tpu.align(q, s, mode, SC)
    exp = oracle_affine.align_score_affine(q, s, mode, SC)
    assert aln.score == exp
    # NB: consecutive E-gaps and F-gaps may abut; re-scoring treats a
    # direction switch inside a run as one run -- use oracle alignment
    # comparison instead for exactness.
    exp_score, exp_q, exp_s, exp_start = oracle_affine.align_affine(
        q, s, mode, SC
    )
    assert aln.query_aligned == bytes(exp_q)
    assert aln.subject_aligned == bytes(exp_s)


def test_affine_gap_run_preference():
    """One long gap must beat two short ones when go is steep."""
    sc = AffineScoring(2, -4, -10, -1)
    q = b"AAAATTTTGGGG"
    s = b"AAAAGGGG"
    aln = anyseq_tpu.align(q, s, "global", sc)
    dq, ds = aln.compact()
    # the four T's should be one contiguous gap run in the subject
    assert "____" in ds
    assert ds.count("_") == 4


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize(
    "sc", [SC, AffineScoring(2, -3, -5, -1), AffineScoring(1, -1, -2, -2)]
)
def test_myers_miller_vs_oracle(mode, sc):
    """Linear-memory affine construction (Myers-Miller divide with
    crossing-gap state flags) must reproduce the oracle score exactly and
    re-score to it (VERDICT r1 item 5)."""
    from anyseq_tpu.engine.hirschberg import align_hirschberg

    rng = np.random.default_rng(17)
    q = random_dna(rng, 140)
    s = mutate(rng, random_dna(rng, 230))
    exp = oracle_affine.align_score_affine(q, s, mode, sc)
    aln = align_hirschberg(q, s, mode, sc, min_width=16)
    assert aln.score == exp
    assert _rescore_affine(aln, sc) == exp
    dq, ds = aln.compact()
    assert dq.replace("_", "").encode() in q
    assert ds.replace("_", "").encode() in s


def test_myers_miller_gap_crossing_cuts():
    """Gap-heavy scoring forces horizontal runs across subject cuts --
    the exact case the E-column merge + state flags exist for."""
    from anyseq_tpu.engine.hirschberg import align_hirschberg

    sc = AffineScoring(1, -6, -4, 0)  # free extension: long runs
    rng = np.random.default_rng(18)
    q = random_dna(rng, 60)
    s = q[:20] + random_dna(rng, 120) + q[20:]  # forces a 120-col gap
    exp = oracle_affine.align_score_affine(q, s, Mode.GLOBAL, sc)
    aln = align_hirschberg(q, s, Mode.GLOBAL, sc, min_width=8)
    assert aln.score == exp
    assert _rescore_affine(aln, sc) == exp


def test_myers_miller_vs_fulltb():
    """Same scores as the full-matrix affine path on identical input."""
    import anyseq_tpu
    from anyseq_tpu.engine.hirschberg import align_hirschberg

    rng = np.random.default_rng(19)
    q = random_dna(rng, 120)
    s = mutate(rng, q)
    for mode in MODES:
        full = anyseq_tpu.align_full_tb(q, s, mode, SC)
        mm = align_hirschberg(q, s, mode, SC, min_width=16)
        assert mm.score == full.score
        assert _rescore_affine(mm) == _rescore_affine(full) == full.score


def test_affine_auto_traceback_routes_hirschberg():
    """align() no longer downgrades large affine problems to full-matrix
    (the r1 silent O(m*n) fallback, VERDICT item 5 'done' criterion)."""
    import anyseq_tpu

    rng = np.random.default_rng(20)
    q = random_dna(rng, 2100)
    s = mutate(rng, q)
    # 2100*2100 > 1<<22 -> auto picks hirschberg; must succeed and match
    # the score-only path.
    aln = anyseq_tpu.align(q, s, "global", SC)
    exp = anyseq_tpu.align_score(q, s, "global", SC)
    assert aln.score == exp
    assert _rescore_affine(aln) == exp
