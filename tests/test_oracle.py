"""Oracle self-consistency tests: invariants that must hold for any correct
implementation of the reference semantics (SURVEY.md §4 oracles a-c)."""
import numpy as np
import pytest

from anyseq_tpu.core.types import LinearScoring, Mode
from anyseq_tpu.ref import oracle

from conftest import random_dna, mutate

SC = LinearScoring(2, -1, -1)
MODES = [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL]


def test_self_alignment_global():
    s = b"ACGTACGTACGGTT"
    score, out_q, out_s, start = oracle.align(s, s, Mode.GLOBAL, SC)
    assert score == 2 * len(s)
    q, a = _dense(out_q, out_s)
    assert q == a == s.decode()
    assert start == (0, 0)


def _dense(out_q, out_s):
    q, s = [], []
    for cq, cs in zip(out_q, out_s):
        if cq == ord(" ") and cs == ord(" "):
            continue
        q.append(chr(cq))
        s.append(chr(cs))
    return "".join(q), "".join(s)


@pytest.mark.parametrize("mode", MODES)
def test_known_small_case(mode):
    # Hand-checkable: q=ACGT s=AGT -> global: one query gap
    score, out_q, out_s, _ = oracle.align(b"ACGT", b"AGT", mode, SC)
    if mode is Mode.GLOBAL:
        assert score == 2 * 3 - 1  # 3 matches, 1 gap
        q, s = _dense(out_q, out_s)
        assert q == "ACGT"
        assert s == "A_GT"
    else:
        assert score == 5


def test_local_ignores_flanks():
    score, *_ = oracle.align(b"TTTTACGTACGTTTTT", b"GGGGACGTACGGGGG", Mode.LOCAL, SC)
    # common core ACGTACG -> 7 matches
    assert score == 14


def test_semiglobal_overlap():
    # suffix of q overlaps prefix of s
    score, *_ = oracle.align(b"AAAACGT", b"ACGTCCC", Mode.SEMIGLOBAL, SC)
    assert score == 8  # ACGT overlap


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_traceback_score_consistency(mode, seed):
    """Re-scoring the constructed alignment must reproduce the DP score
    (for global always; for semiglobal/local over the aligned region)."""
    rng = np.random.default_rng(seed)
    q = random_dna(rng, 60)
    s = mutate(rng, q)
    score, out_q, out_s, start = oracle.align(q, s, mode, SC)
    dq, ds = _dense(out_q, out_s)
    assert len(dq) == len(ds)
    resum = 0
    for cq, cs in zip(dq, ds):
        if cq == "_" or cs == "_":
            resum += SC.gap
        elif cq == cs:
            resum += SC.match
        else:
            resum += SC.mismatch
    if mode is Mode.GLOBAL:
        assert resum == score
    else:
        # aligned segment re-score equals the score (boundary-free segment)
        assert resum == score


def test_local_traceback_is_all_positive_prefix():
    rng = np.random.default_rng(3)
    q = random_dna(rng, 50)
    s = mutate(rng, q)
    score, out_q, out_s, start = oracle.align(q, s, Mode.LOCAL, SC)
    assert score >= 0
    si, sj = start
    assert si >= 0 and sj >= 0


@pytest.mark.parametrize("mode", MODES)
def test_score_matches_bruteforce_tiny(mode):
    """Cross-check against an independent brute-force recursion with
    memoization on tiny inputs."""
    import functools

    q = b"GATTAC"
    s = b"GCATGC"

    @functools.lru_cache(maxsize=None)
    def H(i, j):
        if i < 0 and j < 0:
            return 0
        if i < 0:
            return (j + 1) * SC.gap if mode is Mode.GLOBAL else 0
        if j < 0:
            return (i + 1) * SC.gap if mode is Mode.GLOBAL else 0
        sub = SC.match if q[i] == s[j] else SC.mismatch
        v = max(H(i - 1, j - 1) + sub, H(i, j - 1) + SC.gap, H(i - 1, j) + SC.gap)
        if mode is Mode.LOCAL:
            v = max(v, 0)
        return v

    m, n = len(q), len(s)
    Hm, _ = oracle.dp_full(q, s, mode, SC)
    for i in range(m):
        for j in range(n):
            assert Hm[i + 1, j + 1] == H(i, j)

    score, _ = oracle.extract_score(Hm, mode, SC)
    if mode is Mode.GLOBAL:
        assert score == H(m - 1, n - 1)
    elif mode is Mode.SEMIGLOBAL:
        cands = [H(m - 1, j) for j in range(n)] + [H(i, n - 1) for i in range(m)] + [0]
        assert score == max(cands)
    else:
        assert score == max(
            max(H(i, j) for i in range(m) for j in range(n)), 0
        )


def test_debug_dump_matrix():
    """utils/debug.py introspection (reference utils.impala:51-152 analog):
    renders without error and shows the DP values for tiny inputs."""
    from anyseq_tpu.core.types import AffineScoring, LinearScoring
    from anyseq_tpu.utils.debug import format_dp_state

    out = format_dp_state(b"GAT", b"GT", "global", LinearScoring(2, -1, -1))
    assert "H:" in out and "preds" in out and "\\" in out
    out = format_dp_state(b"GAT", b"GT", "local", AffineScoring(2, -1, -3, -1))
    assert "E (gap in query" in out and "-inf" in out
