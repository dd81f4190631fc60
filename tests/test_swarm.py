"""Swarm kernel (kernels/swarm.py) vs the XLA batch engine: bit-exact
scores, positions, boundary outputs, and predecessors on ragged batches
of small problems (interpret mode; the real-TPU path shares the trace).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from anyseq_tpu.core.types import AffineScoring, LinearScoring, Mode
from anyseq_tpu.engine import batch as beng
from anyseq_tpu.kernels import swarm

SC = LinearScoring(2, -1, -1)
SCW = LinearScoring(3, -2, -2)
SCA = AffineScoring(2, -1, -3, -1)


def _mkbatch(rng, B, maxm, maxn):
    ms = rng.integers(1, maxm + 1, B)
    ns = rng.integers(1, maxn + 1, B)
    M, N = int(ms.max()), int(ns.max())
    q = rng.integers(0, 4, (B, M)).astype(np.int32)
    s = rng.integers(0, 4, (B, N)).astype(np.int32)
    return q, s, ms.astype(np.int64), ns.astype(np.int64)


@pytest.mark.parametrize("mode", ["local", "global", "semiglobal"])
@pytest.mark.parametrize("sc", [SC, SCW], ids=["ref", "wide"])
def test_swarm_scores_linear(rng, mode, sc):
    q, s, ms, ns = _mkbatch(rng, 37, 90, 70)
    res = swarm.score_pairs_swarm(q, s, ms, ns, mode, sc,
                                  interpret=True)
    score, end = swarm.extract_batch(
        {k: jnp.asarray(v) for k, v in res.items()},
        jnp.asarray(ms), jnp.asarray(ns), Mode.parse(mode))
    score = np.asarray(score)
    end = np.asarray(end)
    m = Mode.parse(mode)
    if m is Mode.SEMIGLOBAL:
        want = np.asarray(beng._score_batch_semiglobal(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
            jnp.asarray(ns), m, sc))
        np.testing.assert_array_equal(score, want)
    else:
        want, want_pos = beng._score_batch(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
            jnp.asarray(ns), m, sc)
        np.testing.assert_array_equal(score, np.asarray(want))
        if m is Mode.LOCAL:
            np.testing.assert_array_equal(end, np.asarray(want_pos))


def test_swarm_boundary_outputs(rng):
    # last_rows / last_cols match the preds_batch_full outputs per pair
    q, s, ms, ns = _mkbatch(rng, 11, 60, 50)
    res = swarm.score_pairs_swarm(q, s, ms, ns, "global", SC,
                                  interpret=True)
    _, last_row, last_col, _ = beng.preds_batch_full(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
        jnp.asarray(ns), Mode.GLOBAL, SC)
    last_row = np.asarray(last_row)
    last_col = np.asarray(last_col)
    for b in range(len(ms)):
        n_b, m_b = int(ns[b]), int(ms[b])
        np.testing.assert_array_equal(
            np.asarray(res["last_rows"])[b, :n_b], last_row[b, :n_b])
        np.testing.assert_array_equal(
            np.asarray(res["last_cols"])[b, :m_b], last_col[b, :m_b])


@pytest.mark.parametrize("mode", ["local", "global", "semiglobal"])
def test_swarm_scores_affine(rng, mode):
    q, s, ms, ns = _mkbatch(rng, 23, 70, 60)
    res = swarm.score_pairs_swarm(q, s, ms, ns, mode, SCA,
                                  interpret=True)
    score, _ = swarm.extract_batch(
        {k: jnp.asarray(v) for k, v in res.items()},
        jnp.asarray(ms), jnp.asarray(ns), Mode.parse(mode))
    want = np.asarray(beng._score_batch_affine(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
        jnp.asarray(ns), Mode.parse(mode), SCA))
    np.testing.assert_array_equal(np.asarray(score), want)


def test_swarm_affine_sgap(rng):
    # Myers-Miller continuing-run init flag, per problem
    q, s, ms, ns = _mkbatch(rng, 10, 40, 40)
    sg = rng.integers(0, 2, 10)
    res = swarm.score_pairs_swarm(q, s, ms, ns, "global", SCA,
                                  sgaps=sg, interpret=True)
    cols_h, _ = beng.last_cols_batch_affine(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
        jnp.asarray(ns), SCA, jnp.asarray(sg.astype(bool)))
    cols_h = np.asarray(cols_h).T
    for b in range(10):
        m_b = int(ms[b])
        np.testing.assert_array_equal(
            np.asarray(res["last_cols"])[b, :m_b], cols_h[b, :m_b])


@pytest.mark.parametrize("mode", ["global", "local"])
def test_swarm_preds(rng, mode):
    # packed pred planes match preds_batch_full's dense codes
    q, s, ms, ns = _mkbatch(rng, 9, 40, 48)
    m = Mode.parse(mode)
    res = swarm.score_pairs_swarm_preds(q, s, ms, ns, m, SC,
                                        interpret=True)
    dense = np.asarray(res["preds"])
    want, _, _, _ = beng.preds_batch_full(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
        jnp.asarray(ns), m, SC)
    want = np.asarray(want)
    for b in range(len(ms)):
        m_b, n_b = int(ms[b]), int(ns[b])
        np.testing.assert_array_equal(dense[b, :m_b, :n_b],
                                      want[b, :m_b, :n_b])


@pytest.mark.parametrize("mode", ["local", "global", "semiglobal"])
def test_align_scores_batch_swarm_engine(rng, mode):
    # end-to-end dispatch: swarm engine == XLA engine scores
    from conftest import random_dna

    qs = [random_dna(rng, int(rng.integers(5, 120))) for _ in range(41)]
    ss = [random_dna(rng, int(rng.integers(5, 100))) for _ in range(41)]
    a = beng.align_scores_batch(qs, ss, mode, SC,
                                engine="swarm-interpret")
    b = beng.align_scores_batch(qs, ss, mode, SC, engine="xla")
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode", ["local", "global", "semiglobal"])
def test_align_batch_swarm_engine(rng, mode):
    # fully-fused construction (preds + extract + device walk in one
    # dispatch) == the XLA sweep + native host walk path, byte-for-byte
    from conftest import mutate, random_dna

    qs = [random_dna(rng, int(rng.integers(5, 90))) for _ in range(17)]
    ss = [mutate(rng, q) for q in qs]
    # include an all-mismatch pair (local empty-alignment path)
    qs.append(b"AAAAAA")
    ss.append(b"CCCCCC")
    a = beng.align_batch(qs, ss, mode, SC, engine="swarm-interpret")
    b = beng.align_batch(qs, ss, mode, SC, engine="xla")
    for x, y in zip(a, b):
        assert x.score == y.score
        assert x.start == y.start
        assert x.query_aligned == y.query_aligned
        assert x.subject_aligned == y.subject_aligned


def test_swarm_multi_tile(rng):
    # > 1024 problems exercises the tile grid
    B = 1500
    q, s, ms, ns = _mkbatch(rng, B, 24, 24)
    res = swarm.score_pairs_swarm(q, s, ms, ns, "local", SC,
                                  interpret=True)
    want, _ = beng._score_batch(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms),
        jnp.asarray(ns), Mode.LOCAL, SC)
    np.testing.assert_array_equal(
        np.asarray(res["best"])[:, 0], np.asarray(want))
