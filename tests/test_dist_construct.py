"""Distributed Hirschberg construction + dp-sharded batch engines on the
virtual 8-device CPU mesh. VERDICT r1 items 2/6/8: multi-chip users must be
able to construct alignments, and dp batching must be an explicit
shard_map contract (not auto-spmd)."""
import jax
import numpy as np
import pytest

from anyseq_tpu.core.types import LinearScoring, Mode
from anyseq_tpu.dist import batch as dist_batch
from anyseq_tpu.dist import mesh as meshlib
from anyseq_tpu.engine import batch as eng_batch
from anyseq_tpu.engine.hirschberg import align_hirschberg

from conftest import random_dna, mutate

SC = LinearScoring(2, -1, -1)
MODES = [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL]


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh(sp=8, dp=1)


@pytest.fixture(scope="module")
def mesh2x4():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh(dp=2, sp=4)


@pytest.mark.parametrize("mode", MODES)
def test_dist_construction_bitexact(mesh8, mode):
    """Distributed construction must equal single-device construction
    byte for byte (score, buffers, start)."""
    rng = np.random.default_rng(11)
    q = random_dna(rng, 600)
    s = mutate(rng, random_dna(rng, 1700))
    single = align_hirschberg(q, s, mode, SC, min_width=64)
    dist = align_hirschberg(q, s, mode, SC, min_width=64, mesh=mesh8,
                            sp_min_width=256)
    assert dist.score == single.score
    assert dist.query_aligned == single.query_aligned
    assert dist.subject_aligned == single.subject_aligned
    assert dist.start == single.start


def test_dist_construction_2d_mesh(mesh2x4):
    """Construction over a 2-D (dp, sp) mesh: batched phases use all 8
    devices, sp phases the sp sub-axis."""
    rng = np.random.default_rng(12)
    q = random_dna(rng, 500)
    s = mutate(rng, q)
    single = align_hirschberg(q, s, Mode.GLOBAL, SC, min_width=64)
    dist = align_hirschberg(q, s, Mode.GLOBAL, SC, min_width=64,
                            mesh=mesh2x4, sp_min_width=10**9)
    assert dist.score == single.score
    assert dist.query_aligned == single.query_aligned


def test_dp_last_cols_sharded_matches(mesh8):
    rng = np.random.default_rng(13)
    B, M, N = 5, 256, 256  # deliberately not a multiple of 8 (padding)
    q = rng.integers(65, 69, (B, M)).astype(np.int32)
    s = rng.integers(65, 69, (B, N)).astype(np.int32)
    ms = rng.integers(100, M, B).astype(np.int32)
    ns = rng.integers(100, N, B).astype(np.int32)
    import jax.numpy as jnp

    ref = np.asarray(eng_batch.last_cols_batch(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms), jnp.asarray(ns), SC
    ))
    out = np.asarray(dist_batch.last_cols_batch_sharded(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms), jnp.asarray(ns),
        SC, mesh8,
    ))
    # rows beyond ms[b] are sweep garbage (the sharded sweep stops at its
    # local max length); only the valid region is contractual.
    for b in range(B):
        np.testing.assert_array_equal(out[: ms[b], b], ref[: ms[b], b])


def test_dp_preds_sharded_matches(mesh8):
    rng = np.random.default_rng(14)
    B, M, N = 9, 256, 256
    q = rng.integers(65, 69, (B, M)).astype(np.int32)
    s = rng.integers(65, 69, (B, N)).astype(np.int32)
    ms = np.full(B, 200, np.int32)
    ns = np.full(B, 180, np.int32)
    import jax.numpy as jnp

    pr, cr = eng_batch.preds_batch(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms), jnp.asarray(ns), SC
    )
    po, co = dist_batch.preds_batch_sharded(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ms), jnp.asarray(ns),
        SC, mesh8,
    )
    np.testing.assert_array_equal(np.asarray(po), np.asarray(pr))
    np.testing.assert_array_equal(np.asarray(co), np.asarray(cr))


@pytest.mark.parametrize("mode", MODES)
def test_dp_scores_batch_sharded(mesh8, mode):
    rng = np.random.default_rng(15)
    qs = [random_dna(rng, int(rng.integers(50, 300))) for _ in range(11)]
    ss = [mutate(rng, x) for x in qs]
    ref = eng_batch.align_scores_batch(qs, ss, mode, SC)
    out = dist_batch.align_scores_batch_sharded(qs, ss, mode, SC, mesh8)
    np.testing.assert_array_equal(out, ref)
