"""In-kernel collective halo exchange (dist/collective.py) parity tests.

Runs the persistent collective stripe kernel under the CPU TPU
interpreter (pltpu.InterpretParams simulates per-device memory, RDMA
delivery, and DMA/barrier semaphores) on a virtual device mesh and
checks scores against the O(m*n) oracle. This is the TPU-native analog
of the reference's boundary column vectors (scoring.impala:218-259)
exchanged between chips over ICI instead of between blocks in memory.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from anyseq_tpu.core.types import LinearScoring, Mode
from anyseq_tpu.dist.collective import score_pair_collective
from anyseq_tpu.engine.xla_linmem import extract_score_from_outputs
from anyseq_tpu.ref.oracle import align_score

LIN = LinearScoring(2, -1, -1)


def _mesh(k):
    return Mesh(np.array(jax.devices()[:k]), ("sp",))


def _seqs(rng, m, n):
    q = rng.integers(0, 4, m, dtype=np.uint8) + np.uint8(ord("A"))
    s = rng.integers(0, 4, n, dtype=np.uint8) + np.uint8(ord("A"))
    return q, s


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.LOCAL])
def test_collective_2dev_oracle(rng, mode):
    # m=300 spans 3 boundary-column chunks (128-row RDMA granularity);
    # LOCAL additionally covers the post-kernel all_gather best-merge
    # (regression: eager shard_map deadlocked the interpreter there).
    q, s = _seqs(rng, 300, 700)
    outs = score_pair_collective(q, s, mode, LIN, _mesh(2),
                                 interpret="tpu")
    got, _ = extract_score_from_outputs(outs, 300, 700, mode, LIN)
    assert got == align_score(q, s, mode, LIN)


def test_collective_4dev_semiglobal(rng):
    # 4-hop chain: chip k's left column arrives from chip k-1 in 128-row
    # chunks; semiglobal exercises the psum'd E-column extraction.
    q, s = _seqs(rng, 200, 1100)
    outs = score_pair_collective(q, s, Mode.SEMIGLOBAL, LIN, _mesh(4),
                                 interpret="tpu")
    got, _ = extract_score_from_outputs(outs, 200, 1100,
                                        Mode.SEMIGLOBAL, LIN)
    assert got == align_score(q, s, Mode.SEMIGLOBAL, LIN)


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL,
                                  Mode.LOCAL])
def test_collective_chained_bands(rng, mode):
    """m above the band height: the stripe chains collective kernel
    launches (band corners ride a scalar ppermute between launches);
    bit-identical to the oracle for all three schemes."""
    q, s = _seqs(rng, 300, 700)
    outs = score_pair_collective(q, s, mode, LIN, _mesh(2),
                                 interpret="tpu", band_rows=128)
    got, _ = extract_score_from_outputs(outs, 300, 700, mode, LIN)
    assert got == align_score(q, s, mode, LIN)


def test_collective_is_default_engine_routing():
    """score_pair_sharded routes engine='collective-interpret' through
    the collective kernel; a multi-axis mesh is flattened into one sp
    ring for the single pair (r4 item 9: route, don't raise)."""
    import jax
    from jax.sharding import Mesh as _Mesh

    from anyseq_tpu.dist.sharded import score_pair_sharded

    rng = np.random.default_rng(5)
    q, s = _seqs(rng, 130, 600)
    outs = score_pair_sharded(q, s, Mode.GLOBAL, LIN, _mesh(2),
                              engine="collective-interpret")
    got, _ = extract_score_from_outputs(outs, 130, 600, Mode.GLOBAL, LIN)
    assert got == align_score(q, s, Mode.GLOBAL, LIN)

    mesh2d = _Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                   ("dp", "sp"))
    outs2 = score_pair_sharded(q, s, Mode.GLOBAL, LIN, mesh2d,
                               engine="collective-interpret")
    got2, _ = extract_score_from_outputs(outs2, 130, 600, Mode.GLOBAL,
                                         LIN)
    assert got2 == got


def test_collective_matches_superstep_path(rng):
    """Bit-identical outputs contract vs dist.sharded (same last_row)."""
    from anyseq_tpu.dist.sharded import score_pair_sharded

    q, s = _seqs(rng, 150, 600)
    outs_c = score_pair_collective(q, s, Mode.GLOBAL, LIN, _mesh(2),
                                   interpret="tpu")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("dp", "sp"))
    outs_s = score_pair_sharded(bytes(q), bytes(s), Mode.GLOBAL, LIN,
                                mesh, H=64)
    n = 600
    assert np.array_equal(np.asarray(outs_c["last_row"])[:n],
                          np.asarray(outs_s["last_row"])[:n])


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.LOCAL])
def test_collective_2d_mesh_batch(rng, mode):
    """score_pairs_collective on a 2-D (dp x sp) mesh: pairs distribute
    over dp, each subject shards over sp with in-kernel RDMA (the halo
    device_id carries full mesh coordinates, so each dp row forms its
    own sp ring). Bit-identical to the oracle (VERDICT r3 missing #4)."""
    from anyseq_tpu.dist.collective import score_pairs_collective
    from anyseq_tpu.ref.oracle import align_score as oracle_score

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    qs = [bytes(_seqs(rng, int(rng.integers(100, 300)), 1)[0])
          for _ in range(3)]
    ss = [bytes(_seqs(rng, 1, int(rng.integers(300, 700)))[1])
          for _ in range(3)]
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))
    res = score_pairs_collective(qs, ss, mode, LIN, mesh,
                                 interpret="tpu")
    for b in range(3):
        assert res[b][0] == oracle_score(qs[b], ss[b], mode, LIN), (
            mode, b)


def test_collective_2d_mesh_batch_chained(rng):
    """2-D (dp x sp) batch with CHAINED band kernels per pair (heights
    above band_rows; r4 item 9: the 2-D engine was single-band)."""
    from anyseq_tpu.dist.collective import score_pairs_collective
    from anyseq_tpu.ref.oracle import align_score as oracle_score

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    qs = [bytes(_seqs(rng, 300, 1)[0]), bytes(_seqs(rng, 450, 1)[0])]
    ss = [bytes(_seqs(rng, 1, 500)[1]), bytes(_seqs(rng, 1, 650)[1])]
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))
    res = score_pairs_collective(qs, ss, Mode.GLOBAL, LIN, mesh,
                                 interpret="tpu", band_rows=128)
    for b in range(2):
        assert res[b][0] == oracle_score(qs[b], ss[b], Mode.GLOBAL,
                                         LIN), b
