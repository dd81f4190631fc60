"""Affine (Gotoh) collective halo-exchange parity tests.

Split from test_collective.py: the TPU-interpreter affine kernels are
the largest XLA:CPU graphs in the suite, and one process accumulating
both the linear and affine interpreter compiles aborts inside the
XLA:CPU compiler (same class of upstream fragility run_tests.py
isolates per file)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from anyseq_tpu.core.types import LinearScoring, Mode
from anyseq_tpu.dist.collective import score_pair_collective
from anyseq_tpu.engine.xla_linmem import extract_score_from_outputs

from test_collective import _mesh, _seqs

import os

# Every distinct (mode x K) TPU-interpreter affine compile costs ~85 s
# of lowering regardless of shape; the default suite runs the GLOBAL
# cases (which own all the new E-halo machinery) and gates the
# SEMIGLOBAL/LOCAL variants behind ANYSEQ_SLOW_TESTS=1 (their
# collective-specific closed forms are shared with the linear engine,
# which tests all three modes).
_SLOW = pytest.mark.skipif(
    not os.environ.get("ANYSEQ_SLOW_TESTS"),
    reason="~85s lowering per mode; set ANYSEQ_SLOW_TESTS=1",
)


@pytest.mark.parametrize("mode", [
    Mode.GLOBAL,
    pytest.param(Mode.SEMIGLOBAL, marks=_SLOW),
    pytest.param(Mode.LOCAL, marks=_SLOW),
])
def test_collective_affine_2dev(rng, mode):
    """Affine (Gotoh) on the collective engine (VERDICT r3 item 6): the
    E-column halo rides a second in-kernel RDMA channel; bit-identical
    to the affine oracle for all three schemes."""
    from anyseq_tpu.core.types import AffineScoring
    from anyseq_tpu.ref.oracle_affine import align_score_affine

    AFF = AffineScoring(2, -1, -3, -1)
    q, s = _seqs(rng, 300, 700)
    outs = score_pair_collective(q, s, mode, AFF, _mesh(2),
                                 interpret="tpu")
    got, _ = extract_score_from_outputs(outs, 300, 700, mode, AFF)
    assert got == align_score_affine(q, s, mode, AFF)


def test_collective_affine_4dev_sharded_default(rng):
    """4-hop affine chain THROUGH score_pair_sharded's default routing
    (supports() now admits affine on 1-D meshes), checking the score
    and the Myers-Miller E-column output against the XLA engine."""
    from anyseq_tpu.core.types import AffineScoring
    from anyseq_tpu.dist.sharded import score_pair_sharded
    from anyseq_tpu.engine import api, xla_affine

    AFF = AffineScoring(2, -1, -2, -1)
    q, s = _seqs(rng, 140, 1100)
    m, n = 140, 1100
    outs = score_pair_sharded(q, s, Mode.GLOBAL, AFF, _mesh(4),
                              engine="collective-interpret")
    _, _, _, _, qp, sp = api._prep(bytes(q), bytes(s))
    ref = xla_affine.score_rows_affine(qp, sp, m, n, Mode.GLOBAL, AFF,
                                       emit_col_e=True)
    np.testing.assert_array_equal(np.asarray(outs["last_col"])[:m],
                                  np.asarray(ref["last_col"])[:m])
    np.testing.assert_array_equal(np.asarray(outs["last_col_e"])[:m],
                                  np.asarray(ref["last_col_e"])[:m])
    np.testing.assert_array_equal(np.asarray(outs["last_row"])[:n],
                                  np.asarray(ref["last_row"])[:n])


def test_collective_affine_start_gap(rng):
    """Myers-Miller continuing-run init (start_gap) on the collective
    engine: matches the XLA engine's start_gap sweep."""
    from anyseq_tpu.core.types import AffineScoring
    from anyseq_tpu.engine import api, xla_affine

    AFF = AffineScoring(2, -1, -3, -1)
    q, s = _seqs(rng, 150, 600)
    m, n = 150, 600
    outs = score_pair_collective(q, s, Mode.GLOBAL, AFF, _mesh(2),
                                 interpret="tpu", start_gap=True)
    _, _, _, _, qp, sp = api._prep(bytes(q), bytes(s))
    ref = xla_affine.score_rows_affine(qp, sp, m, n, Mode.GLOBAL, AFF,
                                       start_gap=True, emit_col_e=True)
    np.testing.assert_array_equal(np.asarray(outs["last_row"])[:n],
                                  np.asarray(ref["last_row"])[:n])
    np.testing.assert_array_equal(np.asarray(outs["last_col"])[:m],
                                  np.asarray(ref["last_col"])[:m])


def test_collective_affine_2d_mesh_batch(rng):
    """Affine (Gotoh) pairs on the 2-D (dp x sp) collective batch
    engine (r4 item 9: the 2-D engine was linear-only)."""
    from anyseq_tpu.core.types import AffineScoring
    from anyseq_tpu.dist.collective import score_pairs_collective
    from anyseq_tpu.ref.oracle_affine import align_score_affine

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    AFF = AffineScoring(2, -1, -3, -1)
    qs = [bytes(_seqs(rng, 220, 1)[0]), bytes(_seqs(rng, 150, 1)[0])]
    ss = [bytes(_seqs(rng, 1, 500)[1]), bytes(_seqs(rng, 1, 400)[1])]
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))
    res = score_pairs_collective(qs, ss, Mode.GLOBAL, AFF, mesh,
                                 interpret="tpu")
    for b in range(2):
        assert res[b][0] == align_score_affine(qs[b], ss[b],
                                               Mode.GLOBAL, AFF), b
