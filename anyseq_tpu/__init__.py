"""anyseq_tpu -- a TPU-native pairwise sequence alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DasNaCl/anyseq: global (Needleman-Wunsch), semiglobal and local
(Smith-Waterman) alignment with linear and affine gap scoring, in score-only,
full-matrix-traceback and linear-memory (Hirschberg) modes; single-chip
Pallas wavefront kernels, many-pair batched mode, and multi-chip
subject-sharded wavefronts over a JAX device mesh.
"""
from anyseq_tpu.core.types import (
    Alignment,
    AffineScoring,
    LinearScoring,
    Mode,
)
from anyseq_tpu.engine.api import align, align_full_tb, align_score

__all__ = [
    "Alignment",
    "AffineScoring",
    "LinearScoring",
    "Mode",
    "align",
    "align_full_tb",
    "align_score",
]

__version__ = "0.1.0"
