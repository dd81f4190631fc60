"""anyseq_tpu -- a TPU-native pairwise sequence alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DasNaCl/anyseq: global (Needleman-Wunsch), semiglobal and local
(Smith-Waterman) alignment with linear and affine gap scoring, in score-only,
full-matrix-traceback and linear-memory (Hirschberg) modes; single-chip
Pallas wavefront kernels, many-pair batched mode, and multi-chip
subject-sharded wavefronts over a JAX device mesh.
"""
import os as _os

# Compiles in this environment can be slow and high-variance; a persistent
# compilation cache amortizes them across processes. Opt out by setting
# ANYSEQ_TPU_NO_COMPILE_CACHE=1 or your own JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("ANYSEQ_TPU_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/anyseq_tpu/jax"),
    )
    # The env var is read at jax config init; environments that
    # pre-import jax (sitecustomize hooks) miss it -- set the live
    # config too, and let CPU executables persist (the default caches
    # only accelerator backends, but the interpret-mode Pallas test
    # kernels are the slowest compiles in this project).
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_enable_xla_caches",
                       "all")

from anyseq_tpu.core.types import (
    Alignment,
    AffineScoring,
    LinearScoring,
    Mode,
)
from anyseq_tpu.engine.api import align, align_full_tb, align_score
from anyseq_tpu.engine.batch import align_batch, align_scores_batch

__all__ = [
    "Alignment",
    "AffineScoring",
    "LinearScoring",
    "Mode",
    "align",
    "align_batch",
    "align_full_tb",
    "align_score",
    "align_scores_batch",
]

__version__ = "0.1.0"
