"""Device mesh construction and distributed initialization.

The reference is strictly single-process/single-device (SURVEY.md §2:
parallelism inventory); multi-chip scaling is a new first-class capability
of this framework: data-parallel pair batches over a "dp" axis and
subject-sharded single-pair wavefronts over an "sp" axis, with boundary
columns exchanged over ICI (the distributed analog of the reference's
corner/row/column boundary vectors, scoring.impala:218-259).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (DCN). No-op for single-process runs."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(sp: int | None = None, dp: int | None = None) -> Mesh:
    """1-D or 2-D mesh. sp = subject/sequence-parallel axis size, dp =
    data-parallel (pairs) axis size. Defaults to all devices on one axis."""
    devices = np.array(jax.devices())
    n = len(devices)
    if sp is None and dp is None:
        sp, dp = n, 1
    elif sp is None:
        sp = n // dp
    elif dp is None:
        dp = n // sp
    if sp * dp != n:
        raise ValueError(f"sp*dp={sp*dp} != device count {n}")
    return Mesh(devices.reshape(dp, sp), ("dp", "sp"))


def lex_best_merge(best, axis: str, K: int):
    """Merge per-chip LOCAL-mode (score, i, j) bests across mesh axis
    ``axis`` with the reference's strict-> argmax tie-breaking: highest
    score, then smallest i, then smallest j (utils.impala:38-48). Must be
    called inside a shard_map over ``axis``; ``best`` is (3,) int32."""
    import jax.numpy as jnp

    bests = jax.lax.all_gather(best, axis)  # (K, 3)

    def merge(a, b):
        better = jnp.logical_or(
            b[0] > a[0],
            jnp.logical_and(
                b[0] == a[0],
                jnp.logical_or(
                    b[1] < a[1],
                    jnp.logical_and(b[1] == a[1], b[2] < a[2]),
                ),
            ),
        )
        return jnp.where(better, b, a)

    return jax.lax.fori_loop(
        1, K, lambda i, acc: merge(acc, bests[i]), bests[0]
    )


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pairs) dimension across the dp axis."""
    return NamedSharding(mesh, P("dp"))


def subject_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a subject-axis vector across the sp axis."""
    return NamedSharding(mesh, P(None, "sp"))
