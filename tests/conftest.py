"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests work without TPU hardware. Must run before jax is imported."""
import os

# Force CPU: the global environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which is slow, serialized, and flaky for tests -- AND
# /root/.axon_site/sitecustomize.py imports jax at interpreter startup, so
# env vars set here are too late; use the config API (works pre-backend
# init). XLA_FLAGS is still read lazily at backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_seq(rng, length):
    return rng.integers(0, 4, size=length, dtype=np.uint8) + np.uint8(ord("A"))


def random_dna(rng, length) -> bytes:
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    return bytes(alphabet[rng.integers(0, 4, size=length)])


def mutate(rng, seq: bytes, sub_rate=0.1, indel_rate=0.05) -> bytes:
    """Generate a realistically-related sequence for alignment tests."""
    alphabet = b"ACGT"
    out = bytearray()
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append(alphabet[rng.integers(0, 4)])  # insertion
        if rng.random() < sub_rate:
            out.append(alphabet[rng.integers(0, 4)])
        else:
            out.append(c)
    if not out:
        out.append(alphabet[0])
    return bytes(out)
