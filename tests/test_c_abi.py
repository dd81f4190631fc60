"""Reference C ABI parity: the native entry points (import.h:14-41
signatures, hard-coded 2/-1/-1 scoring) must agree with the oracle for
scores, and construct_* must emit oracle-identical sparse alignments."""
import ctypes

import numpy as np
import pytest

from anyseq_tpu.core.types import LinearScoring, Mode
from anyseq_tpu.io import _native
from anyseq_tpu.ref import oracle

from conftest import mutate, random_dna

SC = LinearScoring(2, -1, -1)
MODES = {
    "global": Mode.GLOBAL,
    "semiglobal": Mode.SEMIGLOBAL,
    "local": Mode.LOCAL,
}


@pytest.fixture(scope="module")
def lib():
    lib = _native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    for name in MODES:
        fn = getattr(lib, f"{name}_alignment_score")
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int,
                       ctypes.c_char_p, ctypes.c_int]
        for suffix in ("", "_fulltb"):
            cf = getattr(lib, f"construct_{name}_alignment{suffix}")
            cf.restype = ctypes.c_int64
            cf.argtypes = [ctypes.c_char_p, ctypes.c_int,
                           ctypes.c_char_p, ctypes.c_int,
                           ctypes.c_char_p, ctypes.c_char_p]
    return lib


@pytest.mark.parametrize("name", list(MODES))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_c_abi_score(lib, name, seed):
    rng = np.random.default_rng(seed)
    q = random_dna(rng, 120)
    s = mutate(rng, q)
    got = getattr(lib, f"{name}_alignment_score")(q, len(q), s, len(s))
    assert got == oracle.align_score(q, s, MODES[name], SC)


@pytest.mark.parametrize("name", list(MODES))
def test_c_abi_construct(lib, name):
    rng = np.random.default_rng(7)
    q = random_dna(rng, 100)
    s = mutate(rng, q, indel_rate=0.1)
    alq = ctypes.create_string_buffer(len(q) + len(s))
    als = ctypes.create_string_buffer(len(q) + len(s))
    got = getattr(lib, f"construct_{name}_alignment")(
        q, len(q), s, len(s), alq, als
    )
    exp_score, exp_q, exp_s, _ = oracle.align(q, s, MODES[name], SC)
    assert got == exp_score
    assert alq.raw == bytes(exp_q)
    assert als.raw == bytes(exp_s)
