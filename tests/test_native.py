"""Native C library tests: build, parity with the Python walkers/readers."""
import numpy as np
import pytest

from anyseq_tpu.core.types import EMPTY_SYM, LinearScoring, Mode, AffineScoring
from anyseq_tpu.io import _native
from anyseq_tpu.ref import oracle, oracle_affine

from conftest import random_dna, mutate

SC = LinearScoring(2, -1, -1)


@pytest.fixture(scope="module")
def lib():
    lib = _native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_native_fasta_reader(lib, tmp_path):
    p = tmp_path / "x.fna"
    p.write_bytes(b">r1 hdr\nACGT\nACG\n>r2\nTTTT\n")
    assert _native.read_first_sequence_native(str(p)) == b"ACGTACG"


def test_native_fastq_reader(lib, tmp_path):
    p = tmp_path / "x.fastq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n")
    assert _native.read_first_sequence_native(str(p)) == b"ACGT"


def test_native_reader_errors(lib, tmp_path):
    assert _native.read_first_sequence_native(str(tmp_path / "no.fna")) is None
    bad = tmp_path / "bad.fna"
    bad.write_bytes(b"not a fasta\n")
    assert _native.read_first_sequence_native(str(bad)) is None


@pytest.mark.parametrize("mode", [Mode.GLOBAL, Mode.SEMIGLOBAL, Mode.LOCAL])
def test_native_traceback_parity(lib, mode):
    rng = np.random.default_rng(51)
    q = np.frombuffer(random_dna(rng, 90), np.uint8)
    s = np.frombuffer(mutate(rng, bytes(q)), np.uint8)
    H, P = oracle.dp_full(q, s, mode, SC)
    _, end = oracle.extract_score(H, mode, SC)
    if end[0] < 0 or end[1] < 0:
        pytest.skip("boundary end")
    exp_q, exp_s, exp_start = oracle.traceback(q, s, P, end)
    out_q = np.full(len(q) + len(s), EMPTY_SYM, np.uint8)
    out_s = np.full(len(q) + len(s), EMPTY_SYM, np.uint8)
    start = _native.traceback_linear_native(P, q, s, end, out_q, out_s, 0)
    assert start == tuple(exp_start)
    np.testing.assert_array_equal(out_q, exp_q)
    np.testing.assert_array_equal(out_s, exp_s)


def test_native_affine_traceback_parity(lib):
    sc = AffineScoring(2, -1, -3, -1)
    rng = np.random.default_rng(52)
    q = np.frombuffer(random_dna(rng, 70), np.uint8)
    s = np.frombuffer(mutate(rng, bytes(q), indel_rate=0.15), np.uint8)
    H, E, F, PH, PE, PF = oracle_affine.dp_full_affine(
        q, s, Mode.GLOBAL, sc
    )
    _, end = oracle_affine.extract_score_affine(H, Mode.GLOBAL)
    exp_q, exp_s, exp_start = oracle_affine.traceback_affine(
        q, s, PH, PE, PF, end
    )
    out_q = np.full(len(q) + len(s), EMPTY_SYM, np.uint8)
    out_s = np.full(len(q) + len(s), EMPTY_SYM, np.uint8)
    start = _native.traceback_affine_native(
        PH, PE, PF, q, s, end, out_q, out_s, 0
    )
    assert start == tuple(exp_start)
    np.testing.assert_array_equal(out_q, exp_q)
    np.testing.assert_array_equal(out_s, exp_s)
