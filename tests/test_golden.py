"""Reference-parity corpus tests (tests/golden/).

The committed corpus pins the framework to sequences BYTE-IDENTICAL to
the reference CLI's random mode (`align -r min max`, main.cpp:200-211:
default-seeded mt19937_64 under libstdc++) with expected results from two
independent non-JAX oracles (native C + numpy, cross-checked at
generation time -- tests/golden/generate.py). A real reference binary
run on the same shapes consumes the same byte streams, so its scores are
directly comparable (see `python -m anyseq_tpu.cli --parity`).

The full framework (score, Hirschberg construction, fulltb) must
reproduce the committed goldens exactly.
"""
import hashlib
import json
import os
import shutil
import subprocess

import pytest

import anyseq_tpu
from anyseq_tpu.core.types import LinearScoring, Mode

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "golden")
SC = LinearScoring(2, -1, -1)

with open(os.path.join(GOLDEN_DIR, "golden.json")) as f:
    GOLDEN = json.load(f)


def _read_pairs(path):
    seqs, cur = [], []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return [(seqs[i].encode(), seqs[i + 1].encode())
            for i in range(0, len(seqs) - 1, 2)]


def _classes():
    return [pytest.param(c, id=c["fasta"]) for c in GOLDEN["classes"]]


def test_fasta_integrity():
    """Committed FASTA files match their recorded hashes."""
    for cls in GOLDEN["classes"]:
        with open(os.path.join(GOLDEN_DIR, cls["fasta"])) as f:
            text = f.read()
        assert hashlib.sha256(text.encode()).hexdigest() == \
            cls["fasta_sha256"], cls["fasta"]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_refgen_determinism(tmp_path):
    """tools/refgen.cpp regenerates the committed streams byte-for-byte
    (guards both refgen and the local libstdc++ against drift)."""
    exe = tmp_path / "refgen"
    subprocess.run(
        ["g++", "-O2", "-o", str(exe),
         os.path.join(os.path.dirname(HERE), "tools", "refgen.cpp")],
        check=True)
    cls = GOLDEN["classes"][0]
    out = subprocess.run(
        [str(exe), str(cls["minlen"]), str(cls["maxlen"]),
         str(cls["npairs"])],
        check=True, capture_output=True, text=True).stdout
    assert hashlib.sha256(out.encode()).hexdigest() == cls["fasta_sha256"]


@pytest.mark.parametrize("cls", _classes())
def test_golden_scores(cls):
    """align_score reproduces the two-oracle-agreed scores on every
    pair and mode."""
    pairs = _read_pairs(os.path.join(GOLDEN_DIR, cls["fasta"]))
    for rec in cls["pairs"]:
        q, s = pairs[rec["k"]]
        assert (len(q), len(s)) == (rec["m"], rec["n"])
        for name, want in rec["scores"].items():
            got = anyseq_tpu.align_score(q, s, name, SC)
            assert got == want, (cls["fasta"], rec["k"], name)


@pytest.mark.parametrize("cls", _classes())
def test_golden_fulltb_alignments(cls):
    """Full-matrix traceback reproduces the golden alignment STRINGS
    byte-for-byte (both oracles agree on these; the framework follows
    the same diag > gap_q > gap_s tie-breaking, align.impala:49-64)."""
    pairs = _read_pairs(os.path.join(GOLDEN_DIR, cls["fasta"]))
    for rec in cls["pairs"]:
        if not rec["alignments"]:
            continue
        q, s = pairs[rec["k"]]
        for name, want in rec["alignments"].items():
            aln = anyseq_tpu.align_full_tb(q, s, name, SC)
            cq, cs = aln.compact()
            assert (cq, cs) == (want["q"], want["s"]), (
                cls["fasta"], rec["k"], name)


@pytest.mark.parametrize("cls", _classes())
def test_golden_hirschberg_scores(cls):
    """The default construction path (linear-memory Hirschberg) yields
    the golden score and a self-consistent alignment on every pair.
    (Byte-equality of the strings is not required -- equal-score
    alignments may differ in tie-breaking between fulltb and hb, as in
    the reference.)"""
    from anyseq_tpu.engine.hirschberg import align_hirschberg

    pairs = _read_pairs(os.path.join(GOLDEN_DIR, cls["fasta"]))
    for rec in cls["pairs"][:1]:  # pair 0 per class: keep runtime modest
        q, s = pairs[rec["k"]]
        for name, want in rec["scores"].items():
            aln = align_hirschberg(q, s, name, SC)
            assert aln.score == want, (cls["fasta"], name)


def test_golden_self_alignment():
    """rattus x rattus analog: self-alignment is all matches."""
    for cls in GOLDEN["classes"]:
        rec = cls["pairs"][0]
        if "self_global_score" not in rec:
            continue
        q, _ = _read_pairs(os.path.join(GOLDEN_DIR, cls["fasta"]))[0]
        assert rec["self_global_score"] == 2 * len(q)
        assert anyseq_tpu.align_score(q, q, "global", SC) == 2 * len(q)


def test_parity_recorded_output(tmp_path, capsys):
    """--parity harness over a recorded-output directory: a faithful
    timing-only transcript passes, a wrong-length or wrong-score one
    fails."""
    from anyseq_tpu import cli

    cls = GOLDEN["classes"][0]
    rec = cls["pairs"][0]
    lines = [f"random strings with length from [{cls['minlen']},{cls['maxlen']}]",
             f"sequence lengths: {rec['m']}, {rec['n']}"]
    for call in ("global score", "semiglobal score", "local score",
                 "global alignment", "semiglobal alignment",
                 "local alignment"):
        lines.append(f"testing {call} 12 ms")
    good = "\n".join(lines) + "\n"
    d = tmp_path / "rec"
    d.mkdir()
    (d / f"r_{cls['minlen']}x{cls['maxlen']}.txt").write_text(good)
    assert cli.main(["--parity", str(d)]) == 0
    out = capsys.readouterr().out
    assert "OK" in out

    # score-verbose variant with the right scores still passes
    verbose = good + "".join(
        f"score {k} {v}\n" for k, v in rec["scores"].items())
    (d / f"r_{cls['minlen']}x{cls['maxlen']}.txt").write_text(verbose)
    assert cli.main(["--parity", str(d)]) == 0
    out = capsys.readouterr().out
    assert "3 scores verified" in out

    # wrong score -> fail
    bad = good + f"score global {rec['scores']['global'] + 1}\n"
    (d / f"r_{cls['minlen']}x{cls['maxlen']}.txt").write_text(bad)
    assert cli.main(["--parity", str(d)]) == 1
    assert "MISMATCH" in capsys.readouterr().out

    # wrong drawn lengths -> fail (RNG stream divergence)
    wrong = good.replace(
        f"sequence lengths: {rec['m']}, {rec['n']}",
        f"sequence lengths: {rec['m'] + 1}, {rec['n']}")
    (d / f"r_{cls['minlen']}x{cls['maxlen']}.txt").write_text(wrong)
    assert cli.main(["--parity", str(d)]) == 1
    assert "DIFFERENT random stream" in capsys.readouterr().out
