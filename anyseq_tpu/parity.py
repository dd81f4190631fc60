"""Reference-binary parity harness (`align --parity <ref>`).

BASELINE.md's correctness bar is byte-parity with the reference CPU
binary. That binary needs the AnyDSL toolchain and cannot be built in
every environment, so parity is split in two:

* the committed corpus (tests/golden/) pins this framework to sequences
  byte-identical to the reference's `-r min max` random mode
  (tools/refgen.cpp) with scores agreed by two independent local oracles;
* THIS harness consumes a real reference binary -- or a directory of
  recorded outputs from one -- whenever one is available, and diffs it
  against the same corpus.

What the stock reference binary prints (src/main.cpp:29-57,214-231) is
only "sequence lengths: m, n" and per-call "testing <name> <ms> ms"
timing lines -- scores are computed into `volatile` locals and never
printed. The harness therefore checks, per shape class:

1. the drawn sequence lengths match the corpus (byte-level RNG parity:
   lengths are the first two mt19937_64-derived draws, so matching
   lengths on every class means the binary consumed the same stream);
2. all six API calls ran ("testing <name>" lines);
3. if the binary is a score-verbose variant (the documented one-line
   patch: print `score` after each call as "score <name> <N>"), every
   printed score equals the corpus score.

Recorded-output mode: pass a DIRECTORY containing `r_<min>x<max>.txt`
files, each the captured stdout of `align -r <min> <max>` run elsewhere.
"""
from __future__ import annotations

import json
import os
import re
import subprocess

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)

_CALLS = [
    "global score", "semiglobal score", "local score",
    "global alignment", "semiglobal alignment", "local alignment",
]

_SCORE_KEYS = {
    "global score": "global",
    "semiglobal score": "semiglobal",
    "local score": "local",
    "global alignment": "global",
    "semiglobal alignment": "semiglobal",
    "local alignment": "local",
}


def _load_golden():
    with open(os.path.join(GOLDEN_DIR, "golden.json")) as f:
        return json.load(f)


def _ref_output(ref: str, minlen: int, maxlen: int) -> str | None:
    if os.path.isdir(ref):
        path = os.path.join(ref, f"r_{minlen}x{maxlen}.txt")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read()
    out = subprocess.run(
        [ref, "-r", str(minlen), str(maxlen)],
        capture_output=True, text=True, timeout=3600,
    )
    return out.stdout


def check_output(text: str, rec, fasta: str) -> list[str]:
    """Diff one reference-run output against golden pair 0 of its class.
    Returns a list of mismatch descriptions (empty = parity)."""
    problems = []
    mlen = re.search(r"sequence lengths:\s*(\d+),\s*(\d+)", text)
    if not mlen:
        problems.append("no 'sequence lengths' line found")
    else:
        m, n = int(mlen.group(1)), int(mlen.group(2))
        if (m, n) != (rec["m"], rec["n"]):
            problems.append(
                f"sequence lengths ({m}, {n}) != corpus "
                f"({rec['m']}, {rec['n']}) [{fasta}] -- the binary drew a "
                "DIFFERENT random stream (stdlib mismatch?)")
    for call in _CALLS:
        if f"testing {call}" not in text:
            problems.append(f"missing 'testing {call}' line")
    # score-verbose variant: "score <name> <N>"
    for mt in re.finditer(r"score ((?:semi)?global|local)"
                          r"(?: score| alignment)? (-?\d+)", text):
        name, val = mt.group(1), int(mt.group(2))
        want = rec["scores"].get(name)
        if want is not None and val != want:
            problems.append(
                f"{name} score {val} != corpus {want} [{fasta}]")
    return problems


def run_parity(ref: str, out) -> int:
    golden = _load_golden()
    failures = 0
    checked = 0
    for cls in golden["classes"]:
        rec = cls["pairs"][0]
        try:
            text = _ref_output(ref, cls["minlen"], cls["maxlen"])
        except (OSError, subprocess.SubprocessError) as e:
            print(f"parity: cannot run {ref!r}: {e}", file=out)
            return 1
        tag = f"r {cls['minlen']} {cls['maxlen']}"
        if text is None:
            print(f"parity [{tag}]: SKIP (no recorded output)", file=out)
            continue
        problems = check_output(text, rec, cls["fasta"])
        checked += 1
        if problems:
            failures += 1
            for p in problems:
                print(f"parity [{tag}]: MISMATCH: {p}", file=out)
        else:
            nsc = len(re.findall(r"score (?:(?:semi)?global|local)", text))
            extra = f", {nsc} scores verified" if nsc else \
                " (timing-only binary: lengths + call set verified)"
            print(f"parity [{tag}]: OK{extra}", file=out)
    if checked == 0:
        print("parity: nothing checked", file=out)
        return 1
    print(f"parity: {checked - failures}/{checked} classes match",
          file=out)
    return 1 if failures else 0
