"""Command-line driver, format-compatible with the reference binary.

Reference: src/main.cpp:124-235. Supports the same two input modes:

  align -i/--in <query file> <subject file>   (first FASTA/FASTQ record each)
  align -r/--rand [min len] [max len]         (random ACGT strings)

and prints the same "testing <name> <N> ms" timing lines for the six API
calls (main.cpp:29-57). Deviations (deliberate, documented):

- random mode uses numpy's seeded PCG64 instead of C++'s default
  ``mt19937_64`` + ``uniform_int_distribution`` (whose output is
  implementation-defined and thus not byte-portable anyway); it remains
  deterministic run-to-run (reference main.cpp:207 quirk Q5 in SURVEY.md).
- ``--mode``, ``--print``, ``--fulltb``, ``--scores`` extend the reference
  CLI (which hard-codes scoring and never prints alignments --
  print_alignment is dead code there, SURVEY.md §2.4).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _random_string(rng, minlen: int, maxlen: int) -> bytes:
    length = int(rng.integers(minlen, maxlen + 1))
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    return bytes(alphabet[rng.integers(0, 4, size=length)])


def _timed(name: str, fn, out):
    print(f"testing {name}", end="", flush=True, file=out)
    t0 = time.perf_counter()
    result = fn()
    ms = int(round((time.perf_counter() - t0) * 1000))
    print(f" {ms} ms", file=out)
    return result


def benchmark_alignments(query: bytes, subject: bytes, scoring, out,
                         fulltb: bool = False, do_print: bool = False,
                         mesh=None):
    """The reference's benchmark_alignments (main.cpp:60-86): three score
    calls then three alignment constructions."""
    import anyseq_tpu
    from anyseq_tpu.io.alignment import print_alignment

    for mode in ("global", "semiglobal", "local"):
        _timed(
            f"{mode} score",
            lambda m=mode: anyseq_tpu.align_score(query, subject, m, scoring),
            out,
        )

    traceback = "full" if fulltb else "auto"
    for mode in ("global", "semiglobal", "local"):
        aln = _timed(
            f"{mode} alignment",
            lambda m=mode: anyseq_tpu.align(
                query, subject, m, scoring, traceback=traceback,
                mesh=None if fulltb else mesh,
            ),
            out,
        )
        if do_print:
            print_alignment(aln, file=out)


def _honor_platform_env():
    """Re-apply JAX_PLATFORMS even if jax was pre-imported by a
    sitecustomize hook (otherwise the env var is silently ignored)."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def main(argv=None) -> int:
    _honor_platform_env()
    parser = argparse.ArgumentParser(
        prog="align",
        description="TPU-native pairwise sequence alignment (anyseq_tpu)",
    )
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument(
        "-i", "--in", dest="files", nargs=2, metavar=("QUERY", "SUBJECT"),
        help="read sequences from input files (first record each)",
    )
    group.add_argument(
        "-r", "--rand", dest="rand", nargs="*", type=int, metavar="LEN",
        help="generate random input sequences [min len] [max len]",
    )
    group.add_argument(
        "-b", "--batch", dest="batch", nargs=2,
        metavar=("QUERIES", "SUBJECTS"),
        help="align ALL records of two files pairwise (record i vs "
             "record i); batched data-parallel engine "
             "(beyond-reference capability)",
    )
    group.add_argument(
        "--parity", metavar="REF",
        help="diff a real reference binary (or a directory of recorded "
             "`align -r` outputs) against the committed golden corpus "
             "(tests/golden/); see anyseq_tpu/parity.py",
    )
    parser.add_argument(
        "--score-only", action="store_true",
        help="batch mode: report scores without constructing alignments",
    )
    parser.add_argument(
        "--mesh", action="store_true",
        help="distribute over all visible devices (batch: dp-sharded "
             "sweeps; single pair: distributed construction)",
    )
    parser.add_argument(
        "--mode", choices=["all", "global", "semiglobal", "local"],
        default="all", help="restrict to one alignment scheme",
    )
    parser.add_argument(
        "--scores", nargs=3, type=int, metavar=("MATCH", "MISMATCH", "GAP"),
        default=[2, -1, -1],
        help="linear scoring parameters (reference hard-codes 2 -1 -1)",
    )
    parser.add_argument(
        "--affine", nargs=2, type=int, metavar=("GAP_OPEN", "GAP_EXTEND"),
        default=None,
        help="use affine (Gotoh) gap scoring instead of linear "
             "(beyond-reference capability)",
    )
    parser.add_argument("--fulltb", action="store_true",
                        help="use full-matrix traceback instead of Hirschberg")
    parser.add_argument("--print", dest="do_print", action="store_true",
                        help="print the constructed alignments")
    parser.add_argument("--seed", type=int, default=0,
                        help="random-mode seed (deterministic by default)")
    args = parser.parse_args(argv)

    out = sys.stdout

    from anyseq_tpu.core.types import AffineScoring, LinearScoring

    if args.affine is not None:
        scoring = AffineScoring(args.scores[0], args.scores[1],
                                args.affine[0], args.affine[1])
    else:
        scoring = LinearScoring(*args.scores)

    mesh = None
    if args.mesh:
        from anyseq_tpu.dist.mesh import make_mesh

        mesh = make_mesh()

    if args.parity:
        from anyseq_tpu.parity import run_parity

        return run_parity(args.parity, out)

    if args.batch:
        from anyseq_tpu.io.fasta import make_sequence_reader

        qf, sf = args.batch
        try:
            qs = [r.data for r in make_sequence_reader(qf) if r.data]
            ss = [r.data for r in make_sequence_reader(sf) if r.data]
        except Exception as e:
            print(str(e), file=sys.stderr)
            return 1
        npairs = min(len(qs), len(ss))
        if npairs == 0:
            print("no records", file=sys.stderr)
            return 1
        qs, ss = qs[:npairs], ss[:npairs]
        mode = args.mode if args.mode != "all" else "global"
        print(f"batch: {npairs} pairs, mode {mode}", file=out)
        if args.score_only:
            from anyseq_tpu.dist.batch import align_scores_batch_sharded

            t0 = time.perf_counter()
            scores = align_scores_batch_sharded(qs, ss, mode, scoring,
                                                mesh)
            ms = int(round((time.perf_counter() - t0) * 1000))
            print(f"testing batch {mode} score {ms} ms", file=out)
            for i, sc_ in enumerate(scores):
                print(f"pair {i}: score {int(sc_)}", file=out)
        else:
            import anyseq_tpu
            from anyseq_tpu.io.alignment import print_alignment

            t0 = time.perf_counter()
            alns = anyseq_tpu.align_batch(qs, ss, mode, scoring, mesh=mesh)
            ms = int(round((time.perf_counter() - t0) * 1000))
            print(f"testing batch {mode} alignment {ms} ms", file=out)
            for i, aln in enumerate(alns):
                print(f"pair {i}: score {aln.score}", file=out)
                if args.do_print:
                    print_alignment(aln, file=out)
        return 0

    if args.files:
        from anyseq_tpu.io.fasta import read_first_sequence

        qf, sf = args.files
        print(f"input sequences: {qf}, {sf}", file=out)
        try:
            query = read_first_sequence(qf)
            subject = read_first_sequence(sf)
        except Exception as e:  # reference prints and continues (main.cpp:191)
            print(str(e), file=sys.stderr)
            return 1
    else:
        rand = args.rand if args.rand else []
        minlen = rand[0] if len(rand) > 0 else 256
        maxlen = rand[1] if len(rand) > 1 else 1024
        if minlen < 1 or maxlen < 1:
            print("String lengths must be greater than zero!", file=sys.stderr)
            return 1
        if maxlen < minlen:
            minlen, maxlen = maxlen, minlen
        print(f"random strings with length from [{minlen},{maxlen}]", file=out)
        rng = np.random.default_rng(args.seed)
        query = _random_string(rng, minlen, maxlen)
        subject = _random_string(rng, minlen, maxlen)

    print(f"sequence lengths: {len(query)}, {len(subject)}", file=out)

    aln_mesh = mesh  # affine distributed construction supported (r3)
    if args.mode == "all":
        benchmark_alignments(query, subject, scoring, out,
                             args.fulltb, args.do_print, mesh=aln_mesh)
    else:
        import anyseq_tpu
        from anyseq_tpu.io.alignment import print_alignment

        _timed(f"{args.mode} score",
               lambda: anyseq_tpu.align_score(query, subject, args.mode, scoring),
               out)
        aln = _timed(
            f"{args.mode} alignment",
            lambda: anyseq_tpu.align(
                query, subject, args.mode, scoring,
                traceback="full" if args.fulltb else "auto",
                mesh=None if args.fulltb else aln_mesh,
            ),
            out,
        )
        if args.do_print:
            print_alignment(aln, file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
