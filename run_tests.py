#!/usr/bin/env python
"""Process-isolated test driver: the committed one-command test run.

`python -m pytest tests/ -q` in a single process accumulates XLA:CPU
compile state across ~200 compilations and segfaults nondeterministically
inside `backend_compile_and_load` (upstream XLA:CPU bug; every file
passes in isolation). This driver runs each test FILE in a fresh
interpreter -- full compile-state isolation -- with a small worker pool,
and fails loudly on any non-zero exit (including crashes).

Usage:  python run_tests.py [-jN] [pytest args...]
Extra args are forwarded to every pytest invocation (e.g. -x, -k expr).
Exit code 0 iff every file passed.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", type=int, default=2,
                    help="parallel workers (default 2)")
    ap.add_argument("rest", nargs="*", help="extra pytest args")
    args = ap.parse_args()

    # Longest-running files first (better 2-worker packing); file size
    # is a good-enough proxy, with the two known-slow files pinned.
    slow = ["test_kernel_sched.py", "test_kernel.py",
            "test_collective.py", "test_kernel_levels.py"]
    files = sorted(
        glob.glob(os.path.join(HERE, "tests", "test_*.py")),
        key=lambda f: (slow.index(os.path.basename(f)) - 10
                       if os.path.basename(f) in slow
                       else -os.path.getsize(f) / 1e9),
    )
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    lock = threading.Lock()
    results: dict[str, tuple[int, float, str]] = {}
    queue = list(files)

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                f = queue.pop(0)
            t0 = time.monotonic()
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q", "--no-header",
                 *args.rest],
                capture_output=True, text=True, cwd=HERE,
            )
            dt = time.monotonic() - t0
            tail = (proc.stdout or "").strip().splitlines()
            summary = tail[-1] if tail else ""
            with lock:
                results[f] = (proc.returncode, dt, summary)
                name = os.path.basename(f)
                status = "ok" if proc.returncode == 0 else (
                    f"FAIL rc={proc.returncode}")
                print(f"[{len(results)}/{len(files)}] {name:28s} "
                      f"{dt:6.1f}s  {status}  {summary}", flush=True)
                if proc.returncode != 0:
                    sys.stdout.write(proc.stdout[-4000:])
                    sys.stdout.write(proc.stderr[-4000:])

    t0 = time.monotonic()
    threads = [threading.Thread(target=worker)
               for _ in range(max(1, args.j))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.monotonic() - t0

    passed = tests = 0
    failed = [f for f, (rc, _, _) in results.items() if rc != 0]
    for _, (_, _, summary) in results.items():
        mt = re.search(r"(\d+) passed", summary)
        if mt:
            passed += int(mt.group(1))
        tests += sum(int(x) for x in re.findall(
            r"(\d+) (?:passed|failed|error)", summary))
    print(f"\n{passed}/{tests} tests passed in {total:.0f}s "
          f"({len(files) - len(failed)}/{len(files)} files green)")
    if failed:
        print("failed files:", ", ".join(os.path.basename(f)
                                         for f in failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
