#!/usr/bin/env python
"""Interleaved A/B bench (VERDICT r10 next-round item 6).

This VM shows hypervisor CPU-steal windows (docs/BENCH_NOTES.md: the
same 10-query subset measured 40.0 s and 10.7 s twenty minutes apart
with zero diff), so two full bench runs taken in different windows are
not comparable. This harness makes round-over-round and
change-over-baseline comparisons window-robust by ALTERNATING reps of
two trees inside one session window:

  python scripts/ab_bench.py --ref <git-ref> --queries q1,q2 [--reps 4]

It materializes the reference tree with `git worktree add` (under
.scratch/, removed afterwards unless --keep), starts one warm child
Spark session per tree (scripts/ab_child.py), and for each query runs
reps strictly interleaved: A,B,A,B,... Adjacent reps share whatever
window the host is in, so the per-query min ratio reflects the CODE
difference, not the window. Reports per-query best-of-reps for both
sides and the ratio; exit code is always 0 (it is a measurement tool,
not a gate).

Default bench behavior is UNCHANGED — bench.py does not import this.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class Child:
    def __init__(self, tree: str, label: str):
        self.label = label
        self.proc = subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "scripts", "ab_child.py"), tree],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            bufsize=1,
            cwd=tree,
        )
        line = self.proc.stdout.readline().strip()
        while line and line != "READY":
            line = self.proc.stdout.readline().strip()
        if line != "READY":
            raise RuntimeError(f"{label}: child died before READY")

    def run(self, query: str) -> float | None:
        self.proc.stdin.write(f"RUN {query}\n")
        self.proc.stdin.flush()
        line = self.proc.stdout.readline().strip()
        while line and not (line.startswith("OK ") or line.startswith("ERR")):
            line = self.proc.stdout.readline().strip()
        if line.startswith("OK "):
            return float(line[3:])
        print(f"  [{self.label}] {query}: {line}", file=sys.stderr)
        return None

    def quit(self) -> None:
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="git ref for the B (reference) tree")
    ap.add_argument("--queries", required=True, help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--keep", action="store_true", help="keep the ref worktree")
    args = ap.parse_args()

    queries = [q for q in args.queries.split(",") if q]
    scratch = os.path.join(ROOT, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    sha = subprocess.check_output(
        ["git", "rev-parse", "--short", args.ref], cwd=ROOT, text=True
    ).strip()
    ref_tree = os.path.join(scratch, f"abtree_{sha}")
    if not os.path.isdir(ref_tree):
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", ref_tree, args.ref],
            cwd=ROOT,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    a = Child(ROOT, "HEAD")
    b = Child(ref_tree, sha)
    results: dict[str, dict] = {}
    try:
        for q in queries:
            ta: list[float] = []
            tb: list[float] = []
            for _ in range(args.reps):
                ra = a.run(q)
                rb = b.run(q)
                if ra is not None:
                    ta.append(ra)
                if rb is not None:
                    tb.append(rb)
            if ta and tb:
                results[q] = {
                    "head_min": round(min(ta), 4),
                    "ref_min": round(min(tb), 4),
                    "ratio_head_over_ref": round(min(ta) / min(tb), 3),
                    "head_reps": [round(t, 3) for t in ta],
                    "ref_reps": [round(t, 3) for t in tb],
                }
    finally:
        a.quit()
        b.quit()
        if not args.keep:
            subprocess.call(
                ["git", "worktree", "remove", "--force", ref_tree], cwd=ROOT
            )

    print(json.dumps({"ref": sha, "reps": args.reps, "queries": results}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
