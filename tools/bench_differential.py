"""Same-box worktree differential: the standard triage for an over-bar
bench row (BASELINE.md r11).

A bench reading that moved between rounds has two candidate causes: the
round's diff, or the box (the r04/r10 lesson: driver-box load inflated
readings 1.5-3.6x on UNCHANGED code, and for Python-parse-bound rows even
the spread MIN moves with load). The only measurement that separates them
is running the IDENTICAL probe on both checkouts back-to-back on the same
box: same reading on both = box drift; current-only inflation = a real
regression in the diff.

Usage:
    python tools/bench_differential.py --ref <commit-ish> \
        --queries purge_top,pstats_summary_cassdir [--runs 3] [--sf DIR]

Checks out --ref into a temporary `git worktree`, runs `bench.py` scoped
via $SPARK_GRAFT_BENCH_ONLY on BOTH checkouts (ref first, then current --
each bench is its own subprocess with its own JVM, so neither warms the
other), prints a side-by-side min/median table and a verdict per query:
  BOX DRIFT     both sides within 25% of each other
  REGRESSION    current min > 1.25x ref min
  IMPROVEMENT   current min < 0.8x ref min
The worktree is removed on exit.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(checkout: str, queries: str, runs: int, sf: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    env["SPARK_GRAFT_BENCH_SECONDARY_RUNS"] = str(runs)
    env["SPARK_GRAFT_SF_DIR"] = sf
    proc = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py")],
        cwd=checkout, env=env, capture_output=True, text=True,
        check=False,
    )
    best = None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            out = json.loads(line)
            # bench.py prints the full record (with per-row spread) first
            # and a compact contract line (no spread) LAST -- prefer the
            # record that carries the spread this tool compares on
            if out.get("spread"):
                return out
            best = best or out
    if best is not None:
        return best
    raise SystemExit(
        f"bench in {checkout} produced no JSON line; stderr tail:\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ref", required=True,
                    help="commit-ish of the previous round / suspected-good"
                         " code")
    ap.add_argument("--queries", required=True,
                    help="comma-separated bench row names (headline or"
                         " secondary)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    wt = tempfile.mkdtemp(prefix="bench_diff_")
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    wt, args.ref], check=True)
    try:
        # older checkouts may predate SPARK_GRAFT_BENCH_ONLY: detect and
        # fall back to a full run (slower, same probe)
        with open(os.path.join(wt, "bench.py")) as f:
            if "SPARK_GRAFT_BENCH_ONLY" not in f.read():
                print("note: --ref predates bench subsetting; its side "
                      "runs the FULL bench (slower, same per-row probe)",
                      file=sys.stderr)
        ref_out = _run_bench(wt, args.queries, args.runs, args.sf)
        cur_out = _run_bench(REPO, args.queries, args.runs, args.sf)
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove",
                        "--force", wt], check=False)

    def spread(out: dict, name: str):
        return out.get("spread", {}).get(name)

    print(f"\n{'query':32s} {'ref min/med':>14s} {'cur min/med':>14s} "
          f"verdict")
    for name in [q.strip() for q in args.queries.split(",") if q.strip()]:
        r, c = spread(ref_out, name), spread(cur_out, name)
        if not r or not c:
            print(f"{name:32s} {'-':>14s} {'-':>14s} NO DATA "
                  f"(errored or unknown on one side)")
            continue
        ratio = c["min"] / r["min"] if r["min"] else float("inf")
        verdict = ("REGRESSION" if ratio > 1.25
                   else "IMPROVEMENT" if ratio < 0.8 else "BOX DRIFT")
        print(f"{name:32s} {r['min']:6.2f}/{r['median']:<6.2f} "
              f"{c['min']:6.2f}/{c['median']:<6.2f} "
              f"{verdict} (min ratio {ratio:.2f})")


if __name__ == "__main__":
    main()
