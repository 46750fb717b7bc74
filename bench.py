"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Protocol (BASELINE.md): local[$SPARK_GRAFT_CPUS], AQE on, exact percentiles,
results collected to driver. Per query: 1 warm-up run then median of 3 timed
runs. Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One representative query per reference command family + heavyweight extras
# from the extension surface (joins, dedup pipeline, ANN, sessionization).
HEADLINE = [
    "summary",
    "sstables",
    "pstats_summary",
    "pstats_top_size",
    "cfstats_global",
    "cfstats_sstables",
    "cfstats_top_size",
    "purge_top",
    "tpch_q10",
    "corpus_keep_list",
    "ann_ivf_topk",
    "sessionize",
    # r03 additions: user-facing extension surfaces that previously had no
    # perf trajectory (events rollup, multimodal plumbing, near-dup join,
    # streaming dedup drain). Bars recorded in SCALE.md's bench table.
    "events_hourly",
    "media_metadata",
    "minhash_lsh_pairs",
    "stream_dedup_events",
]


def main() -> None:
    from cassandra_sstable_tools_spark.queries import registry
    from cassandra_sstable_tools_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]
    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    # Global warm-up pass: the first queries in the list otherwise pay
    # JVM-wide costs (C2-compiling Spark's whole-stage-codegen pipeline,
    # building the shared derived-frame caches) inside their TIMED runs --
    # measured: `summary` first-in-process times ~3s vs 0.88s steady-state.
    # One full untimed pass moves every query to steady state; the per-query
    # warm-up below then only has to touch query-local state.
    for name in names:
        try:
            qs[name](spark, SF_DIR).collect()
        except Exception:  # noqa: BLE001 -- the timed loop reports it
            pass
    for name in names:
        fn = qs[name]
        # Failure isolation: one broken query must not zero the whole
        # round's perf signal (r03: a sessionize warm-up crash left the
        # round with NO numbers). Record null + the error, keep going,
        # always emit the JSON line.
        try:
            fn(spark, SF_DIR).collect()  # warm-up (JIT, file listing, code cache)
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                fn(spark, SF_DIR).collect()
                runs.append(time.monotonic() - t0)
            timings[name] = round(statistics.median(runs), 3)
        except Exception as exc:  # noqa: BLE001 -- deliberate: isolate any failure
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
    measured = [t for t in timings.values() if t is not None]
    total = round(sum(measured), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
