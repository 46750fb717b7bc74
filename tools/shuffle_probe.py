"""Deterministic structure probe: run one bench row and report job count,
stage count, task count, and total shuffle read/write bytes from Spark's
StatusStore REST-equivalent (the JVM AppStatusStore via statusTracker +
stage metrics). These counts are box-load-invariant, so they separate a
structural change (fewer exchanges/joins per round) from wall-clock noise
the way a contended-box wall A/B cannot.

Usage: python tools/shuffle_probe.py <query_name> [<query_name> ...]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from cassandra_sstable_tools_spark.queries import registry
    from cassandra_sstable_tools_spark.session import get_spark

    spark = get_spark(app_name="shuffle_probe")
    qs = registry.queries()
    sc = spark.sparkContext

    import urllib.request

    ui = sc.uiWebUrl
    if ui is None:  # r12 ADVICE: 'None/api/...' raises an opaque URLError
        raise SystemExit(
            "shuffle_probe needs the Spark UI REST API; this session has "
            "spark.ui.enabled=false -- rerun without disabling the UI"
        )
    app_id = sc.applicationId

    def rest(path: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{path}"
        ) as r:
            return json.loads(r.read())

    def snapshot():
        jobs = rest("jobs?status=succeeded")
        stages = rest("stages?status=complete")
        return jobs, stages

    for name in sys.argv[1:]:
        fn = qs[name]
        fn(spark, SF_DIR).collect()  # warm-up: caches, fixture encode, JIT
        jobs0, stages0 = snapshot()
        jobs_before = {j["jobId"] for j in jobs0}
        stages_before = {(s["stageId"], s["attemptId"]) for s in stages0}
        fn(spark, SF_DIR).collect()
        jobs1, stages1 = snapshot()
        new_stages = [s for s in stages1
                      if (s["stageId"], s["attemptId"]) not in stages_before]
        print(json.dumps({
            "query": name,
            "jobs": len([j for j in jobs1
                         if j["jobId"] not in jobs_before]),
            "stages": len(new_stages),
            "tasks": sum(s["numCompleteTasks"] for s in new_stages),
            "shuffle_read_mb": round(
                sum(s["shuffleReadBytes"] for s in new_stages) / 1e6, 2),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in new_stages) / 1e6, 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
