"""Capture .explain("formatted") for bench queries into plans/<round>/.

Usage: python tools/capture_plans.py [--suffix before|after] [--queries a,b]
       [--round r13]

Writes plans/r12/<query>_<suffix>.txt for every headline + secondary bench
row that is a registry query (bench-only EXTRA_SECONDARY rows that wrap a
side-effecting build are captured through their underlying frame where one
exists). Plan capture is driver-only (no job runs) except for queries whose
builder itself runs eager prep (fixture materialization); those reuse the
shared marker-cached fixtures, so repeat captures are cheap.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cassandra_sstable_tools_spark.queries import registry  # noqa: E402
from cassandra_sstable_tools_spark.session import get_spark  # noqa: E402

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: all bench rows)")
    ap.add_argument("--sf-dir", default=bench.SF_DIR)
    ap.add_argument("--round", default="r13", dest="round_name")
    args = ap.parse_args()

    OUT_DIR = Path(__file__).resolve().parents[1] / "plans" / args.round_name
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    qs = registry.queries()
    names = bench.HEADLINE + bench.SECONDARY
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    for name in names:
        fn = qs.get(name) or bench.EXTRA_SECONDARY.get(name)
        if fn is None:
            print(f"skip {name}: not a registry or bench row", file=sys.stderr)
            continue
        try:
            df = fn(spark, args.sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"skip {name}: builder raised {exc!r}", file=sys.stderr)
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = OUT_DIR / f"{name}_{args.suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
