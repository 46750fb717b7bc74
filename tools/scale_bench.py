"""One-off scale-validation bench: synthesize sf1 (10x sf0.1) and run the
headline bench against it.

Every 100 TB claim in SCALE.md is an argued plan shape measured at sf0.1;
this harness checks the curves are actually ~linear by scaling the corpus
10x and comparing per-query wall-clock ratios. A superlinear ratio exposes
a hidden quadratic (or a memory cliff in an exact-percentile buffer) that
plan reading alone can miss.

The sf1 corpus is synthesized OUTSIDE the read-only testdata tree
(default /tmp/spark_graft_sf1): each fact table is 10 disjoint key-shifted
copies of its sf0.1 original (all FK columns shifted by the same stride, so
FK join cardinalities scale linearly and no cross-copy FK joins appear);
dimension tables (nation/region) stay single-copy, exactly how a real 10x
corpus shares its dimensions. pyarrow does the copy so physical parquet
types are preserved byte-for-byte (the events timestamp type tripwire
stays honest).

CAVEAT -- content-hash workloads: only KEYS are shifted, so the corpus
holds 10 verbatim copies of every document text and embedding. Queries
that join on content hashes (exact/chunk dedup, minhash-LSH shingles,
embedding near-dup) therefore face a workload that grows MORE than 10x
(each LSH duplicate group of c members becomes 10c -> candidate pairs grow
~100x). Read their ratios as an ADVERSARIAL upper bound: a sub-10x
wall-clock on a super-10x workload is a stronger linearity statement, not
a clean linear measurement. FK-join and scan/agg queries are unaffected.

Run:  python tools/scale_bench.py            # build if missing + bench
      python tools/scale_bench.py --rebuild  # force re-synthesis
Emits the same one-line bench JSON, tagged "sf": the sf1 dir; compare
against BENCH JSON from the default run for the ratio table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/spark_graft_sf1"
COPIES = 10
STRIDE = 10**9  # > any sf0.1 key; keeps every copy's keyspace disjoint

# key (FK-consistent) columns to shift per table; absent tables copy once
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["nation", "region"]


def _shifted(table: pa.Table, cols: list[str], offset: int) -> pa.Table:
    for c in cols:
        idx = table.schema.get_field_index(c)
        shifted = pc.add(table.column(c), pa.scalar(offset, table.schema.field(c).type))
        table = table.set_column(idx, table.schema.field(c), shifted)
    return table


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in SINGLE_COPY:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (single copy)")
    for name, cols in SHIFT_COLS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [_shifted(t, cols, i * STRIDE) if i else t for i in range(COPIES)]
        big = pa.concat_tables(parts)
        # several row groups so Spark still parallelizes the scan
        pq.write_table(big, f"{out_dir}/{name}.parquet",
                       row_group_size=max(big.num_rows // 32, 10000))
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")
    with open(f"{out_dir}/_BUILT", "w") as f:
        f.write(f"copies={COPIES};stride={STRIDE};src={SRC}\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=DEFAULT_OUT)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--runs", default="2")
    args = ap.parse_args()
    if args.rebuild or not os.path.exists(f"{args.out_dir}/_BUILT"):
        build(args.out_dir)
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=args.out_dir,
        SPARK_GRAFT_BENCH_RUNS=args.runs,
        SPARK_GRAFT_BENCH_SECONDARY_RUNS="1",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    sys.stderr.write(proc.stderr[-2000:])
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    print(line)
    if line:
        d = json.loads(line)
        print(f"# sf1 headline total: {d['value']}s", file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
