"""JSON-lines ingest for the events feed.

Production telemetry rarely arrives as parquet; the common wire format is
one JSON object per line. This source reads that shape with the decisions
that matter at 100 TB made explicit:

- **Explicit schema, never inference.** ``spark.read.json`` without a schema
  runs a FULL extra pass over the data to infer one -- at 100 TB that's a
  second scan before the first byte of real work. The schema here is the
  events contract, declared once.
- **PERMISSIVE + corrupt-record column.** A malformed line must not kill a
  1000-executor job (FAILFAST) nor vanish silently (DROPMALFORMED): it lands
  in ``_corrupt_record`` with every contract column null, so the pipeline
  can count/quarantine bad input as data. The quarantine split is a plain
  filter -- no second read.
- Timestamps arrive as epoch **seconds** in the JSON (wire formats don't
  carry parquet logical types); the reader emits the same canonical ``ts_s``
  the parquet adapter derives, so every downstream query is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CORRUPT_COL = "_corrupt_record"

EVENTS_JSONL_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_s", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read an events JSON-lines directory/file with the explicit contract
    schema; malformed lines survive in ``_corrupt_record``."""
    return (
        spark.read.schema(EVENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): rows that parsed vs raw lines that did not.
    One predicate on the already-read frame -- no second pass.

    The frame is cached first: Spark refuses queries over raw JSON whose
    referenced columns are ONLY the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN -- the lazy
    re-parse could not reconstruct the raw line); materializing the parse
    is the documented pattern, and is what a real ingest does anyway (parse
    once, split, write both sinks). Cache ownership stays with the caller:
    once both sinks are written, call ``unpersist()`` ON THE FRAME YOU
    PASSED IN -- that is the exact plan this function cached. Unpersisting
    a RETURNED frame does NOT release it (``clean`` is a derived filter;
    unpersist only matches same-plan cache entries), so a long-lived ingest
    loop releasing the wrong frame pins every parsed batch in storage."""
    df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, quarantine
