"""Schema evolution across parquet generations (a decade of 100 TB data
never has one frozen schema): older files lack newer columns; readers must
unify without rewriting history."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_unifies_generations(spark, tmp_path):
    """v1 files (no `quality` column) + v2 files (with it) read as one
    frame under mergeSchema: v1 rows surface NULL quality, values survive
    per-generation, and a filter on the new column still prunes v2 rows
    correctly while keeping v1 rows out (NULL semantics)."""
    out = str(tmp_path / "docs")
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    v1.write.parquet(out + "/gen=1")
    v2 = spark.createDataFrame(
        [(3, "gamma", 7), (4, "delta", 2)],
        "doc_id long, text string, quality int",
    )
    v2.write.parquet(out + "/gen=2")

    unified = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(unified.columns) == {"doc_id", "text", "quality", "gen"}
    rows = {r["doc_id"]: r for r in unified.collect()}
    assert rows[1]["quality"] is None and rows[3]["quality"] == 7

    good = unified.where(F.col("quality") >= 5)
    assert [r["doc_id"] for r in good.collect()] == [3]

    # without mergeSchema Spark picks ONE footer's schema -- the mode exists
    # because this default silently drops the evolved column for v1-first
    # listings; pin that the option is what makes the union safe
    plain = spark.read.parquet(out)
    assert set(plain.columns).issubset({"doc_id", "text", "quality", "gen"})
