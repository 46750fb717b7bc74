"""Central registry of (query callable, oracle SQL) pairs.

Every operator claimed done in SURVEY.md §2 needs BOTH a ``queries()`` entry
and (when SQL-expressible) an ``oracle_sql()`` entry; the driver hash-compares
them at sf0.01. Keys are stable public names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerieFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from cassandra_sstable_tools_spark.llm import (
        corpus,
        curation,
        dedup,
        multimodal,
        pipeline,
        similarity,
        text,
    )
    from cassandra_sstable_tools_spark.streaming import events_stream, stateful
    from cassandra_sstable_tools_spark.queries import (
        catalog,
        cfstats,
        events,
        pstats,
        purge,
        sstables_listing,
        summary,
        tpch,
        tpch_ext,
    )

    return [
        summary, sstables_listing, pstats, cfstats, purge, tpch, tpch_ext,
        text, corpus, curation, dedup, similarity, pipeline, events, multimodal,
        catalog, stateful, events_stream,
    ]


def queries() -> dict[str, QuerieFn]:
    out: dict[str, QuerieFn] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
