"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full quality-filter pipeline (native gates +
               vectorized langid/perplexity/scrub UDFs) over the
               sf0.001 documents table.
queries()    — every implemented operator (SURVEY.md §2 + the
               training-data ops) as (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB twins for the SQL-expressible subset; pipeline
               stages that require Python-`re`/langid/perplexity
               semantics are rows-only by design (their correctness
               gate is tests/test_pipeline_parity.py vs the
               single-node labeler instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprof_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-document keep/drop decisions + scrubbed text on
    the sf0.001 documents table (url := doc_id as string)."""
    from dataprof_spark.operators import gates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        "text",
        "lang",
    )
    return gates.decide(pages, ts_col=None)


def _pipeline_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline (langid + perplexity + scrub UDFs) — rows-only."""
    from dataprof_spark.operators import gates
    from dataprof_spark.session import rebalance

    docs = rebalance(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), key="doc_id"
    )
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"), "text", "lang"
    )
    out = gates.decide(pages, ts_col=None)
    # maps are awkward to hash-compare; surface counts as columns
    return out.select(
        "url",
        "keep",
        "drop_reason",
        "scrubbed_text",
        F.col("scrub_counts")["email"].alias("scrub_email"),
        F.col("scrub_counts")["phone"].alias("scrub_phone"),
        F.col("scrub_counts")["ip"].alias("scrub_ip"),
        F.col("scrub_counts")["blocklist"].alias("scrub_blocklist"),
        F.round("quality_score", 6).alias("quality_score"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # exactly 50 entries: the driver correctness-checks the first 50
    # in insertion order, so every query here gets a row
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "pipeline_decisions": _pipeline_decisions,
    }
    out.update({name: fn for name, (fn, _sql) in _q.registry().items()})
    assert len(out) <= 50, f"driver window overflow: {len(out)}"
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _q.registry().items()
        if sql is not None
    }
