"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is the
dominant shuffle. Writing both sides bucketed by the join key into
the warehouse makes every subsequent join on that key exchange-free:
Spark reads matching buckets pairwise. This is the batch equivalent
of Iceberg's `bucket(N, key)` hidden partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    force_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables — the planner elides both
    exchanges (bucket-pairwise read). `force_merge` adds a MERGE hint,
    useful when the inputs are small enough that the planner would
    broadcast instead (at real scale both sides are fact-sized and
    sort-merge is what it picks anyway)."""
    left, right = spark.table(left_table), spark.table(right_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(right, on)
