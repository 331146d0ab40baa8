"""Explicit skew handling — salting for heavy-hitter keys.

The north rule requires partitioning/shuffle/skew handled explicitly:
AQE's skew-join split (enabled in session.py) covers joins at runtime;
this module covers the aggregation case, where one hot key (a heavy
domain in a web corpus) would otherwise serialize into one reducer.

`salted_agg` = two-stage aggregation: stage 1 groups on
(key, salt = hash(row) % n_salts) so the hot key's rows spread over
n_salts reducers; stage 2 merges the partials per key. Works for any
algebraic aggregate (the same partial/final decomposition Spark and
the reference's merge() accumulators use).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from the whole row (content hash,
    never rand() — reruns and retried tasks must land identically)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )


def salted_count_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """count + sum per key via salted two-stage aggregation.

    Stage 1 shuffle key is (key, salt): a key holding 50% of all rows
    spreads across n_salts reducers instead of melting one. Stage 2
    shuffles only n_salts rows per key.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key_col, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_col).alias("__s"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("__n").alias("cnt"),
        F.sum("__s").alias("total"),
    )


def domain_of(url: Column) -> Column:
    """Domain extraction for web URLs (the natural-but-skewed key).
    No trailing-slash requirement: 'https://example.com' must yield
    'example.com', not '' — an empty-domain bucket for every path-less
    URL would itself be a manufactured hot key."""
    return F.regexp_extract(url, r"^[a-z]+://([^/?#]+)", 1)
