"""Column profiler semantics vs the reference's contracts: type
inference rules, exact/approx distinct provenance, stats, flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprof_spark.operators import profiler, quality

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li_profiles(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    return {p.name: p for p in profiler.profile(df)}


def test_counts_and_distinct_exact(spark, li_profiles):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    total = df.count()
    p = li_profiles["l_quantity"]
    assert p.total_count == total
    assert p.null_count == 0
    assert not p.distinct_is_approximate  # under 10k → exact tier
    assert p.distinct_count == df.select("l_quantity").distinct().count()


def test_numeric_stats(spark, li_profiles):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = li_profiles["l_extendedprice"]
    row = df.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"),
        F.avg("l_extendedprice"), F.stddev_samp("l_extendedprice"),
    ).collect()[0]
    assert p.stats["min"] == pytest.approx(row[0])
    assert p.stats["max"] == pytest.approx(row[1])
    assert p.stats["mean"] == pytest.approx(row[2])
    assert p.stats["std"] == pytest.approx(row[3])
    assert p.stats["q1"] <= p.stats["median"] <= p.stats["q3"]
    assert p.stats["cv"] is not None


def test_temporal_and_string_profiles(li_profiles):
    ship = li_profiles["l_shipdate"]
    assert ship.inferred_type == "date"
    assert ship.stats["duration_days"] > 0
    rf = li_profiles["l_returnflag"]
    assert rf.inferred_type == "string"
    assert rf.distinct_count == 3
    assert len(rf.top_values) == 3
    # top-k ordered by count desc then value
    counts = [c for _, c in rf.top_values]
    assert counts == sorted(counts, reverse=True)


def test_inference_rules_on_string_columns(spark):
    rows = [
        ("1", "1.5", "true", "2024-01-02", "abc", None),
        ("2", "2.5", "false", "2024-02-03", "xyz", "null"),
        ("3", "x", "TRUE", "2024-03-04", "1", "NaN"),
        ("42", "4.25", "False", "05/06/2024", "2x", "  "),
    ]
    df = spark.createDataFrame(
        rows, "ints string, floats string, bools string, dates string, "
        "strs string, nulls string"
    )
    ps = {p.name: p for p in profiler.profile(df)}
    assert ps["ints"].inferred_type == "integer"     # 100% i64
    assert ps["floats"].inferred_type == "string"    # 75% float ≤ 0.8
    assert ps["bools"].inferred_type == "boolean"    # 100% strict bool
    assert ps["dates"].inferred_type == "date"       # 100% date shapes
    assert ps["strs"].inferred_type == "string"
    # null-like semantics (P1): None/'null'/'NaN'/whitespace all null
    assert ps["nulls"].null_count == 4
    assert "null_column" in ps["nulls"].flags


def test_key_name_heuristic():
    assert profiler._is_key_named("user_id")
    assert profiler._is_key_named("orderKey")
    assert profiler._is_key_named("pk")
    assert not profiler._is_key_named("identity_matrix")
    assert not profiler._is_key_named("quantity")


def test_quality_assess_on_orders(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rep = quality.assess(df, key_col="o_orderkey")
    assert rep.dimensions["completeness"] == 1.0
    assert rep.details["uniqueness"]["key_uniqueness"] == 1.0
    assert 0.0 <= rep.overall_score <= 1.0
    assert rep.confidence == "exact"


def test_quality_detects_problems(spark):
    rows = [
        (1, "a@b.com", 25.0, "2026-05-01"),
        (1, "cafÃ©", -5.0, "2031-01-01"),   # dup key, mojibake, neg, future
        (2, None, 30.0, "2015-01-01"),       # null, stale
        (3, "ok", 1000.0, "2026-02-01"),
    ]
    df = spark.createDataFrame(
        rows, "row_id int, note string, amount double, d string"
    ).withColumn("d", F.to_timestamp("d"))
    rep = quality.assess(df, key_col="row_id")
    assert rep.dimensions["completeness"] < 1.0
    assert rep.details["uniqueness"]["key_uniqueness"] == 0.75
    assert rep.details["consistency"]["mojibake_values"] == 1
    assert rep.details["timeliness"]["future_dates"] == 1
    assert rep.details["timeliness"]["stale_values"] == 1
    assert rep.details["accuracy"]["rule_violations"] >= 1  # negative amount
    assert rep.overall_score < 0.97
