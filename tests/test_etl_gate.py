"""ETL quality-gate contract (reference etl_quality_gate.py:41-102):
a good batch passes, each defect class fails its specific check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprof_spark.operators import etl_gate

GOOD = [
    ("t1", "acc1", 100.0, "2026-01-05"),
    ("t2", "acc2", 250.5, "2026-01-06"),
    ("t3", "acc3", 99.99, "2026-01-07"),
    ("t4", "acc1", 12.0, "2026-01-08"),
]
SCHEMA = "transaction_id string, account string, amount_eur double, booked_at string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "booked_at", F.to_date("booked_at")
    )


def test_good_batch_accepted(spark):
    res = etl_gate.evaluate(
        _df(spark, GOOD),
        key_col="transaction_id",
        required_columns=["transaction_id", "account", "amount_eur"],
        positive_columns=["amount_eur"],
    )
    assert res.accepted, res.evidence
    assert all(res.checks.values())


def test_duplicate_key_rejected(spark):
    rows = GOOD + [("t1", "acc9", 5.0, "2026-01-09")]
    res = etl_gate.evaluate(
        _df(spark, rows), key_col="transaction_id",
        positive_columns=["amount_eur"],
    )
    assert not res.accepted
    assert not res.checks["key_unique_non_null"]


def test_negative_amount_rejected(spark):
    rows = GOOD + [("t5", "acc2", -10.0, "2026-01-09")]
    res = etl_gate.evaluate(
        _df(spark, rows), key_col="transaction_id",
        positive_columns=["amount_eur"],
    )
    assert not res.accepted
    assert not res.checks["no_negatives"]
    assert res.evidence["negatives"] == {"amount_eur": 1}


def test_non_numeric_positive_column_rejected(spark):
    """A positive_column stored as STRING gets no __neg agg inside
    assess() — the gate must flag it as unchecked rather than let it
    silently pass (ADVICE r2)."""
    res = etl_gate.evaluate(
        _df(spark, GOOD), key_col="transaction_id",
        positive_columns=["account"],  # string-typed
    )
    assert not res.checks["no_negatives"]
    assert res.evidence["positive_columns_not_numeric"] == ["account"]
    # while a clean NUMERIC positive column still passes
    ok = etl_gate.evaluate(
        _df(spark, GOOD), key_col="transaction_id",
        positive_columns=["amount_eur"],
    )
    assert ok.checks["no_negatives"]
    assert ok.evidence["positive_columns_not_numeric"] == []


def test_missing_column_rejected(spark):
    res = etl_gate.evaluate(
        _df(spark, GOOD), key_col="transaction_id",
        required_columns=["transaction_id", "not_there"],
    )
    assert not res.accepted
    assert res.evidence["missing_columns"] == ["not_there"]


def test_excess_missing_cells_rejected(spark):
    rows = GOOD + [
        ("t6", None, None, "2026-01-10"),
        ("t7", None, None, "2026-01-11"),
    ]
    res = etl_gate.evaluate(
        _df(spark, rows), key_col="transaction_id",
        max_missing_pct=5.0,
    )
    assert not res.accepted
    assert not res.checks["missing_cells"]


# ------------------------------------------------------------------
# Cardinality tiers through the quality/gate path (VERDICT r6 #4):
# a 100 TB sweep can opt the uniqueness distinct counts down to the
# coarse HLL (or off entirely in assess), with the profiler's
# 4-valued distinct_confidence provenance carried in the report.
# ------------------------------------------------------------------
def test_gate_coarse_tier_accepts_unique_keys(spark):
    res = etl_gate.evaluate(
        _df(spark, GOOD),
        key_col="transaction_id",
        positive_columns=["amount_eur"],
        cardinality="coarse",
    )
    assert res.accepted, res.evidence
    assert res.evidence["distinct_confidence"] == "coarse_hll"


def test_gate_coarse_tier_still_rejects_duplicate_keys(spark):
    # 25% duplicated keys is far outside the 2*rsd tolerance band
    rows = GOOD + [("t1", "acc9", 5.0, "2026-01-09")] * 2
    res = etl_gate.evaluate(
        _df(spark, rows), key_col="transaction_id",
        cardinality="coarse",
    )
    assert not res.checks["key_unique_non_null"], res.evidence


def test_gate_refuses_cardinality_off(spark):
    with pytest.raises(ValueError, match="coarse"):
        etl_gate.evaluate(
            _df(spark, GOOD), key_col="transaction_id",
            cardinality="off",
        )


def test_assess_cardinality_tiers(spark):
    from dataprof_spark.operators import quality

    df = _df(spark, GOOD)
    exact = quality.assess(df, key_col="transaction_id")
    assert exact.distinct_confidence == "exact"
    assert exact.details["uniqueness"]["distinct_confidence"] == "exact"

    coarse = quality.assess(
        df, key_col="transaction_id", cardinality="coarse"
    )
    assert coarse.distinct_confidence == "coarse_hll"
    assert coarse.confidence == "approx"
    # 4 distinct rows: HLL is exact at this cardinality, and the
    # overestimate clamp keeps the ratio in [0, 1]
    ku = coarse.details["uniqueness"]["key_uniqueness"]
    assert 0.9 <= ku <= 1.0

    off = quality.assess(
        df, key_col="transaction_id", cardinality="off"
    )
    assert off.distinct_confidence == "not_computed"
    assert off.dimensions["uniqueness"] is None
    assert off.details["uniqueness"] == {
        "distinct_confidence": "not_computed"
    }
    # None dimensions renormalize out — never counted as perfect
    assert 0.0 < off.overall_score <= 1.0

    with pytest.raises(ValueError, match="parity"):
        quality.assess(df, cardinality="bogus")
