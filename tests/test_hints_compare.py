"""Semantic hints contracts (reference semantic_hints.rs themes:
binding evidence, unknown-column error, inert-hint error) and report
compare()."""

from __future__ import annotations

import pytest

from dataprof_spark.operators import hints, profiler, quality
from dataprof_spark.sources import report


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a@x.com", "1", "u_1"),
        ("b@y.org", "2", "u_2"),
        ("not-an-email", "3", "u_3"),
    ]
    return spark.createDataFrame(rows, "email string, n string, uid string")


def test_hint_binds_with_evidence(df):
    out = hints.apply_hints(df, {"email": "email"})
    b = out[0]
    assert b.matched == 2 and b.non_null == 3
    assert b.ratio == pytest.approx(2 / 3)


def test_unknown_column_is_error(df):
    with pytest.raises(hints.HintError, match="unknown column"):
        hints.apply_hints(df, {"nope": "email"})


def test_unknown_hint_is_error(df):
    with pytest.raises(hints.HintError, match="unknown semantic hint"):
        hints.apply_hints(df, {"email": "quux"})


def test_inert_hint_is_error(df):
    with pytest.raises(hints.HintError, match="zero values"):
        hints.apply_hints(df, {"n": "email"})


def test_identifier_hint_binds_by_existence(df):
    out = hints.apply_hints(df, {"uid": "identifier"})
    assert out[0].hint == "identifier"


def test_report_compare(spark):
    a_df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    b_df = a_df.drop("o_orderpriority").withColumn(
        "new_col", a_df.o_totalprice * 0
    )
    rep_a = report.ProfileReport.from_profiles(
        "a", profiler.profile(a_df), quality.assess(a_df, "o_orderkey")
    )
    rep_b = report.ProfileReport.from_profiles(
        "b", profiler.profile(b_df), quality.assess(b_df, "o_orderkey")
    )
    diff = report.compare(rep_a, rep_b)
    assert diff["added_columns"] == ["new_col"]
    assert diff["removed_columns"] == ["o_orderpriority"]
    assert "o_orderkey" in diff["common_columns"]
    assert "overall_score" in diff["quality_deltas"]
