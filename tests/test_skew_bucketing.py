"""Skew salting correctness + shuffle-shape, bucketed-join plan
(exchange elision) — the explicit scale levers of the north rule."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from dataprof_spark.operators import skew
from dataprof_spark.pipeline import fixtures
from dataprof_spark.sources import bucketing


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_domain_of_pathless_url(spark):
    df = spark.createDataFrame(
        [("https://example.com",), ("https://example.com/a/b",),
         ("http://x.org?q=1",)], "url string"
    )
    got = [r[0] for r in df.select(skew.domain_of(F.col("url"))).collect()]
    assert got == ["example.com", "example.com", "x.org"]


def test_salted_agg_matches_plain(spark):
    rows = fixtures.generate_pages(n=400)
    pages = fixtures.pages_df(spark, rows).withColumn(
        "domain", skew.domain_of(F.col("url"))
    ).withColumn("val", F.length("text").cast("double"))
    plain = {
        (r["domain"]): (r["cnt"], r["total"])
        for r in pages.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("val").alias("total"))
        .collect()
    }
    salted = {
        r["domain"]: (r["cnt"], r["total"])
        for r in skew.salted_count_sum(pages, "domain", "val").collect()
    }
    assert plain == salted
    # Zipf generator: the hottest domain must dominate (the skew we
    # are defending against actually exists in the fixture)
    top = max(v[0] for v in plain.values())
    assert top / sum(v[0] for v in plain.values()) > 0.15


def test_salt_is_deterministic(spark):
    rows = fixtures.generate_pages(n=100)
    pages = fixtures.pages_df(spark, rows)
    a = skew.with_salt(pages).select("url", "__salt").collect()
    b = skew.with_salt(pages.repartition(7)).select("url", "__salt").collect()
    assert {(r["url"], r["__salt"]) for r in a} == {
        (r["url"], r["__salt"]) for r in b
    }


def test_bucketed_join_elides_exchange(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    bucketing.write_bucketed(
        li.withColumnRenamed("l_orderkey", "okey"), "li_b", "okey", 4
    )
    bucketing.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "ord_b", "okey", 4
    )
    joined = bucketing.bucketed_join(
        spark, "li_b", "ord_b", "okey", force_merge=True
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides pre-bucketed → no shuffle
    # sanity: same result as the plain join
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == plain
