"""Sampling strategies: determinism across partition layouts, exact-n,
stratified-k, systematic, importance."""

from __future__ import annotations

import pytest

from dataprof_spark.operators import sampling

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").cache()


def test_systematic(orders):
    got = sampling.systematic(orders, 10, "o_orderkey")
    assert all(
        r["o_orderkey"] % 10 == 0 for r in got.select("o_orderkey").collect()
    )


def test_hash_sample_deterministic_across_layouts(orders):
    a = sampling.hash_sample(orders, 0.2, "o_orderkey")
    b = sampling.hash_sample(orders.repartition(7), 0.2, "o_orderkey")
    ka = sorted(r["o_orderkey"] for r in a.select("o_orderkey").collect())
    kb = sorted(r["o_orderkey"] for r in b.select("o_orderkey").collect())
    assert ka == kb  # partition-layout independence
    n = orders.count()
    assert 0.1 * n < len(ka) < 0.3 * n  # ~fraction


def test_exact_n_sample(orders):
    got = sampling.exact_n_sample(orders, 50, "o_orderkey")
    keys1 = [r["o_orderkey"] for r in got.collect()]
    keys2 = [
        r["o_orderkey"]
        for r in sampling.exact_n_sample(
            orders.repartition(5), 50, "o_orderkey"
        ).collect()
    ]
    assert len(keys1) == 50
    assert sorted(keys1) == sorted(keys2)


def test_stratified_first_k(orders):
    got = sampling.stratified_first_k(
        orders, ["o_orderstatus"], 5, "o_orderkey"
    )
    counts = got.groupBy("o_orderstatus").count().collect()
    assert all(r["count"] <= 5 for r in counts)


def test_importance_filter(orders):
    got = sampling.importance(orders, "o_totalprice", 100000.0)
    assert got.filter("o_totalprice < 100000").count() == 0
