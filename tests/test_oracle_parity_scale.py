"""Replicates the driver's correctness gate at ITS scale (sf0.1) for
every query whose output contains a sum/avg over doubles — the class
that produced round 2's only red row (sessionize_events_batch: a
float-summation last-digit flip that only appears at sf0.1, never at
sf0.01). After the DECIMAL(27,6) hardening these must hash-match at
any scale; this test pins that at the driver's own scale factor.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from dataprof_spark import queries

SF_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# every registry query carrying an order-sensitive double aggregate
FLOAT_SUM_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "sessionize_events_batch",
    "events_hourly",
    "rollup_order_totals",
    "window_supplier_running",
    # not a float-sum shape, but new in r4 and driver-facing: pin the
    # synthesized-clone demotion pipeline at the driver's scale too
    "dedup_demotion_decisions",
    # retired from the driver window but still shipped:
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q22_idle_customers",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 fixtures not generated"
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = (
                pd.to_datetime(df[c])
                .dt.tz_localize(None)
                .astype("datetime64[us]")
                .astype(str)
            )
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FLOAT_SUM_QUERIES)
def test_float_sum_query_matches_oracle_at_driver_sf(spark, ddb, name):
    fn, sql = queries.full_registry()[name]
    got = _normalize(fn(spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(sql).df())
    assert len(got) == len(want), (name, len(got), len(want))
    # exact equality post-round: this IS the driver's hash criterion
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
