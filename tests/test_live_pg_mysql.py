"""Live Postgres/MySQL sampling-pushdown round trips — env-gated.

The reference runs 54 integration tests against real PG/MySQL servers
(tests/database_integration.rs). This sandbox has neither a server
nor the JDBC driver jars, so the PG/MySQL dialects are covered by
SQL string contracts + DuckDB execution (test_db_sampling) and the
live-JDBC mechanics by embedded Derby. These tests are the
flip-is-free counterpart (the PIL/fastText/Iceberg gating pattern):
point DATAPROF_PG_JDBC_URL / DATAPROF_MYSQL_JDBC_URL at a reachable
server (with the driver jar on the Spark classpath and, if needed,
DATAPROF_{PG,MYSQL}_JDBC_{USER,PASSWORD}) and the SAME
read_db_sample path runs live — TABLESAMPLE pushdown included — with
no code change.
"""

from __future__ import annotations

import os

import pytest

from dataprof_spark.sources import db

_PG_URL = os.environ.get("DATAPROF_PG_JDBC_URL")
_MY_URL = os.environ.get("DATAPROF_MYSQL_JDBC_URL")


def _opts(prefix: str) -> dict:
    out = {}
    if os.environ.get(f"DATAPROF_{prefix}_JDBC_USER"):
        out["user"] = os.environ[f"DATAPROF_{prefix}_JDBC_USER"]
    if os.environ.get(f"DATAPROF_{prefix}_JDBC_PASSWORD"):
        out["password"] = os.environ[f"DATAPROF_{prefix}_JDBC_PASSWORD"]
    return out


def _seed_table(spark, url: str, opts: dict) -> str:
    """CREATE + populate a small table through Spark's own JDBC writer
    (no server-side assumptions beyond CREATE/INSERT/SELECT)."""
    from pyspark.sql import functions as F

    name = "dataprof_live_smoke"
    df = spark.range(500).select(
        F.col("id").alias("id"),
        (F.col("id") * 1.5).alias("val"),
        (F.col("id") % 5).cast("string").alias("grp"),
    )
    df.write.mode("overwrite").jdbc(url, name, properties=opts)
    return name


@pytest.mark.skipif(not _PG_URL, reason="DATAPROF_PG_JDBC_URL not set")
def test_live_postgres_sampling_pushdown(spark):
    opts = _opts("PG")
    table = _seed_table(spark, _PG_URL, opts)
    # reservoir emits ANSI TABLESAMPLE — the pushdown PG executes
    # natively (the 'ansi' dialect IS the reference's PG/MySQL SQL)
    cfg = db.SamplingConfig(
        strategy="reservoir", sample_size=50, seed=7, dialect="ansi"
    )
    q = cfg.generate_sample_query(table, 500)
    assert "TABLESAMPLE" in q.upper()
    got = db.read_db_sample(spark, _PG_URL, table, cfg, **opts)
    n = got.count()
    assert 0 < n <= 500
    assert {"id", "val", "grp"} <= {c.lower() for c in got.columns}
    # stratified uses ordered window functions — PG supports them live
    cfg2 = db.SamplingConfig(
        strategy="stratified", stratify_column="grp",
        sample_size=25, dialect="ansi",
    )
    got2 = db.read_db_sample(
        spark, _PG_URL, table, cfg2, total_rows=500, **opts
    )
    assert got2.count() > 0


@pytest.mark.skipif(not _MY_URL, reason="DATAPROF_MYSQL_JDBC_URL not set")
def test_live_mysql_sampling_roundtrip(spark):
    opts = _opts("MYSQL")
    table = _seed_table(spark, _MY_URL, opts)
    # systematic = ROW_NUMBER() OVER () % step — ANSI, runs on MySQL 8+
    cfg = db.SamplingConfig(
        strategy="systematic", sample_size=50, dialect="ansi"
    )
    got = db.read_db_sample(spark, _MY_URL, table, cfg, **opts)
    assert got.count() == 50
    assert db.count_table_rows(spark, _MY_URL, table, **opts) == 500
