"""Async API twins — the reference's ``dataprof.asyncio`` module and
async database helpers (python/dataprof/asyncio.py,
python/tests/test_python_api.py:1680-1722 export contract:
analyze_database_async / count_table_rows_async /
get_table_schema_async / test_connection_async) recast for Spark.

Spark actions are blocking JVM calls, so the idiomatic Python-side
async surface is ``asyncio.to_thread``: the awaitable yields the event
loop while the Spark job runs in a worker thread (py4j is
thread-safe; concurrent jobs from multiple threads are a supported
Spark pattern). No result differences vs the sync twins — same code
runs, same session.

Example::

    import asyncio
    from dataprof_spark.asyncio import profile_file

    async def main():
        report = await profile_file("data.csv")

    asyncio.run(main())
"""

from __future__ import annotations

import asyncio as _aio
from typing import Any


async def test_connection_async(
    spark, jdbc_url: str, timeout_s: int = 5, driver: str | None = None
) -> bool:
    """Awaitable twin of sources.db.test_connection (reference
    database_async.rs:112-145): open, validate, close; False on any
    failure."""
    from dataprof_spark.sources import db as _db

    return await _aio.to_thread(
        _db.test_connection, spark, jdbc_url, timeout_s, driver
    )


async def get_table_schema_async(
    spark, jdbc_url: str, table: str, **jdbc_options
) -> list[str]:
    """Awaitable twin of sources.db.table_schema (reference
    get_table_schema_async, database_async.rs:172-199)."""
    from dataprof_spark.sources import db as _db

    return await _aio.to_thread(
        lambda: _db.table_schema(spark, jdbc_url, table, **jdbc_options)
    )


async def count_table_rows_async(
    spark, jdbc_url: str, table: str, **jdbc_options
) -> int:
    """Awaitable twin of sources.db.count_table_rows — one scalar
    COUNT(*) crosses the wire."""
    from dataprof_spark.sources import db as _db

    return await _aio.to_thread(
        lambda: _db.count_table_rows(spark, jdbc_url, table, **jdbc_options)
    )


async def read_db_sample_async(
    spark, jdbc_url: str, base: str, config=None,
    total_rows: int | None = None, **jdbc_options,
):
    """Awaitable twin of sources.db.read_db_sample: the generated
    sample query is pushed server-side; only the sample crosses."""
    from dataprof_spark.sources import db as _db

    return await _aio.to_thread(
        lambda: _db.read_db_sample(
            spark, jdbc_url, base, config=config, total_rows=total_rows,
            **jdbc_options,
        )
    )


async def analyze_database_async(
    spark, jdbc_url: str, base: str, config=None,
    total_rows: int | None = None, jdbc_options: dict | None = None,
    **profile_opts,
):
    """Awaitable twin of the reference's analyze_database_async:
    sampled JDBC read (sampling pushed to the engine) followed by a
    full profile of the sample — returns a ProfileReport."""
    from dataprof_spark import facade as _facade
    from dataprof_spark.sources import db as _db

    def _run():
        df = _db.read_db_sample(
            spark, jdbc_url, base, config=config, total_rows=total_rows,
            **(jdbc_options or {}),
        )
        return _facade.profile(df, spark=spark, **profile_opts)

    return await _aio.to_thread(_run)


async def profile_file(path: str, **opts: Any):
    """Awaitable twin of facade.profile for a path source (reference
    asyncio.profile_file)."""
    from dataprof_spark import facade as _facade

    return await _aio.to_thread(lambda: _facade.profile(path, **opts))


async def analyze_structure_async(path: str, max_rows: int | None = None):
    """Awaitable twin of facade.analyze_structure — the bounded
    driver-side first pass (reference infer_schema_stream /
    quick_row_count_stream territory, path-based here)."""
    from dataprof_spark import facade as _facade

    return await _aio.to_thread(
        _facade.analyze_structure, path, max_rows
    )
