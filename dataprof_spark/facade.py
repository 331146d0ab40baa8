"""Top-level ``profile(source)`` facade — the reference's main entry
point (python/dataprof/__init__.py:987-1260 `dp.profile`, Rust facade
profiler.rs:316-357) recast over Spark.

Source-type dispatch, mirroring the reference's:
- path string → format by extension (override with ``format=``):
  .csv/.tsv → robust CSV (delimiter + encoding autodetect),
  .json/.jsonl/.ndjson → JSONL reader (Skip policy),
  .parquet → native parquet scan.
  Missing files fail fast (NotFound check, profiler.rs:328-333);
  unsupported extensions are REJECTED, not ignored (:516-552).
- pandas DataFrame → Arrow-accelerated createDataFrame
- pyarrow Table → via pandas
- list of dicts / dict of lists → createDataFrame
- Spark DataFrame → used as-is

Output: a ProfileReport (sources/report.py) with per-column profiles,
optional quality assessment, and execution metadata (rows, columns,
scan seconds, engine, truncation provenance when ``max_rows`` hit).
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dataprof_spark.operators import profiler as _profiler
from dataprof_spark.operators import quality as _quality
from dataprof_spark.sources import readers as _readers
from dataprof_spark.sources.report import ProfileReport

_CSV_EXTS = (".csv", ".tsv")
_JSON_EXTS = (".json", ".jsonl", ".ndjson")
_PARQUET_EXTS = (".parquet", ".pq")


def _default_spark() -> SparkSession:
    from dataprof_spark.session import get_spark

    return get_spark()


def _load_path(
    spark: SparkSession, path: str, fmt: str | None, max_rows: int | None
) -> tuple[DataFrame, dict]:
    if not os.path.exists(path):
        raise FileNotFoundError(f"source not found: {path}")
    ext = os.path.splitext(path)[1].lower()
    fmt = fmt or (
        "csv" if ext in _CSV_EXTS
        else "json" if ext in _JSON_EXTS
        else "parquet" if ext in _PARQUET_EXTS
        else None
    )
    if fmt == "csv":
        res = _readers.read_csv_robust(
            spark, path, encoding=None, max_rows=max_rows
        )
        return res.df, {"format": "csv", **res.options}
    if fmt == "json":
        res = _readers.read_jsonl(spark, path, max_rows=max_rows)
        return res.df, {"format": "json", **res.options}
    if fmt == "parquet":
        df = spark.read.parquet(path)
        if max_rows:
            df = df.limit(max_rows)
        return df, {"format": "parquet"}
    raise ValueError(
        f"unsupported source extension {ext!r} for {path!r}; pass "
        "format='csv'|'json'|'parquet' to override (the reference "
        "rejects rather than guesses, profiler.rs:516-552)"
    )


def _to_df(spark: SparkSession, source: Any) -> DataFrame:
    if isinstance(source, DataFrame):
        return source
    try:
        import pandas as pd

        if isinstance(source, pd.DataFrame):
            return spark.createDataFrame(source)
    except ImportError:
        pass
    try:
        import pyarrow as pa

        if isinstance(source, pa.Table):
            return spark.createDataFrame(source.to_pandas())
    except ImportError:
        pass
    if isinstance(source, list) and source and isinstance(source[0], dict):
        return spark.createDataFrame(source)
    if isinstance(source, dict):
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame(source))
    raise TypeError(
        f"unsupported source type {type(source).__name__}: expected "
        "path str, Spark/pandas DataFrame, pyarrow Table, list of "
        "dicts, or dict of lists"
    )


def analyze_structure(path: str, max_rows: int | None = None):
    """Bounded-scan structure report — the reference's cheap first
    pass (`dataprof-partial/src/lib.rs:63-180` analyze_structure):
    format/delimiter/encoding diagnosis, exact-or-estimated row count,
    per-column structural summaries from a ≤ max_rows sample. No
    Spark job: the pass is bounded by construction, so it runs
    driver-side (sources/structure.py); use profile() for the full
    distributed pass once the structure is known."""
    from dataprof_spark.sources import structure as _structure

    return _structure.analyze_structure(path, max_rows=max_rows)


def list_patterns(locale: str | None = None) -> list[dict[str, Any]]:
    """Enumerate the built-in pattern detectors (reference
    `dataprof-python/src/lib.rs` list_patterns export): name, regex,
    category, specificity, locale, min report threshold, and whether
    a checksum validator backs it. locale filters to patterns valid
    for that locale (locale-neutral ones always included)."""
    from dataprof_spark.core.patterns import PATTERN_DEFS

    return [
        {
            "name": d.name,
            "regex": d.regex,
            "category": d.category,
            "specificity": d.specificity,
            "locale": d.locale,
            "min_threshold": d.min_threshold,
            "has_validator": d.validator is not None,
        }
        for d in PATTERN_DEFS
        if locale is None or d.locale is None or d.locale == locale
    ]


def analyze_to_arrow(source: Any, **opts):
    """Profile a source and return the per-column statistics as a
    pyarrow Table — the reference's analyze_csv_to_arrow /
    analyze_parquet_to_arrow (arrow_export.rs:308-340) unified behind
    the facade's format dispatch: zero-copy hand-off of the ANALYSIS
    RESULTS to pandas/polars, not of the data."""
    return profile(source, **opts).to_arrow()


def profile(
    source: Any,
    *,
    spark: SparkSession | None = None,
    format: str | None = None,  # noqa: A002 — reference kwarg name
    max_rows: int | None = None,
    quality: bool = True,
    key_col: str | None = None,
    use_approx_percentiles: bool = False,
    patterns: bool = False,
) -> ProfileReport:
    """Profile any supported source into a ProfileReport.

    ``quality=True`` adds the A19-A25 quality assessment;
    ``patterns=True`` additionally runs the PII/pattern detector
    sample pass (§2.8) and marks the report patterns_scanned."""
    spark = spark or _default_spark()
    meta: dict[str, Any] = {}
    if isinstance(source, str):
        df, meta = _load_path(spark, source, format, None)
        name = os.path.basename(source)
    else:
        df = _to_df(spark, source)
        name = type(source).__name__
    # Centralized cap: limit(max_rows+1) + cache (apply_row_cap) so
    # (a) truncation provenance is exact — a source with exactly
    # max_rows rows is NOT reported truncated — and (b) the profiler,
    # quality, and pattern passes all see the SAME pinned row subset
    # (LocalLimit row selection is not stable across Spark jobs).
    cap = _readers.apply_row_cap(df, max_rows) if max_rows else None
    if cap:
        df = cap.df
    try:
        t0 = time.perf_counter()
        profiles = _profiler.profile(
            df, use_approx_percentiles=use_approx_percentiles
        )
        qrep = None
        if quality:
            qrep = _quality.assess(
                df, key_col=key_col,
                use_approx_percentiles=use_approx_percentiles,
            )
        patterns_scanned = False
        if patterns:
            from pyspark.sql import types as T

            from dataprof_spark.operators import patterns as _patterns

            meta["pattern_matches"] = {
                f.name: _patterns.detect_column_patterns(df, f.name)
                for f in df.schema.fields
                if isinstance(f.dataType, T.StringType)
            }
            patterns_scanned = True
    finally:
        if cap:
            cap.release()
    total = profiles[0].total_count if profiles else 0
    execution = {
        "engine": "spark",
        "rows_processed": total,
        "columns_detected": len(profiles),
        "scan_time_sec": round(time.perf_counter() - t0, 3),
        "truncated": bool(cap and cap.truncated),
        "truncation_reason": (
            f"max_rows({max_rows})" if cap and cap.truncated else None
        ),
        **meta,
    }
    return ProfileReport.from_profiles(
        name, profiles, quality_report=qrep, execution=execution,
        patterns_scanned=patterns_scanned,
    )
