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
    spark: SparkSession, path: str, fmt: str | None, max_rows: int | None,
    csv_delimiter: str | None = None, csv_flexible: bool | None = None,
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
            spark, path, encoding=None, max_rows=max_rows,
            delimiter=csv_delimiter,
            # flexible=False → Strict/FAILFAST (reference csv_flexible)
            strict=(csv_flexible is False),
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


_VALID_METRIC_PACKS = {"schema", "statistics", "patterns", "quality"}


def profile(
    source: Any,
    *,
    spark: SparkSession | None = None,
    format: str | None = None,  # noqa: A002 — reference kwarg name
    max_rows: int | None = None,
    quality: bool = True,
    key_col: str | None = None,
    use_approx_percentiles: bool = False,
    cardinality: str = "parity",
    patterns: bool = False,
    metrics: list[str] | None = None,
    quality_dimensions: list[str] | None = None,
    locale: str | None = None,
    name: str | None = None,
    sampling: Any = None,
    positive_columns: list[str] | None = None,
    csv_delimiter: str | None = None,
    csv_flexible: bool | None = None,
    on_progress: Any = None,
    progress_interval_ms: int | None = None,
) -> ProfileReport:
    """Profile any supported source into a ProfileReport.

    ``quality=True`` adds the A19-A25 quality assessment;
    ``patterns=True`` additionally runs the PII/pattern detector
    sample pass (§2.8) and marks the report patterns_scanned.

    ``cardinality`` selects the distinct-count tier: "parity"
    (default — reference-precision HLL rsd=0.008 + exact follow-up
    ≤10k), "coarse" (one rsd=0.05 HLL pass, ~9× cheaper, provenance
    distinct_confidence="coarse_hll"), or "off" (no cardinality
    aggregates; distinct_count=None). See operators.profiler.profile.

    ``metrics`` selects metric packs (reference quality.rs:63-72 /
    Profiler.metrics, python/dataprof/__init__.py:1380-1396):
    "schema" (always included), "statistics", "patterns", "quality".
    An omitted pack contributes ZERO Spark aggregate expressions —
    e.g. metrics=["schema"] is one light agg job. ``metrics``
    overrides the ``quality``/``patterns`` booleans when given.
    ``quality_dimensions`` further narrows the quality pack to the
    named ISO 25012 dimensions (Profiler.quality_dimensions).
    ``sampling`` is either a callable ``df -> df`` or a dict
    ``{"stages": [...], "id_col": ...}`` routed through
    operators.sampling.multi_stage — applied BEFORE profiling.
    ``on_progress``/``progress_interval_ms`` attach a progress
    callback fed from SparkStatusTracker while the profile jobs run
    (reference Profiler.on_progress / progress_interval_ms)."""
    spark = spark or _default_spark()
    if metrics is not None:
        packs = {p.lower() for p in metrics}
        unknown = packs - _VALID_METRIC_PACKS
        if unknown:
            raise ValueError(
                f"Unknown metric packs: {sorted(unknown)}. "
                f"Valid packs: {sorted(_VALID_METRIC_PACKS)}"
            )
        packs.add("schema")  # always included (quality.rs:64)
        quality = "quality" in packs
        patterns = "patterns" in packs
    else:
        packs = {"schema", "statistics"} | (
            {"quality"} if quality else set()
        ) | ({"patterns"} if patterns else set())
    if quality_dimensions is not None and not quality:
        # fail loudly: narrowing a pass that will not run is a
        # request the caller thinks they made but did not
        raise ValueError(
            "quality_dimensions given but the quality pack is off "
            "(metrics without 'quality', or quality=False) — add "
            "'quality' to metrics or drop quality_dimensions"
        )
    meta: dict[str, Any] = {}
    if isinstance(source, str):
        df, meta = _load_path(
            spark, source, format, None,
            csv_delimiter=csv_delimiter, csv_flexible=csv_flexible,
        )
        name = name or os.path.basename(source)
    else:
        df = _to_df(spark, source)
        name = name or type(source).__name__
    if sampling is not None:
        if callable(sampling):
            df = sampling(df)
        elif isinstance(sampling, dict):
            from dataprof_spark.operators import sampling as _sampling

            df = _sampling.multi_stage(
                df, sampling["stages"], sampling["id_col"],
                seed=sampling.get("seed", 42),
            )
        else:
            raise TypeError(
                "sampling must be a callable df->df or a dict "
                "{'stages': [...], 'id_col': ...}"
            )
    # Centralized cap: limit(max_rows+1) + cache (apply_row_cap) so
    # (a) truncation provenance is exact — a source with exactly
    # max_rows rows is NOT reported truncated — and (b) the profiler,
    # quality, and pattern passes all see the SAME pinned row subset
    # (LocalLimit row selection is not stable across Spark jobs).
    cap = _readers.apply_row_cap(df, max_rows) if max_rows else None
    if cap:
        df = cap.df
    poller = None
    sink = None
    try:
        # progress setup sits INSIDE the try: a raising on_progress
        # callback must still release the cached capped DataFrame
        if on_progress is not None:
            from dataprof_spark.progress import (
                JobProgressPoller,
                ProgressSink,
            )

            sink = ProgressSink(
                callback=on_progress,
                min_interval_s=(progress_interval_ms or 500) / 1000.0,
            )
            sink.started()
            sink.schema([f.name for f in df.schema.fields])
            poller = JobProgressPoller(spark, sink)
            poller.__enter__()
        t0 = time.perf_counter()
        if "statistics" in packs:
            profiles = _profiler.profile(
                df, use_approx_percentiles=use_approx_percentiles,
                cardinality=cardinality,
            )
        else:
            # schema pack only: names/types/null counts, one agg job
            profiles = _profiler.profile_schema_only(df)
        qrep = None
        if quality:
            qrep = _quality.assess(
                df, key_col=key_col,
                use_approx_percentiles=use_approx_percentiles,
                dimensions=quality_dimensions,
                positive_columns=positive_columns,
                cardinality=cardinality,
            )
        patterns_scanned = False
        if patterns:
            from pyspark.sql import types as T

            from dataprof_spark.operators import patterns as _patterns

            meta["pattern_matches"] = {
                f.name: _patterns.detect_column_patterns(
                    df, f.name, locale=locale
                )
                for f in df.schema.fields
                if isinstance(f.dataType, T.StringType)
            }
            patterns_scanned = True
    finally:
        if poller is not None:
            poller.__exit__(None, None, None)
        if cap:
            cap.release()
    total = profiles[0].total_count if profiles else 0
    if sink is not None:
        sink.finished(total)
    execution = {
        "engine": "spark",
        "metric_packs": sorted(packs),
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


# ---------------------------------------------------------------- builder
class Profiler:
    """Builder-style profiler configuration — the reference's fluent
    chain (python/dataprof/__init__.py:1262-1408) over the Spark
    facade. Chainable methods accumulate settings; ``.profile(src)``
    runs.

    Example::

        report = Profiler().metrics(["schema", "quality"]) \\
            .quality_dimensions(["completeness"]).profile(df)
        report = Profiler().sampling({"stages": [("systematic",
            {"interval": 10})], "id_col": "id"}).profile("data.csv")

    Spark-first mapping notes (honest, recorded in the report):
    - ``engine``/``chunk_size``/``memory_limit_mb`` configure the
      reference's single-node streaming engines; Spark owns execution
      and memory, so these are validated, RECORDED in
      ``report.execution["requested_options"]``, and not applied.
    - ``stop_condition``/``stop_when``: a row-limit-only condition is
      applied as the exact row cap (same truncation provenance); a
      chunk-feedback condition (schema-stable, memory-pressure) has no
      chunk loop in a whole-stage Spark scan — it is applied through
      its row-limit component when it has one (e.g. the
      schema_inference preset caps at 10k) and recorded otherwise.
    - ``temporal_columns`` are recorded: Spark's timeliness dimension
      derives from actual date/timestamp column TYPES, which is
      strictly stronger than name hints.
    """

    _ENGINES = ("auto", "incremental", "columnar", "spark")

    def __init__(self) -> None:
        self._kwargs: dict[str, Any] = {}
        self._recorded: dict[str, Any] = {}

    # ---- applied settings -------------------------------------------
    def format(self, fmt: str) -> "Profiler":
        """Override format detection ("csv", "json", "parquet")."""
        self._kwargs["format"] = fmt
        return self

    def max_rows(self, n: int) -> "Profiler":
        """Set maximum rows to process (exact truncation provenance)."""
        self._kwargs["max_rows"] = n
        return self

    def name(self, name: str) -> "Profiler":
        """Set the source name used in the report."""
        self._kwargs["name"] = name
        return self

    def csv_delimiter(self, d: str) -> "Profiler":
        """Set single-character CSV delimiter (else autodetected)."""
        if len(d) != 1:
            raise ValueError("csv_delimiter must be a single character")
        self._kwargs["csv_delimiter"] = d
        return self

    def csv_flexible(self, flexible: bool) -> "Profiler":
        """Allow variable-length CSV records (PERMISSIVE vs FAILFAST)."""
        self._kwargs["csv_flexible"] = flexible
        return self

    def sampling(self, strategy: Any) -> "Profiler":
        """Set sampling: a callable ``df -> df`` or a dict
        ``{"stages": [...], "id_col": ...}`` (multi_stage grammar)."""
        self._kwargs["sampling"] = strategy
        return self

    def locale(self, locale: str) -> "Profiler":
        """Set locale for pattern detection (e.g. "IT", "US", "GB")."""
        self._kwargs["locale"] = locale
        return self

    def positive_columns(self, columns: list[str]) -> "Profiler":
        """Mark columns whose numeric values must be non-negative."""
        self._kwargs["positive_columns"] = list(columns)
        return self

    def identifier_columns(self, columns: list[str]) -> "Profiler":
        """Mark identifier columns; the first becomes the key-uniqueness
        column (key_col) of the quality pass."""
        cols = list(columns)
        if cols:
            self._kwargs["key_col"] = cols[0]
        self._recorded["identifier_columns"] = cols
        return self

    def quality_dimensions(self, dims: list[str]) -> "Profiler":
        """Select quality dimensions to evaluate (unselected ones
        contribute zero aggregate expressions)."""
        self._kwargs["quality_dimensions"] = list(dims)
        return self

    def metrics(self, packs: list[str]) -> "Profiler":
        """Select metric packs: "schema" (always included),
        "statistics", "patterns", "quality". Omitting a pack skips
        that computation entirely."""
        normalized = [p.lower() for p in packs]
        unknown = set(normalized) - _VALID_METRIC_PACKS
        if unknown:
            raise ValueError(
                f"Unknown metric packs: {sorted(unknown)}. "
                f"Valid packs: {sorted(_VALID_METRIC_PACKS)}"
            )
        self._kwargs["metrics"] = normalized
        return self

    def cardinality(self, tier: str) -> "Profiler":
        """Distinct-count tier: "parity" (reference-precision HLL +
        exact follow-up), "coarse" (rsd=0.05, ~9× cheaper), "off"
        (no cardinality aggregates, distinct_count=None)."""
        if tier not in ("parity", "coarse", "off"):
            raise ValueError(
                f"cardinality tier must be 'parity', 'coarse' or "
                f"'off', got {tier!r}"
            )
        self._kwargs["cardinality"] = tier
        return self

    def on_progress(self, cb: Any) -> "Profiler":
        """Set a progress callback (ProgressEvent consumer)."""
        self._kwargs["on_progress"] = cb
        return self

    def progress_interval_ms(self, ms: int) -> "Profiler":
        """Minimum interval between chunk progress events in ms."""
        self._kwargs["progress_interval_ms"] = ms
        return self

    def stop_condition(self, cond: Any) -> "Profiler":
        """Set an early-stop condition (operators.stop_conditions).
        Applied via its row-limit bound when it has one; recorded
        otherwise (no chunk loop in a whole-stage Spark scan)."""
        # the combinators compose their own bound (AnyOf: min of the
        # children; AllOf: max, or None when any child is unbounded —
        # rows alone can then never fire it). No fallback over
        # .conditions here: a min() over AllOf children would silently
        # truncate the profile in exactly the cases where None is the
        # correct answer.
        limit = None
        try:
            limit = cond.max_rows()
        except AttributeError:
            pass
        if limit is not None:
            self._kwargs["max_rows"] = limit
        self._recorded["stop_condition"] = repr(cond)
        return self

    def stop_when(self, condition: Any) -> "Profiler":
        """Stop condition from an object or shorthand string:
        "schema_stable", "schema_inference", "quality_sample"."""
        if isinstance(condition, str):
            from dataprof_spark.operators import stop_conditions as _sc

            factories = {
                "schema_stable": lambda: _sc.SchemaStable(1_000),
                "schema_inference": _sc.schema_inference,
                "quality_sample": _sc.quality_sample,
            }
            if condition not in factories:
                raise ValueError(
                    f"Unknown stop_when shorthand: {condition!r}. "
                    f"Valid shorthands: {sorted(factories)}"
                )
            condition = factories[condition]()
        return self.stop_condition(condition)

    # ---- recorded-only settings (Spark owns execution) ---------------
    def engine(self, engine: str) -> "Profiler":
        """Reference engines: "auto"/"incremental"/"columnar". Spark
        is the engine here; the request is validated and recorded."""
        if engine not in self._ENGINES:
            raise ValueError(
                f"unknown engine {engine!r}; valid: {self._ENGINES}"
            )
        self._recorded["requested_engine"] = engine
        return self

    def chunk_size(self, n: int) -> "Profiler":
        """Streaming chunk size — Spark sizes partitions itself
        (spark.sql.files.maxPartitionBytes); recorded."""
        self._recorded["chunk_size"] = n
        return self

    def memory_limit_mb(self, mb: int) -> "Profiler":
        """Memory budget — Spark executors manage memory; recorded."""
        self._recorded["memory_limit_mb"] = mb
        return self

    def temporal_columns(self, columns: list[str]) -> "Profiler":
        """Recorded: Spark timeliness derives from column TYPES."""
        self._recorded["temporal_columns"] = list(columns)
        return self

    # ---- terminal ----------------------------------------------------
    def profile(self, source: Any) -> ProfileReport:
        """Profile the source with the accumulated settings."""
        report = profile(source, **self._kwargs)
        if self._recorded:
            report.execution["requested_options"] = dict(self._recorded)
        return report

    def __repr__(self) -> str:
        settings = ", ".join(
            f"{k}={v!r}"
            for k, v in {**self._kwargs, **self._recorded}.items()
        )
        return f"Profiler({settings})"
