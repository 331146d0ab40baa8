"""Schema-stability / drift tracking for streams (reference
SchemaStabilityTracker, dataprof-core/src/stop_condition.rs:313-355 +
column_type_fingerprint, dataprof-runtime/src/streaming_stats.rs:617-634).

The reference hashes each column's *inferred* type after every chunk
and counts consecutive rows with an unchanged fingerprint — both as a
stop condition ("schema stable for N rows → enough profiling") and as
a drift alarm (fingerprint changed → the upstream producer changed
shape). Recast for Structured Streaming: the fingerprint is computed
per micro-batch inside ``foreachBatch`` with ONE aggregation job (the
same try_cast success-ratio inference the batch profiler uses), and
the tracker accumulates stable-row counts across batches.

At scale this adds one tiny agg per micro-batch — no state store, no
shuffle beyond the aggregation's own partial/final step.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_batch_types(df: DataFrame) -> dict[str, str]:
    """Inferred type per column in ONE agg job.

    Native non-string types map directly; string columns run the
    profiler's inference rules (inference.rs:33-96) as success-ratio
    aggregates: 100% i64 → integer, >80% finite f64 → float, ≥90%
    strict bool → boolean, else string.
    """
    from dataprof_spark.functions import exprs

    out: dict[str, str] = {}
    aggs = []
    str_cols = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.StringType):
            str_cols.append(f_.name)
            nn = F.when(~exprs.nulllike(F.col(f_.name)), F.col(f_.name))
            # regex probes, not try_cast — exception-driven parse
            # failures cost ~30x on all-non-numeric columns (same
            # change as the batch profiler, r3)
            aggs += [
                F.avg(
                    F.trim(nn).rlike("^[+-]?[0-9]+$").cast("double")
                ).alias(f"{f_.name}__int"),
                F.avg(
                    F.trim(nn).rlike(
                        "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)"
                        "([eE][+-]?[0-9]+)?$"
                    ).cast("double")
                ).alias(f"{f_.name}__float"),
                F.avg(
                    F.lower(F.trim(nn)).isin("true", "false")
                    .cast("double")
                ).alias(f"{f_.name}__bool"),
            ]
        else:
            out[f_.name] = f_.dataType.simpleString()
    if str_cols:
        row = df.agg(*aggs).collect()[0].asDict()
        for n in str_cols:
            int_r = row[f"{n}__int"] or 0.0
            float_r = row[f"{n}__float"] or 0.0
            bool_r = row[f"{n}__bool"] or 0.0
            if int_r == 1.0:
                out[n] = "integer"
            elif float_r > 0.8:
                out[n] = "float"
            elif bool_r >= 0.9:
                out[n] = "boolean"
            else:
                out[n] = "string"
    return out


def schema_fingerprint(types: dict[str, str]) -> int:
    """Order-independent 64-bit fingerprint of (name, inferred type)
    pairs (streaming_stats.rs column_type_fingerprint)."""
    h = hashlib.sha256()
    for name in sorted(types):
        h.update(name.encode())
        h.update(b"\x00")
        h.update(types[name].encode())
        h.update(b"\x01")
    return int.from_bytes(h.digest()[:8], "big")


@dataclass
class DriftEvent:
    batch_id: int
    rows: int
    fingerprint: int
    changed_columns: dict[str, tuple[str | None, str]]


@dataclass
class SchemaStabilityTracker:
    """Python twin of stop_condition.rs:318-355: consecutive rows with
    an unchanged fingerprint, threshold-triggered."""

    threshold: int
    consecutive_stable: int = 0
    last_fingerprint: int | None = None
    last_types: dict[str, str] = field(default_factory=dict)
    drift_events: list[DriftEvent] = field(default_factory=list)

    def update(self, fingerprint: int, chunk_rows: int,
               types: dict[str, str] | None = None,
               batch_id: int = -1) -> bool:
        """True when the accumulated stable-row count reaches the
        threshold. A changed fingerprint RESETS the counter to this
        chunk's rows (stop_condition.rs:338-349) and records a drift
        event with the per-column before→after types."""
        if self.last_fingerprint == fingerprint:
            self.consecutive_stable += chunk_rows
        else:
            if self.last_fingerprint is not None and types is not None:
                changed = {
                    n: (self.last_types.get(n), t)
                    for n, t in types.items()
                    if self.last_types.get(n) != t
                }
                removed = {
                    n: (t, "<absent>")
                    for n, t in self.last_types.items()
                    if n not in types
                }
                self.drift_events.append(
                    DriftEvent(
                        batch_id=batch_id,
                        rows=chunk_rows,
                        fingerprint=fingerprint,
                        changed_columns={**changed, **removed},
                    )
                )
            self.consecutive_stable = chunk_rows
            self.last_fingerprint = fingerprint
        if types is not None:
            self.last_types = dict(types)
        return self.consecutive_stable >= self.threshold

    @property
    def stable(self) -> bool:
        return self.consecutive_stable >= self.threshold

    def truncation_reason(self) -> str:
        return f"schema_stable({self.threshold})"


def monitor(stream: DataFrame, tracker: SchemaStabilityTracker,
            **writer_kwargs):
    """Attach the tracker to a streaming DataFrame via foreachBatch.

    Returns the started StreamingQuery. Each micro-batch costs one
    count + one inference agg; drift events accumulate on the tracker
    (driver-side — the lineage sink for them is the caller's choice).
    """

    def _on_batch(batch_df: DataFrame, batch_id: int):
        rows = batch_df.count()
        if rows == 0:
            return
        types = infer_batch_types(batch_df)
        tracker.update(
            schema_fingerprint(types), rows, types=types,
            batch_id=batch_id,
        )

    writer = stream.writeStream.foreachBatch(_on_batch).outputMode(
        "append"
    )
    for k, v in writer_kwargs.items():
        writer = writer.option(k, v)
    return writer.start()


def run_until_stable(
    stream: DataFrame,
    tracker: SchemaStabilityTracker,
    poll_seconds: float = 0.5,
    timeout_seconds: float = 120.0,
    **writer_kwargs,
) -> bool:
    """SchemaStable STOP CONDITION (stop_condition.rs:21-51): keep
    consuming micro-batches until the inferred schema has been stable
    for `tracker.threshold` consecutive rows, then stop the query —
    the reference's 'enough profiling' early exit, recast for
    streams. Returns whether stability was reached (False = the
    timeout elapsed first; the query is stopped either way)."""
    import time as _time

    q = monitor(stream, tracker, **writer_kwargs)
    deadline = _time.time() + timeout_seconds
    try:
        while _time.time() < deadline and q.isActive:
            if tracker.stable:
                break
            _time.sleep(poll_seconds)
    finally:
        if q.isActive:
            q.stop()
    return tracker.stable
