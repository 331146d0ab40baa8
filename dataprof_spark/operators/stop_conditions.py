"""Composable stop conditions (reference parity:
crates/dataprof-core/src/stop_condition.rs:14-117).

The reference stops a streaming single-node profile mid-file; the
Spark recast stops an INCREMENTAL multi-file profile between chunks,
where a chunk is the natural Spark granularity — one input file (or
one microbatch). The condition algebra and its two subtle contracts
are ported exactly:

- ``max_rows()``: the row count at which the condition can first fire
  on rows alone — ``Any`` takes the MIN of row-triggerable children,
  ``All`` the MAX and is None if any child is not row-triggerable
  (and an empty ``All`` never fires).
- ``is_row_limit_only()``: whether a parser that can only cap rows
  may enforce this condition without a real evaluator.

SchemaStable delegates to the existing drift tracker
(streaming/drift.py); MemoryPressure is evaluated from a caller-fed
fraction (Spark executors manage their own memory — the knob exists
for API parity and is fed from the driver's view when used).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class StopCondition:
    """Base — see subclasses. evaluate() returns a truncation-reason
    string when the condition fires, else None."""

    def evaluate(self, state: "StopState") -> str | None:
        raise NotImplementedError

    def max_rows(self) -> int | None:
        return None

    def is_row_limit_only(self) -> bool:
        return False


@dataclass
class StopState:
    rows: int = 0
    bytes: int = 0
    memory_fraction: float = 0.0
    estimated_total_rows: int | None = None
    consecutive_stable_rows: int = 0


@dataclass
class Never(StopCondition):
    def evaluate(self, state: StopState) -> str | None:
        return None

    def is_row_limit_only(self) -> bool:
        return True  # vacuously: it never needs an evaluator


@dataclass
class MaxRows(StopCondition):
    limit: int

    def evaluate(self, state: StopState) -> str | None:
        return f"max_rows({self.limit})" if state.rows >= self.limit else None

    def max_rows(self) -> int | None:
        return self.limit

    def is_row_limit_only(self) -> bool:
        return True


@dataclass
class MaxBytes(StopCondition):
    limit: int

    def evaluate(self, state: StopState) -> str | None:
        return (
            f"max_bytes({self.limit})" if state.bytes >= self.limit else None
        )


@dataclass
class SchemaStable(StopCondition):
    consecutive_stable_rows: int = 1000

    def evaluate(self, state: StopState) -> str | None:
        if state.consecutive_stable_rows >= self.consecutive_stable_rows:
            return f"schema_stable({self.consecutive_stable_rows})"
        return None


@dataclass
class ConfidenceThreshold(StopCondition):
    """Fires when rows/estimated_total >= threshold. Inert without an
    estimate (stop_condition.rs:27-31). Threshold clamped to [0, 1]."""

    threshold: float

    def __post_init__(self):
        self.threshold = min(1.0, max(0.0, self.threshold))

    def evaluate(self, state: StopState) -> str | None:
        if not state.estimated_total_rows:
            return None
        if state.rows / state.estimated_total_rows >= self.threshold:
            return f"confidence({self.threshold})"
        return None


@dataclass
class MemoryPressure(StopCondition):
    threshold: float

    def __post_init__(self):
        self.threshold = min(1.0, max(0.0, self.threshold))

    def evaluate(self, state: StopState) -> str | None:
        if state.memory_fraction >= self.threshold:
            return f"memory_pressure({self.threshold})"
        return None


@dataclass
class AnyOf(StopCondition):
    conditions: list[StopCondition] = field(default_factory=list)

    def evaluate(self, state: StopState) -> str | None:
        for c in self.conditions:
            r = c.evaluate(state)
            if r is not None:
                return r
        return None

    def max_rows(self) -> int | None:
        caps = [c.max_rows() for c in self.conditions]
        caps = [c for c in caps if c is not None]
        return min(caps) if caps else None

    def is_row_limit_only(self) -> bool:
        return all(c.is_row_limit_only() for c in self.conditions)


@dataclass
class AllOf(StopCondition):
    conditions: list[StopCondition] = field(default_factory=list)

    def evaluate(self, state: StopState) -> str | None:
        if not self.conditions:
            return None  # empty All never fires (reference contract)
        reasons = [c.evaluate(state) for c in self.conditions]
        if all(r is not None for r in reasons):
            return "all(" + ", ".join(reasons) + ")"
        return None

    def max_rows(self) -> int | None:
        if not self.conditions:
            return None
        best = 0
        for c in self.conditions:
            cap = c.max_rows()
            if cap is None:
                return None  # a child rows alone can't fire → no bound
            best = max(best, cap)
        return best

    def is_row_limit_only(self) -> bool:
        return all(c.is_row_limit_only() for c in self.conditions)


# ----------------------------------------------------------- presets
def schema_inference() -> StopCondition:
    """stop_condition.rs:46-55: 10k rows OR schema stable for 1k."""
    return AnyOf([MaxRows(10_000), SchemaStable(1_000)])


def quality_sample() -> StopCondition:
    """stop_condition.rs:57-64: 50k rows, 50 MB, or 95% confidence."""
    return AnyOf([
        MaxRows(50_000),
        MaxBytes(50 * 1024 * 1024),
        ConfidenceThreshold(0.95),
    ])


# ---------------------------------------------------------- evaluator
class StopEvaluator:
    """Mutable runtime checker (stop_condition.rs:130-216): feed it
    per-chunk counters; once triggered it stays triggered."""

    def __init__(self, condition: StopCondition,
                 estimated_total_rows: int | None = None):
        self.condition = condition
        self.state = StopState(estimated_total_rows=estimated_total_rows)
        self.triggered_reason: str | None = None

    def update(self, chunk_rows: int, chunk_bytes: int = 0,
               memory_fraction: float = 0.0,
               schema_changed: bool = False) -> bool:
        self.state.rows += chunk_rows
        self.state.bytes += chunk_bytes
        self.state.memory_fraction = memory_fraction
        if schema_changed:
            self.state.consecutive_stable_rows = 0
        else:
            self.state.consecutive_stable_rows += chunk_rows
        if self.triggered_reason is not None:
            return True
        self.triggered_reason = self.condition.evaluate(self.state)
        return self.triggered_reason is not None

    @property
    def should_stop(self) -> bool:
        return self.triggered_reason is not None


def profile_files_incrementally(
    spark,
    paths: list[str],
    condition: StopCondition,
    reader=None,
    estimated_total_rows: int | None = None,
    progress_sink=None,
):
    """Chunk-at-a-time incremental profile driver: one FILE per chunk
    (Spark's natural streaming granularity — also what
    maxFilesPerTrigger microbatching yields). Stops BETWEEN chunks
    when the condition fires, returning the union DataFrame of the
    consumed prefix plus provenance — the exact contract of the
    reference's chunked engine, including "a condition met on the
    last chunk is not a truncation" (files never read are the only
    truncation evidence).

    Scale note: this is the incremental/early-stop path for
    profiling; a full-corpus query should just `spark.read` the whole
    glob and let Catalyst parallelize.
    """
    import os

    from dataprof_spark.streaming import drift

    reader = reader or (lambda p: spark.read.parquet(p))
    ev = StopEvaluator(condition, estimated_total_rows)
    consumed = []
    prev_fp = None
    stopped_early = False
    if progress_sink:
        # reference ProgressEvent lifecycle: Started once before data
        progress_sink.started(estimated_total_rows=estimated_total_rows)
    for i, p in enumerate(paths):
        df = reader(p)
        consumed.append(df)
        fp = drift.schema_fingerprint(drift.infer_batch_types(df))
        changed = prev_fp is not None and fp != prev_fp
        prev_fp = fp
        n = df.count()
        nbytes = os.path.getsize(p) if os.path.exists(p) else 0
        ev.update(
            chunk_rows=n,
            chunk_bytes=nbytes,
            schema_changed=changed,
        )
        if progress_sink:
            if i == 0:
                progress_sink.schema(df.columns)
            if changed:
                progress_sink.warning(f"schema changed at chunk {i}: {p}")
            pct = (
                round(100.0 * ev.state.rows / estimated_total_rows, 1)
                if estimated_total_rows else None
            )
            progress_sink.chunk(
                rows_processed=ev.state.rows,
                bytes_consumed=ev.state.bytes,
                percentage=pct,
            )
        if ev.should_stop and i < len(paths) - 1:
            stopped_early = True
            break
    if progress_sink:
        progress_sink.finished(
            total_rows=ev.state.rows, total_bytes=ev.state.bytes,
            truncated=stopped_early,
        )
    out = consumed[0]
    for df in consumed[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return {
        "df": out,
        "rows": ev.state.rows,
        "bytes": ev.state.bytes,
        "files_consumed": len(consumed),
        "files_total": len(paths),
        "truncated": stopped_early,
        "truncation_reason": ev.triggered_reason if stopped_early else None,
    }
