"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (the Spark extension point for operators the
built-ins can't express — SURVEY.md §2.10).

Semantics: events for a user belong to one session while consecutive
event gaps are ≤ `gap`; a session closes when the watermark passes
its last event + gap, emitting (user_id, session_start, session_end,
n_events, total_value).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

GAP_SECONDS = 1800  # 30 min

_DURATION_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _duration_seconds(spec: str) -> float:
    """Parse a Spark CalendarInterval-style duration to seconds, for
    the late_threshold ≤ gap clamp. Compound specs sum their parts
    ('1 hour 30 minutes' → 5400), matching Spark's own interval
    grammar so every string withWatermark accepts keeps working
    (ADVICE r6: the single-pair parser regressed compound callers).
    Unknown shapes raise — a silent 0 would disable the watermark."""
    parts = spec.strip().lower().replace("interval", "").split()
    if not parts or len(parts) % 2:
        raise ValueError(f"unsupported duration spec: {spec!r}")
    total = 0.0
    for qty, unit in zip(parts[::2], parts[1::2]):
        unit = unit.rstrip("s")
        if unit not in _DURATION_UNITS:
            raise ValueError(f"unsupported duration unit: {spec!r}")
        try:
            total += float(qty) * _DURATION_UNITS[unit]
        except ValueError:
            raise ValueError(f"unsupported duration spec: {spec!r}")
    return total


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: int = GAP_SECONDS,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": dt.datetime.fromtimestamp(
                        start, dt.timezone.utc
                    ).replace(tzinfo=None),
                    "session_end": dt.datetime.fromtimestamp(
                        last, dt.timezone.utc
                    ).replace(tzinfo=None),
                    "n_events": n,
                    "total_value": total,
                }
            ]
        )
        return

    rows: list[dict[str, Any]] = []
    events = pd.concat(list(pdfs)).sort_values("ts")
    if state.exists:
        start, last, n, total = state.get
    else:
        start, last, n, total = None, None, 0, 0.0
    for _, e in events.iterrows():
        ts = int(e["ts"].timestamp())
        if last is not None and ts - last > gap_seconds:
            rows.append(
                {
                    "user_id": user_id,
                    "session_start": dt.datetime.fromtimestamp(
                        start, dt.timezone.utc
                    ).replace(tzinfo=None),
                    "session_end": dt.datetime.fromtimestamp(
                        last, dt.timezone.utc
                    ).replace(tzinfo=None),
                    "n_events": n,
                    "total_value": total,
                }
            )
            start, n, total = ts, 0, 0.0
        # a late (out-of-order but within-watermark) event must never
        # move the session's bounds backwards/forwards wrongly: it can
        # only widen [start, last]. Without the max() a late event in
        # a later micro-batch dragged `last` back and the next on-time
        # event false-split the session.
        start = ts if start is None else min(start, ts)
        last = ts if last is None else max(last, ts)
        n += 1
        total += float(e["value"])
    state.update((start, last, n, total))
    # EVENT-time close (the documented contract): fire when the
    # watermark passes last + gap. Clamped one ms past the current
    # watermark — setTimeoutTimestamp at-or-before it is an error.
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(
        max((last + gap_seconds) * 1000, wm_ms + 1)
    )
    yield pd.DataFrame(rows)


def sessionize(
    stream: DataFrame,
    gap_seconds: int = GAP_SECONDS,
    late_threshold: str = "10 minutes",
) -> DataFrame:
    """Stateful sessionization over a streaming events DataFrame.

    ``gap_seconds`` is threaded into the group kernel (both the gap
    comparison and the state timeout) via functools.partial — callers
    requesting a custom gap get it, not the 30-min default (ADVICE r1).

    Session close is EVENT-time (r5): the stream carries a watermark
    (``late_threshold`` of allowed disorder) and the state times out
    when the watermark passes last_event + gap — wall-clock stalls can
    no longer split a session whose event-time gaps never exceeded
    ``gap_seconds`` (the old ProcessingTimeTimeout did exactly that,
    and conversely never fired at all in bounded availableNow
    drains). Events later than the watermark are dropped by Spark;
    within-threshold disorder is handled in the kernel (bounds only
    widen).

    ``late_threshold`` is clamped to ``gap_seconds`` (ADVICE r5): the
    kernel's bounds-only-widen rule merges ANY within-watermark event
    into the open session, so a watermark wider than the gap would
    silently merge sessions that batch semantics split (an event gap
    seconds older than `last` must start a NEW session, not stretch
    the old one backwards). With threshold ≤ gap every admitted late
    event is by definition within one gap of the session bounds.
    """
    import functools

    late_s = _duration_seconds(late_threshold)
    if late_s > gap_seconds:
        late_threshold = f"{gap_seconds} seconds"
    return (
        stream.select("user_id", "ts", "value")
        .withWatermark("ts", late_threshold)
        .groupBy("user_id")
        .applyInPandasWithState(
            functools.partial(_sessionize_group, gap_seconds=gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
