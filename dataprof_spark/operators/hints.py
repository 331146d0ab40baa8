"""Semantic hints — user-declared column semantics with binding
evidence (reference dataprof-core/src/semantic.rs:131-217 and
profiler.rs:478-493 contracts):

- a hint must name a REAL column, else error;
- a hint must BIND to at least one value over the full data (its
  pattern matches something), else error — an inert hint is a lie in
  the report, not a no-op;
- binding evidence (match count / ratio) is attached to the profile.

Hint names resolve to detectors from core/patterns.py (by short
name), plus 'identifier' which coerces the inferred type without a
regex (the reference's Identifier coercion, profile_builder.rs:287-291).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprof_spark.core import patterns as engine
from dataprof_spark.functions import exprs

_SHORT_NAMES = {
    "email": "Email",
    "phone": "Phone (US)",
    "url": "URL",
    "uuid": "UUID",
    "ipv4": "IPv4",
    "iban": "IBAN",
    "credit_card": "Credit Card",
    "ssn": "SSN (US)",
    "zip": "ZIP Code (US)",
    "date": "Date (ISO)",
}
_DEFS = {d.name: d for d in engine.PATTERN_DEFS}


class HintError(ValueError):
    pass


@dataclass
class HintBinding:
    column: str
    hint: str
    matched: int
    non_null: int

    @property
    def ratio(self) -> float:
        return self.matched / self.non_null if self.non_null else 0.0


def apply_hints(df: DataFrame, hints: dict[str, str]) -> list[HintBinding]:
    """Validate + bind hints in ONE aggregation pass; raises HintError
    on unknown column, unknown hint name, or an inert hint."""
    for col in hints:
        if col not in df.columns:
            raise HintError(f"hint names unknown column: {col!r}")
    aggs = []
    regexes: dict[str, str | None] = {}
    for col, hint in hints.items():
        key = hint.lower()
        if key == "identifier":
            regexes[col] = None
            continue
        name = _SHORT_NAMES.get(key, hint)
        if name not in _DEFS:
            raise HintError(f"unknown semantic hint: {hint!r}")
        regexes[col] = _DEFS[name].regex
        nn = ~exprs.nulllike(F.col(col))
        aggs.append(F.sum(nn.cast("long")).alias(f"{col}__nn"))
        aggs.append(
            F.sum(
                (
                    nn
                    & F.col(col).cast("string").rlike(_DEFS[name].regex)
                ).cast("long")
            ).alias(f"{col}__match")
        )
    row = df.agg(*aggs).collect()[0] if aggs else None
    bindings = []
    for col, hint in hints.items():
        if regexes[col] is None:  # identifier: binds by existence
            bindings.append(
                HintBinding(col, hint, matched=-1, non_null=-1)
            )
            continue
        matched = row[f"{col}__match"]
        if not matched:
            raise HintError(
                f"hint {hint!r} on column {col!r} bound to zero values "
                f"— inert hints are errors, not no-ops"
            )
        bindings.append(
            HintBinding(col, hint, matched, row[f"{col}__nn"])
        )
    return bindings
