"""Grouped custom kernels via applyInPandas — the extension point for
per-group logic Spark aggregates can't express (SURVEY.md §2.10).

`ks_drift`: per-group two-sample Kolmogorov-Smirnov statistic of a
numeric column against a reference sample — per-domain distribution
drift detection, the dataprof quality-monitor idea turned per-group.
The reference sample is broadcast as a sorted numpy array; each group
computes its empirical-CDF max gap in its own pandas batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _ks_stat(sample: np.ndarray, reference: np.ndarray) -> float:
    """Two-sample KS statistic (max |ECDF_a - ECDF_b|)."""
    sample = np.sort(sample)
    all_v = np.concatenate([sample, reference])
    cdf_s = np.searchsorted(sample, all_v, side="right") / len(sample)
    cdf_r = np.searchsorted(reference, all_v, side="right") / len(reference)
    return float(np.max(np.abs(cdf_s - cdf_r)))


def ks_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    reference: list[float] | np.ndarray,
) -> DataFrame:
    """(key, n, ks_stat) per group vs the reference distribution."""
    ref = np.sort(np.asarray(reference, dtype=np.float64))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].dropna().to_numpy(dtype=np.float64)
        ks = _ks_stat(vals, ref) if len(vals) else None
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(vals)],
                "ks_stat": [ks],
            }
        )

    out_schema = f"{key_col} string, n long, ks_stat double"
    return (
        df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandas(kernel, out_schema)
    )
