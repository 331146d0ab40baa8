"""applyInPandas grouped kernel: per-group KS drift detection."""

from __future__ import annotations

import numpy as np
import pytest

from dataprof_spark.operators import grouped


def test_ks_drift_flags_shifted_group(spark):
    rng = np.random.default_rng(42)
    ref = rng.normal(0, 1, 2000)
    rows = []
    for v in rng.normal(0, 1, 500):
        rows.append(("stable", float(v)))
    for v in rng.normal(3, 1, 500):  # strongly shifted group
        rows.append(("drifted", float(v)))
    df = spark.createDataFrame(rows, "domain string, metric double")
    got = {
        r["domain"]: (r["n"], r["ks_stat"])
        for r in grouped.ks_drift(df, "domain", "metric", ref).collect()
    }
    assert got["stable"][0] == 500 and got["drifted"][0] == 500
    assert got["stable"][1] < 0.1
    assert got["drifted"][1] > 0.8


def test_ks_stat_matches_scipy_definition():
    # closed-form check on a tiny example
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([1.0, 2.0, 3.0])
    assert grouped._ks_stat(a, np.sort(b)) == 0.0
    a = np.array([10.0, 11.0, 12.0])
    assert grouped._ks_stat(a, np.sort(b)) == 1.0
