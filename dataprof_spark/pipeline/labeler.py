"""Single-node reference labeler — the parity oracle.

Mirrors the reference's cross-engine-consistency discipline
(/root/reference/tests/cross_engine_consistency.rs): an independent
harness over the SAME pure functions (core/*) produces the "reference
labels"; the Spark pipeline must match them at F1 ≥ 0.99 (BASELINE.md)
and byte-identically on scrubbed text. No Spark imports here — this
runs plain-Python over plain rows.
"""

from __future__ import annotations

from typing import Iterable

from dataprof_spark.core import gates


def label_rows(rows: Iterable[dict]) -> list[dict]:
    """One decisions row per page row (FIXTURES.md A4 labels schema)."""
    return [
        gates.decide(
            r["url"], r["text"], r["lang"], r.get("warc_ts")
        )
        for r in rows
    ]


def f1_score(
    reference: list[dict], predicted: list[dict]
) -> tuple[float, dict]:
    """F1 of predicted `keep` vs reference `keep`, joined on url,
    plus a small confusion/diagnostic dict."""
    ref = {r["url"]: r for r in reference}
    tp = fp = fn = tn = 0
    mismatched_text = 0
    for p in predicted:
        r = ref[p["url"]]
        if p["keep"] and r["keep"]:
            tp += 1
        elif p["keep"] and not r["keep"]:
            fp += 1
        elif not p["keep"] and r["keep"]:
            fn += 1
        else:
            tn += 1
        if p["scrubbed_text"] != r["scrubbed_text"]:
            mismatched_text += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return f1, {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall,
        "scrub_text_mismatches": mismatched_text,
    }
