"""Keep/drop gate cascade — the document-level recast of the
reference's quality dimensions (SURVEY.md §1.4, §2.4 A19-A25).

Pure per-document function: no cross-document state, so partitioning
can never change results (SURVEY.md §7.3 determinism-under-parallelism).
The Spark pipeline evaluates the same cascade with native expressions
where possible (functions/exprs.py) and pandas UDFs for langid /
perplexity; this module is the single-node reference semantics used by
the labeler.

Gate order is fixed (config.DROP_REASONS): the FIRST failing gate is
the drop_reason. `garbled_encoding` leads because encoding damage
invalidates every downstream signal (the reference's fail-closed
discipline, python/dataprof/__init__.py:747-770).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from dataprof_spark import config
from dataprof_spark.core import models as _models
from dataprof_spark.core import scrub as _scrub
from dataprof_spark.core import textsignals as _ts


def heuristic_reason(text: str, *, english: bool = True,
                     signals: dict | None = None) -> str | None:
    """SQL-expressible gate subset (no langid / perplexity).

    Returns the first failing reason among garbled_encoding, too_short,
    mean_word_length, symbol_ratio, ellipsis_ratio, stopword_ratio,
    dup_line_fraction — or None. The stopword gate only applies to
    documents claiming English (Gopher applies English stopwords to an
    English corpus). NULL text is treated as empty (drops as
    too_short) — same normalization as the Spark expressions.
    ``signals`` lets decide() reuse one computation per document.
    """
    s = signals if signals is not None else _ts.signals(text or "")
    if s["mojibake_count"] > 0:
        return "garbled_encoding"
    if s["word_count"] < config.MIN_WORDS:
        return "too_short"
    if not (
        config.MEAN_WORD_LEN_MIN
        <= s["mean_word_length"]
        <= config.MEAN_WORD_LEN_MAX
    ):
        return "mean_word_length"
    if s["symbol_ratio"] > config.MAX_SYMBOL_RATIO:
        return "symbol_ratio"
    if s["ellipsis_count"] / s["word_count"] > config.MAX_ELLIPSIS_PER_WORD:
        return "ellipsis_ratio"
    if english and s["stopword_count"] < config.MIN_STOPWORD_COUNT:
        return "stopword_ratio"
    if s["dup_line_fraction"] > config.MAX_DUP_LINE_FRACTION:
        return "dup_line_fraction"
    return None


def full_reason(text: str, claimed_lang: str,
                signals: dict | None = None,
                predicted: str | None = None) -> str | None:
    """Full cascade: heuristics, then langid agreement, then perplexity."""
    text = text or ""
    reason = heuristic_reason(
        text, english=(claimed_lang == "en"), signals=signals
    )
    if reason is not None:
        return reason
    if predicted is None:
        predicted, _ = _models.predict(text)
    if predicted != claimed_lang:
        return "lang_mismatch"
    if _models.perplexity(text) > config.MAX_PERPLEXITY:
        return "high_perplexity"
    return None


def quality_score(
    text: str,
    claimed_lang: str,
    warc_ts: _dt.datetime | None = None,
    *,
    now_year: int = 2026,
    signals: dict | None = None,
    predicted: str | None = None,
) -> float:
    """Weighted per-document quality score.

    Recasts the reference's renormalized weighted mean over *assessed*
    dimensions (quality.rs:395-411, weights config.rs:24-36): vacuous
    dimensions are excluded from the denominator, never counted as
    perfect. `precision` is unassessed at document level; `timeliness`
    is assessed only when warc_ts is present.
    """
    text = text or ""
    s = signals if signals is not None else _ts.signals(text)
    wc = s["word_count"]
    dims: dict[str, float] = {
        "completeness": min(1.0, wc / config.MIN_WORDS),
        "consistency": 0.0 if s["mojibake_count"] > 0 else 1.0,
        "uniqueness": 1.0 - s["dup_line_fraction"],
        "accuracy": 1.0
        - min(1.0, s["symbol_ratio"] / config.MAX_SYMBOL_RATIO),
        "validity": (
            1.0
            if (predicted if predicted is not None
                else _models.predict(text)[0]) == claimed_lang
            else 0.0
        ),
    }
    if warc_ts is not None:
        year = warc_ts.year
        if year > now_year:
            dims["timeliness"] = 0.0
        elif year < now_year - config.STALE_YEARS:
            dims["timeliness"] = 0.5
        else:
            dims["timeliness"] = 1.0
    num = sum(config.QUALITY_WEIGHTS[d] * v for d, v in dims.items())
    den = sum(config.QUALITY_WEIGHTS[d] for d in dims)
    return num / den if den else 0.0


def decide(
    url: str,
    text: str,
    claimed_lang: str,
    warc_ts: _dt.datetime | None = None,
) -> dict[str, Any]:
    """One decisions-table row (FIXTURES.md A2) for one document.

    Signals and the langid prediction are computed ONCE and reused by
    both the gate cascade and the quality score (they are pure; the
    Spark pipeline already shares them the same way)."""
    text = text or ""
    s = _ts.signals(text)
    predicted, _ = _models.predict(text)
    reason = full_reason(text, claimed_lang, signals=s, predicted=predicted)
    scrubbed, counts = _scrub.scrub_text(text)
    return {
        "url": url,
        "keep": reason is None,
        "drop_reason": reason,
        "scrubbed_text": scrubbed,
        "scrub_counts": counts,
        "quality_score": quality_score(
            text, claimed_lang, warc_ts, signals=s, predicted=predicted
        ),
    }
