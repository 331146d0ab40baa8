"""PII / toxicity scrubber — ONE Python implementation, two harnesses.

The byte-identical contract (BASELINE.json input_hint: "byte-identical
extracted text per url") is met by construction: the single-node
labeler (pipeline/labeler.py) and the Spark pandas UDF
(operators/scrub.py) both call :func:`scrub_text` below. Spark's
``regexp_replace`` (Java regex) is deliberately NOT used for scrubbing
— one regex dialect (Python ``re``) end-to-end (SURVEY.md §7.3).

Pattern semantics follow the reference's detector inventory
(/root/reference/crates/dataprof-metrics/src/analysis/patterns.rs:45-104
— Email, Phone, IPv4), restricted to constructs that behave identically
in Python re / Java regex / RE2 so the COUNTING queries can also run
native and be DuckDB-oracle-checked (functions/exprs.py).
"""

from __future__ import annotations

import re

from dataprof_spark import config

# Order matters and is fixed: email → phone → ip → blocklist.
# (Email first so its digits/dots are consumed before the phone/ip
# patterns can partially match inside an address.)
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_PAT = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
BLOCKLIST_PAT = r"\b(?:" + "|".join(config.BLOCKLIST_TERMS) + r")\b"

SCRUB_ORDER = ("email", "phone", "ip", "blocklist")

# re.ASCII: \d and \b must mean ASCII digits/word-boundaries, exactly
# as Java regex (Spark) and RE2 (DuckDB) define them — Unicode digits
# must not match the phone/ip patterns only in Python (ADVICE r1).
_COMPILED = {
    "email": re.compile(EMAIL_PAT, re.ASCII),
    "phone": re.compile(PHONE_PAT, re.ASCII),
    "ip": re.compile(IPV4_PAT, re.ASCII),
    "blocklist": re.compile(BLOCKLIST_PAT, re.IGNORECASE | re.ASCII),
}


def scrub_text(text: str) -> tuple[str, dict[str, int]]:
    """Replace PII/blocklist spans with category tokens.

    Returns ``(scrubbed_text, {category: replacement_count})``. Counts
    are always present for all four categories (0 when clean), matching
    the decisions-table schema (FIXTURES.md A2 scrub_counts).
    """
    counts: dict[str, int] = {}
    for cat in SCRUB_ORDER:
        text, n = _COMPILED[cat].subn(config.SCRUB_TOKENS[cat], text)
        counts[cat] = n
    return text, counts


def scrub_batch(texts) -> tuple["object", dict[str, "object"]]:
    """Vectorized scrub over a pandas Series of texts.

    Returns ``(scrubbed: pd.Series[str], {category: np.ndarray[int]})``
    with results byte-identical to :func:`scrub_text` per element by
    construction: the SAME compiled Python-``re`` patterns and
    ``subn`` calls run in the same fixed category order — only the
    loop nesting differs (category-major here, document-major there),
    which cannot change per-document results because categories are
    independent scans over each document's current text."""
    import numpy as np
    import pandas as pd

    vals: list[str] = (
        texts.fillna("").tolist()
        if isinstance(texts, pd.Series)
        else [t or "" for t in texts]
    )
    counts: dict[str, np.ndarray] = {}
    # category-major, ``subn`` per element: one C regex scan per
    # category yields BOTH the replaced text and the count (a
    # Series.str.count + str.replace pair would scan twice), and a
    # clean document costs exactly one scan — CPython's subn returns
    # the original string object untouched when nothing matched.
    for cat in SCRUB_ORDER:
        sub = _COMPILED[cat].subn
        tok = config.SCRUB_TOKENS[cat]
        pairs = [sub(tok, t) for t in vals]
        vals = [p[0] for p in pairs]
        counts[cat] = np.fromiter(
            (p[1] for p in pairs), dtype=np.int64, count=len(pairs)
        )
    return pd.Series(vals, dtype=object), counts


def pii_counts(text: str) -> dict[str, int]:
    """Match counts only (no replacement) — the detection-side twin of
    the reference's pattern match_count (pattern.rs:5-18)."""
    return {cat: len(_COMPILED[cat].findall(text)) for cat in SCRUB_ORDER}
