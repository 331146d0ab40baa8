"""Semantic pattern detection engine — the reference's 35-detector
inventory, confidence formula, overlap suppression, and locale policy
(/root/reference/crates/dataprof-metrics/src/analysis/patterns.rs:
43-401, 436-446, 564-677), re-implemented clean-room in Python.

Execution model (Spark side, operators/patterns.py): detection runs on
a deterministic ≤10k-value sample of the column — exactly the
reference's discipline (pattern detection on the reservoir sample,
profile_builder.rs:198-202) — so the engine itself is a pure function
over a value list; the heavy lifting at 100 TB stays in the sampling
scan, not here.

Semantics preserved:
- anchored whole-value regexes with per-pattern specificity (10-95),
  locale tag and min match-percentage threshold;
- validator pass-rate folds into confidence:
  confidence = clamp((spec/100) · clamp(match%/50, 0, 1) · pass_rate);
- overlap suppression: a strictly-more-specific pattern explaining
  ≥80% of a broader pattern's matches suppresses it; equal
  specificity never suppresses;
- locale policy: configured locale boosts matching-locale patterns
  ×1.2 (floor 0.5 when match% ≥80 and pass rate ≥0.8) and drops
  other-locale patterns; with no configured locale, locale-tagged
  patterns are penalized 0.75 / n-distinct-locales that matched the
  same rows in the same category.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from dataprof_spark.core import validators as V


@dataclass(frozen=True)
class PatternDef:
    name: str
    regex: str
    category: str
    specificity: int
    locale: str | None
    min_threshold: float  # min match percentage to report at all
    validator: Callable[[str], bool] | None = None


PATTERN_DEFS: tuple[PatternDef, ...] = (
    PatternDef("Email", r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
               "contact", 80, None, 3.0),
    PatternDef("Phone (US)",
               r"^\+?1?[-.\s]?\(?[0-9]{3}\)?[-.\s]?[0-9]{3}[-.\s]?[0-9]{4}$",
               "contact", 70, "US", 5.0),
    PatternDef("Phone (IT)",
               r"^(?:\+39|0039)[-.\s]?(?:0[0-9]{1,3}|3[0-9]{2})[-.\s]?[0-9]{5,8}$",
               "contact", 70, "IT", 5.0),
    PatternDef("URL", r"^(?:https?|ftps?)://[^\s/$.?#].[^\s]*$",
               "network", 70, None, 5.0),
    PatternDef("UUID",
               r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
               "identifier", 85, None, 3.0),
    PatternDef("IPv4",
               r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
               r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
               "network", 65, None, 3.0),
    PatternDef("IPv6", r"^[0-9a-fA-F]*:[0-9a-fA-F:.]*$",
               "network", 75, None, 3.0, V.ipv6),
    PatternDef("MAC Address", r"^([0-9A-Fa-f]{2}[:-]){5}([0-9A-Fa-f]{2})$",
               "network", 80, None, 5.0),
    PatternDef("Geographic Coordinates",
               r"^[-+]?([1-8]?\d(\.\d+)?|90(\.0+)?),\s*"
               r"[-+]?(180(\.0+)?|((1[0-7]\d)|([1-9]?\d))(\.\d+)?)$",
               "geo", 75, None, 5.0, V.coordinates),
    PatternDef("IBAN", r"^[A-Z]{2}\d{2}[A-Z0-9]{1,30}$",
               "financial", 90, None, 5.0, V.iban_mod97),
    PatternDef("Codice Fiscale (IT)",
               r"^[A-Z]{6}\d{2}[A-Z]\d{2}[A-Z]\d{3}[A-Z]$",
               "identifier", 95, "IT", 5.0, V.codice_fiscale),
    PatternDef("P.IVA (IT)", r"^\d{11}$",
               "financial", 40, "IT", 25.0, V.piva_it),
    PatternDef("CAP (IT)", r"^\d{5}$", "geo", 35, "IT", 20.0, V.cap_it),
    PatternDef("ZIP Code (US)", r"^\d{5}(-\d{4})?$", "geo", 35, "US", 15.0),
    PatternDef("File Path (Unix)", r"^(/[^/\x00]+)+/?$",
               "other", 30, None, 10.0),
    PatternDef("File Path (Windows)",
               r'^[A-Z]:\\(?:[^\\/:*?"<>|\r\n]+\\)*[^\\/:*?"<>|\r\n]*$',
               "other", 30, None, 10.0),
    PatternDef("Credit Card",
               r"^[0-9]{4}[\s-]?[0-9]{4}[\s-]?[0-9]{4}[\s-]?[0-9]{1,4}$",
               "financial", 60, None, 10.0, V.luhn),
    PatternDef("SSN (US)", r"^\d{3}-?\d{2}-?\d{4}$",
               "identifier", 70, "US", 10.0, V.ssn_us),
    PatternDef("UK Postcode", r"^[A-Z]{1,2}\d[A-Z\d]?\s?\d[A-Z]{2}$",
               "geo", 50, "GB", 15.0),
    PatternDef("German PLZ", r"^\d{5}$", "geo", 30, "DE", 20.0),
    PatternDef("Canadian Postal Code", r"^[A-Z]\d[A-Z]\s?\d[A-Z]\d$",
               "geo", 50, "CA", 15.0),
    PatternDef("French Code Postal", r"^\d{5}$", "geo", 30, "FR", 20.0),
    PatternDef("Hex Color", r"^#[0-9a-fA-F]{6}$", "other", 60, None, 10.0),
    PatternDef("SWIFT/BIC", r"^[A-Z]{6}[A-Z0-9]{2}([A-Z0-9]{3})?$",
               "financial", 75, None, 10.0),
    PatternDef("Currency",
               r"^[$€£¥₹]\s?-?\d{1,3}([,.\s]\d{3})*([.,]\d{1,2})?$"
               r"|^-?\d{1,3}([,.\s]\d{3})*([.,]\d{1,2})?\s?[$€£¥₹]$",
               "financial", 40, None, 15.0),
    PatternDef("Percentage", r"^-?\d+([.,]\d+)?\s?%$",
               "other", 35, None, 15.0),
    PatternDef("Alphanumeric Code", r"^[A-Z]{2,}[_-]\d{2,}$",
               "identifier", 15, None, 30.0),
    PatternDef("Scientific Notation", r"^[-+]?\d+(\.\d+)?[eE][-+]?\d+$",
               "other", 20, None, 25.0),
    PatternDef("Labeled Identifier", r"^[A-Za-z]+[_-][A-Za-z0-9]+$",
               "identifier", 10, None, 35.0),
    PatternDef("Date (ISO)", r"^\d{4}-\d{2}-\d{2}$", "other", 50, None, 5.0),
    PatternDef("Date (EU slash)", r"^\d{2}/\d{2}/\d{4}$",
               "other", 50, None, 5.0),
    PatternDef("Date (EU dash)", r"^\d{2}-\d{2}-\d{4}$",
               "other", 50, None, 5.0),
    PatternDef("Date (YYYY/MM/DD)", r"^\d{4}/\d{2}/\d{2}$",
               "other", 50, None, 5.0),
    PatternDef("Date (EU dot)", r"^\d{2}\.\d{2}\.\d{4}$",
               "other", 50, None, 5.0),
    PatternDef("DateTime (ISO)", r"^\d{4}-\d{2}-\d{2}T\d{2}:",
               "other", 55, None, 5.0),
)

# re.ASCII: same \\d/\\b semantics as the Java-regex twin in Spark
_COMPILED = tuple(re.compile(d.regex, re.ASCII) for d in PATTERN_DEFS)


def confidence(spec: int, match_pct: float, pass_rate: float) -> float:
    base = spec / 100.0
    factor = min(max(match_pct / 50.0, 0.0), 1.0)
    return min(max(base * factor * pass_rate, 0.0), 1.0)


def detect(values: list[str], locale: str | None = None) -> list[dict]:
    """Run all detectors over non-null values; returns surviving
    patterns sorted by confidence desc (reference result contract)."""
    vals = [v for v in values if v]
    n = len(vals)
    if n == 0:
        return []
    # Phase 1: match bitmaps + validator pass rates
    candidates = []
    for d, rx in zip(PATTERN_DEFS, _COMPILED):
        bitmap = [bool(rx.match(v)) for v in vals]
        count = sum(bitmap)
        pct = count / n * 100.0
        if count == 0 or pct < d.min_threshold:
            continue
        if d.validator is not None:
            matched = [v for v, b in zip(vals, bitmap) if b]
            passed = sum(1 for v in matched if d.validator(v))
            pass_rate = passed / count
        else:
            pass_rate = 1.0
        candidates.append(
            {"def": d, "count": count, "pct": pct,
             "bitmap": bitmap, "pass_rate": pass_rate}
        )
    # Phase 2: specificity-based overlap suppression (≥80% explained)
    order = sorted(
        range(len(candidates)),
        key=lambda i: -candidates[i]["def"].specificity,
    )
    suppressed = [False] * len(candidates)
    for pos, a_idx in enumerate(order):
        if suppressed[a_idx]:
            continue
        a = candidates[a_idx]
        for b_idx in order[pos + 1:]:
            if suppressed[b_idx]:
                continue
            b = candidates[b_idx]
            if a["def"].specificity <= b["def"].specificity:
                continue
            if b["count"] == 0:
                continue
            overlap = sum(
                1 for x, y in zip(a["bitmap"], b["bitmap"]) if x and y
            )
            if overlap / b["count"] >= 0.80:
                suppressed[b_idx] = True
    # Phase 3: locale-adjusted confidence
    results = []
    norm_locale = locale.upper() if locale else None
    for i, c in enumerate(candidates):
        if suppressed[i]:
            continue
        d = c["def"]
        conf = confidence(d.specificity, c["pct"], c["pass_rate"])
        if norm_locale is not None:
            if d.locale is not None:
                if d.locale.upper() == norm_locale:
                    conf = min(conf * 1.2, 1.0)
                    if c["pct"] >= 80.0 and c["pass_rate"] >= 0.8:
                        conf = max(conf, 0.5)
                else:
                    continue  # other-locale patterns dropped
        elif d.locale is not None:
            same_rows_locales = {
                other["def"].locale
                for j, other in enumerate(candidates)
                if not suppressed[j]
                and (
                    j == i
                    or (
                        other["def"].locale is not None
                        and other["def"].locale != d.locale
                        and other["def"].category == d.category
                        and other["bitmap"] == c["bitmap"]
                    )
                )
            }
            conf *= 0.75 / max(len(same_rows_locales), 1)
        results.append(
            {
                "name": d.name,
                "regex": d.regex,
                "match_count": c["count"],
                "match_percentage": c["pct"],
                "category": d.category,
                "confidence": conf,
            }
        )
    results.sort(key=lambda r: -r["confidence"])
    return results
