"""Deterministic character-LM pseudo-perplexity (KenLM stand-in).

The sandbox has no KenLM; this scorer keeps the same interface
(``perplexity(text) -> float``, lower = more natural text) and is fully
deterministic, so a real 5-gram KenLM can be dropped in without
touching the pipeline.

Model: fixed English character-unigram distribution (published letter
frequencies) with a small additive-smoothing floor for out-of-table
characters. perplexity = exp(-mean(ln p(char))) over the lowercased
text. Natural English prose scores ~16-22; symbol-heavy / gibberish /
non-Latin text scores far higher.

Shared by the labeler and the Spark pandas UDF — identical scores by
construction.
"""

from __future__ import annotations

import math

# English letter+space relative frequencies (space ≈ 0.18, letters from
# published corpus tables, renormalized). Values need not sum to 1 —
# only ratios matter for ranking; the floor handles the remainder.
_FREQ = {
    " ": 0.1800,
    "e": 0.1020, "t": 0.0740, "a": 0.0670, "o": 0.0620, "i": 0.0570,
    "n": 0.0550, "s": 0.0520, "h": 0.0500, "r": 0.0490, "d": 0.0350,
    "l": 0.0330, "u": 0.0230, "c": 0.0220, "m": 0.0200, "w": 0.0190,
    "f": 0.0180, "g": 0.0160, "y": 0.0160, "p": 0.0150, "b": 0.0120,
    "v": 0.0080, "k": 0.0060, "j": 0.0012, "x": 0.0012, "q": 0.0008,
    "z": 0.0006, ".": 0.0090, ",": 0.0080, "\n": 0.0050,
    "0": 0.0020, "1": 0.0020, "2": 0.0015, "3": 0.0012, "4": 0.0012,
    "5": 0.0012, "6": 0.0012, "7": 0.0012, "8": 0.0012, "9": 0.0015,
}
_FLOOR = 0.0002  # probability for any character not in the table

_LOGP = {c: math.log(p) for c, p in _FREQ.items()}
_LOG_FLOOR = math.log(_FLOOR)


def perplexity(text: str) -> float:
    """exp(mean negative log-prob) over characters; 0.0 for empty."""
    if not text:
        return 0.0
    total = 0.0
    for ch in text.lower():
        total += _LOGP.get(ch, _LOG_FLOOR)
    return math.exp(-total / len(text))
