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
from typing import Sequence

import numpy as np

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

# codepoint → log-prob lookup table for the vectorized kernel; every
# character in the model table is ASCII, so clipping any codepoint to
# 255 (a floor entry) is exact — one np.minimum + one fancy index
_LUT = np.full(256, _LOG_FLOOR)
for _c, _lp in _LOGP.items():
    _LUT[ord(_c)] = _lp


def perplexity_batch(texts: Sequence[str | None]) -> np.ndarray:
    """Vectorized twin of the per-document scorer — THE implementation
    (the scalar wrapper below delegates here, so labeler and Spark UDF
    can never diverge).

    One numpy pass over the whole batch: texts are lowercased,
    concatenated, decoded to a codepoint array (utf-32-le), mapped
    through the 128-entry log-prob LUT, and segment-summed per document
    with ``np.add.reduceat``. reduceat's pairwise blocking depends only
    on the segment LENGTH, so a document's score is bit-identical
    whether it is scored alone or inside any batch (verified by
    test_pipeline_parity + the batch-vs-scalar test). None/empty → 0.0.
    """
    n = len(texts)
    out = np.zeros(n)
    lowered: list[str] = []
    idx: list[int] = []
    orig_lens: list[int] = []
    for i, t in enumerate(texts):
        t = t or ""
        if t:
            lowered.append(t.lower())
            orig_lens.append(len(t))
            idx.append(i)
    if not lowered:
        return out
    cp = np.frombuffer(
        "".join(lowered).encode("utf-32-le"), dtype=np.uint32
    )
    logp = _LUT[np.minimum(cp, 255)]
    lens = np.fromiter(
        (len(s) for s in lowered), dtype=np.int64, count=len(lowered)
    )
    starts = np.zeros(len(lowered), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    sums = np.add.reduceat(logp, starts)
    # mean over the ORIGINAL character count (lower() can change
    # length for a handful of Unicode codepoints) — scalar semantics
    out[idx] = np.exp(-sums / np.asarray(orig_lens, dtype=np.float64))
    return out


def perplexity(text: str) -> float:
    """exp(mean negative log-prob) over characters; 0.0 for empty.
    Delegates to the batch kernel so scalar (labeler) and batch
    (Spark UDF) scores are bit-identical by construction."""
    return float(perplexity_batch([text])[0])
