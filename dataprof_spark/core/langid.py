"""Deterministic n-gram language identification (fastText stand-in).

The sandbox has no fastText; this is a dependency-free, fully
deterministic scorer with the same call signature a fastText wrapper
would have (``predict(text) -> (lang, score)``), so the model can be
swapped in production without touching the pipeline.

Model: per-language character-trigram profiles derived from the
stopword lexicons in config.STOPWORDS_BY_LANG, plus whole-token
stopword hits (weighted higher). Score(lang) =
``2*token_hits + trigram_hits``; predicted language = argmax with
alphabetical tie-break; 'und' when every score is 0.

Both the labeler and the Spark pandas UDF call :func:`predict` —
identical predictions by construction.
"""

from __future__ import annotations

import re

from dataprof_spark import config

_TOKEN_RE = re.compile(r"[a-zà-ÿ]+")


def _trigrams(word: str) -> set[str]:
    padded = f" {word} "
    return {padded[i : i + 3] for i in range(len(padded) - 2)}


def _build_profiles() -> dict[str, tuple[frozenset, frozenset]]:
    profiles = {}
    for lang, words in config.STOPWORDS_BY_LANG.items():
        tris: set[str] = set()
        for w in words:
            tris |= _trigrams(w)
        profiles[lang] = (frozenset(words), frozenset(tris))
    return profiles


_PROFILES = _build_profiles()
_LANGS = tuple(_PROFILES)


def _token_scores(tok: str) -> tuple[float, ...]:
    tok_tris = _trigrams(tok)
    denom = max(len(tok_tris), 1)
    return tuple(
        (2.0 if tok in words else 0.0) + len(tok_tris & tris) / denom
        for words, tris in (_PROFILES[l] for l in _LANGS)
    )


# Memoized per-token scoring: natural-language token frequency is
# Zipfian, so the cache hit rate is high on real corpora; results are
# identical with or without the cache (pure function).
# DATAPROF_LANGID_CACHE=0 disables it — the bench uses that to model
# a production-weight model (fastText/KenLM do real work per token
# that no memo can skip), see BENCH/BASELINE.md.
import os as _os  # noqa: E402
from functools import lru_cache as _lru_cache  # noqa: E402

if _os.environ.get("DATAPROF_LANGID_CACHE", "1") != "0":
    _token_scores = _lru_cache(maxsize=1 << 16)(_token_scores)


def score(text: str) -> dict[str, float]:
    """Per-language scores for one document."""
    tokens = _TOKEN_RE.findall(text.lower())
    totals = [0.0] * len(_LANGS)
    for tok in tokens:
        ts = _token_scores(tok)
        for i in range(len(_LANGS)):
            totals[i] += ts[i]
    return dict(zip(_LANGS, totals))


def predict(text: str) -> tuple[str, float]:
    """(language, score); 'und' if nothing matched at all."""
    scores = score(text)
    best = max(sorted(scores), key=lambda l: scores[l])
    if scores[best] <= 0.0:
        return "und", 0.0
    return best, scores[best]
