"""Native Spark expressions must equal the pure-Python signal core on
the same rows — the engine-parity oracle (SURVEY.md §5.2 recast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprof_spark.core import textsignals as ts
from dataprof_spark.functions import exprs
from dataprof_spark.pipeline import fixtures

ROWS = fixtures.generate_pages(n=200)


@pytest.fixture(scope="module")
def sdf(spark):
    return fixtures.pages_df(spark, ROWS).cache()


def _collect(sdf, col):
    return {
        r["url"]: r["v"]
        for r in sdf.select("url", col.alias("v")).collect()
    }


@pytest.mark.parametrize(
    "expr_fn,py_fn",
    [
        (exprs.word_count, ts.word_count),
        (exprs.letter_count, ts.letter_count),
        (exprs.symbol_count, ts.symbol_count),
        (exprs.ellipsis_count, ts.ellipsis_count),
        (exprs.stopword_count, ts.stopword_count),
        (exprs.mojibake_count, ts.mojibake_count),
    ],
    ids=["words", "letters", "symbols", "ellipsis", "stopwords", "mojibake"],
)
def test_count_parity(sdf, expr_fn, py_fn):
    got = _collect(sdf, expr_fn(F.col("text")))
    for r in ROWS:
        assert got[r["url"]] == py_fn(r["text"]), r["_class"]


@pytest.mark.parametrize(
    "expr_fn,py_fn",
    [
        (exprs.mean_word_length, ts.mean_word_length),
        (exprs.symbol_ratio, ts.symbol_ratio),
        (exprs.dup_line_fraction, ts.dup_line_fraction),
    ],
    ids=["mwl", "symratio", "dupline"],
)
def test_ratio_parity(sdf, expr_fn, py_fn):
    got = _collect(sdf, expr_fn(F.col("text")))
    for r in ROWS:
        assert got[r["url"]] == pytest.approx(
            py_fn(r["text"]), abs=1e-12
        ), r["_class"]


def test_symbol_count_nonascii_whitespace_parity(spark):
    """ADVICE r1: NBSP/NEL and other non-ASCII whitespace (common in
    real web text) must count as SYMBOLS in all three engines — the
    Python twin compiles with re.ASCII so \\s means the same ASCII set
    as Spark's translate-delete and Java/RE2 regex."""
    texts = [
        "plain ascii text",
        "nbsp here and there",       # U+00A0 no-break space
        "nelline",                        # U+0085 next line
        "ideographic　space",               # U+3000
        "thin space mixed with tab\t",
        "vtab\x0b and formfeed\x0c stay whitespace",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["text"]: r["v"]
        for r in sdf.select(
            "text", exprs.symbol_count(F.col("text")).alias("v")
        ).collect()
    }
    for t in texts:
        assert got[t] == ts.symbol_count(t), repr(t)
    # NBSP is a symbol, not whitespace, in both engines
    assert ts.symbol_count("a b") == 1


def test_heuristic_reason_parity(sdf):
    from dataprof_spark.core import gates as pygates
    from dataprof_spark.operators import gates as sgates

    got = _collect(
        sdf, sgates.heuristic_reason_col("text", "lang")
    )
    for r in ROWS:
        expect = pygates.heuristic_reason(
            r["text"], english=(r["lang"] == "en")
        )
        assert got[r["url"]] == expect, (r["_class"], r["text"][:80])
