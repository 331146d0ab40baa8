"""Corpus-level dedup pass: Spark twin == labeler twin, deterministic
canonical choice, dropped docs never shadow kept ones."""

from __future__ import annotations

import pytest

from dataprof_spark.operators import gates as sgates
from dataprof_spark.pipeline import dedup_stage, fixtures, labeler


@pytest.fixture(scope="module")
def rows():
    base = fixtures.generate_pages(n=120)
    # plant exact duplicates: same text under new urls (different
    # domains, later and earlier sort order)
    clones = []
    for i, r in enumerate(r for r in base if r["_class"] == "clean_en"):
        if i >= 5:
            break
        for suffix in ("zz-clone", "aa-clone"):
            c = dict(r)
            c["url"] = f"https://{suffix}.example.org/copy/{i}"
            clones.append(c)
    return base + clones


def test_spark_matches_labeler_with_dedup(spark, rows):
    pages = fixtures.pages_df(spark, rows)
    spark_dec = dedup_stage.mark_exact_duplicates(
        sgates.decide(pages)
    )
    got = {r["url"]: (r["keep"], r["drop_reason"])
           for r in spark_dec.collect()}
    want_rows = dedup_stage.label_exact_duplicates(
        labeler.label_rows(rows)
    )
    want = {r["url"]: (r["keep"], r["drop_reason"]) for r in want_rows}
    assert got == want
    # the clones really did get demoted
    demoted = [u for u, (k, dr) in got.items() if dr == "exact_duplicate"]
    assert len(demoted) >= 5


def test_canonical_is_smallest_url(spark, rows):
    pages = fixtures.pages_df(spark, rows)
    dec = dedup_stage.mark_exact_duplicates(sgates.decide(pages))
    import collections

    from pyspark.sql import functions as F

    kept = dec.filter("keep").select(
        F.md5(
            F.trim(F.regexp_replace(F.lower("scrubbed_text"), r"\s+", " "))
        ).alias("fp"),
        "url",
    ).collect()
    by_fp = collections.defaultdict(list)
    for r in kept:
        by_fp[r["fp"]].append(r["url"])
    # exactly one kept per fingerprint
    assert all(len(v) == 1 for v in by_fp.values())
