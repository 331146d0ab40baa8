"""Similarity search: brute-force top-k exactness (vs NumPy oracle),
LSH recall, embedding near-dup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataprof_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def np_vecs(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_brute_force_matches_numpy(spark, emb, np_vecs):
    ids, mat = np_vecs
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.brute_force_topk(emb, queries, k=5)
    got_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in got.collect()
    }
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(3):
        q = mat[ids == qid][0]
        sims = mat @ q / (norms * np.linalg.norm(q))
        # deterministic tie-break: (-sim, id)
        order = sorted(zip(-sims, ids))
        for rank in range(1, 6):
            exp_id = order[rank - 1][1]
            exp_sim = round(-order[rank - 1][0], 6)
            nid, sim = got_rows[(qid, rank)]
            assert nid == exp_id, (qid, rank)
            assert sim == pytest.approx(exp_sim, abs=2e-6)


def test_lsh_topk_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.lsh_topk(emb, queries, k=5, n_planes=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 4 planes / 16 buckets on 500 docs: recall is partial by design;
    # the self-match must always be found (same bucket trivially)
    assert all((q, q) in a for q in range(10))
    assert recall >= 0.2, recall


def test_embedding_near_dup_self_excluded(emb):
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.99)
    for r in pairs.collect():
        assert r["id_a"] < r["id_b"]
        assert r["cos_sim"] >= 0.99


def test_ivf_recall_vs_exact(spark):
    """IVF with n_probe=4 of 16 cells must recover most exact
    neighbors on the clustered embedding fixture (the scale path
    trades recall for a ~4x smaller scan per query)."""
    from dataprof_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            emb, queries, k=5, n_cells=16, n_probe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_auto_knob_derivations():
    """Scale-derived knobs (round-2 verdict #5): √N cells, E[bucket]-
    targeted planes, threshold-tracked bands — with hard clamps at
    the driver-broadcast / bucket-sparsity ceilings."""
    from dataprof_spark.operators import dedup

    assert similarity.auto_n_planes(0) == 4
    assert similarity.auto_n_planes(64, target_bucket=64) == 4
    assert similarity.auto_n_planes(1_000_000, target_bucket=64) == 14
    assert similarity.auto_n_planes(10**12, target_bucket=64) == 24
    assert similarity.auto_n_cells(0) == 4
    assert similarity.auto_n_cells(1_000_000) == 1000
    assert similarity.auto_n_cells(10**10) == 65536
    # LSH s-curve midpoint (1/b)^(b/n_perm) tracks the threshold:
    # 16 perms -> midpoints {1: 1.0, 2: .917, 4: .707, 8: .354, 16: .0625}
    assert dedup.bands_for_threshold(16, 0.7) == 4
    assert dedup.bands_for_threshold(16, 0.35) == 8
    assert dedup.bands_for_threshold(16, 0.9) == 2


def test_auto_planes_oracle_verified_at_two_sizes(spark):
    """The auto-derived plane count is oracle-verified at TWO corpus
    sizes (sf0.001: 50 vecs -> 4 planes, sf0.01: 500 vecs -> 6 planes
    with target_bucket=8): the DuckDB twin is generated with the SAME
    derived knob and must agree on the full top-k output."""
    import duckdb
    import pandas as pd

    from dataprof_spark import queries_dedup

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        planes = similarity.auto_n_planes(n, target_bucket=8)
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = (
            similarity.lsh_topk(emb, queries, k=5, n_planes=planes)
            .orderBy("query_id", "rank")
            .toPandas()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'"
        )
        want = con.execute(
            queries_dedup._ddb_lsh_topk_sql(k=5, n_planes=planes)
        ).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.reset_index(drop=True),
            check_dtype=False,
        )


def test_multi_probe_lsh_recall_monotone(spark, emb):
    """Multi-probe LSH: recall@5 must be non-decreasing in n_probe,
    with a strict improvement from 1 to 8 probes, and the n_probe=1
    path must stay IDENTICAL to the single-bucket oracle-checked
    query (the registry twin relies on that)."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    recalls = []
    for probes in (1, 4, 8):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.lsh_topk(
                emb, queries, k=5, n_planes=4, n_probe=probes
            ).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] > recalls[0]

    one_probe = similarity.lsh_topk(
        emb, queries, k=5, n_planes=4, n_probe=1
    ).orderBy("query_id", "rank").collect()
    legacy_rows = similarity.lsh_topk(
        emb, queries, k=5, n_planes=4
    ).orderBy("query_id", "rank").collect()
    assert one_probe == legacy_rows


def test_near_dup_pair_cap_guard(spark):
    """Skew guard: a boilerplate-heavy bucket (here 40 identical
    vectors) is sub-bucketed when it exceeds max_bucket_size — but
    identical vectors share every sub-bucket bit, so ALL their pairs
    survive; and the guard can only ever shrink the pair set."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    rows = [(i, (base + rng.standard_normal(64) * 1e-9).tolist())
            for i in range(40)]
    rows += [(100 + i, rng.standard_normal(64).tolist())
             for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unguarded = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.99, n_planes=4
        ).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.99, n_planes=4, max_bucket_size=10
        ).collect()
    }
    dup_pairs = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert dup_pairs <= guarded          # near-identicals all retained
    assert guarded <= unguarded          # guard only removes pairs


def test_ivf_cell_assignment_deterministic_across_layouts(spark):
    """The quantizer is content-derived: repartitioning the corpus
    must not change any cell assignment."""
    from dataprof_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, n_cells=8)
    a = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id",
            similarity.ivf_cell(F.col("embedding"), cents).alias("cell"),
        ).collect()
    }
    cents2 = similarity.ivf_centroids(emb.repartition(7), n_cells=8)
    b = {
        r["vec_id"]: r["cell"]
        for r in emb.repartition(3).select(
            "vec_id",
            similarity.ivf_cell(F.col("embedding"), cents2).alias("cell"),
        ).collect()
    }
    assert a == b


def test_near_dup_guard_auto_default(spark):
    """r8 (VERDICT r7 #3): the skew guard defaults ON with an
    occupancy-RELATIVE cap — max(64, 8·n/2^planes). On a uniformly
    loaded corpus the cap never fires (output identical to
    max_bucket_size=None at every scale — the embedding_near_dups
    oracle row stays green by construction); on a corpus with one
    degenerate bucket (≫ 8× expected occupancy) it sub-buckets
    exactly there, and identical vectors keep all their pairs."""
    rng = np.random.default_rng(11)
    # uniform corpus: auto == unguarded
    uni = [(i, rng.standard_normal(64).tolist()) for i in range(300)]
    df_u = spark.createDataFrame(
        uni, "vec_id long, embedding array<double>"
    )
    auto_pairs = {
        tuple(r) for r in similarity.embedding_near_dup_pairs(
            df_u, threshold=0.8, n_planes=4
        ).collect()
    }
    off_pairs = {
        tuple(r) for r in similarity.embedding_near_dup_pairs(
            df_u, threshold=0.8, n_planes=4, max_bucket_size=None
        ).collect()
    }
    assert auto_pairs == off_pairs
    # degenerate corpus: 600 near-identical vectors in one bucket
    # (n=800, planes=4 -> expected occupancy 50, cap 400 < 600)
    base = rng.standard_normal(64)
    rows = [(i, (base + rng.standard_normal(64) * 1e-9).tolist())
            for i in range(600)]
    rows += [(1000 + i, rng.standard_normal(64).tolist())
             for i in range(200)]
    df_d = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    guarded = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            df_d, threshold=0.99, n_planes=4
        ).collect()
    }
    unguarded = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            df_d, threshold=0.99, n_planes=4, max_bucket_size=None
        ).collect()
    }
    dup_pairs = {(a, b) for a in range(600) for b in range(600) if a < b}
    assert dup_pairs <= guarded
    assert guarded <= unguarded
