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
