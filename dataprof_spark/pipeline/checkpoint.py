"""Per-partition checkpoint / resume / lineage (FIXTURES.md A3).

Recasts the reference's ExecutionMetadata + stop-condition provenance
(/root/reference/crates/dataprof-core/src/execution.rs:19-62,
stop_condition.rs:14-117) into the thing that actually matters at
100 TB: a killed run must resume with ZERO recompute of completed
partitions and produce byte-identical final tables.

Mechanism (Iceberg-shaped, parquet-backed in this sandbox):
- the input is bucketed by a deterministic partition key;
- each partition is processed as its own job and written to
  ``out_dir/decisions/part_key=<k>/`` (the parquet twin of Iceberg's
  overwrite-by-partition);
- a manifest row (JSON file per partition — the sandbox twin of an
  Iceberg snapshot/metrics table) records docs_in/out, drop-reason
  histogram, scrub counts, bytes, wall_ms, status;
- resume() lists partitions with no ``done`` manifest and reprocesses
  only those. Safe because decisions are pure per-document functions
  (core/gates.py) — a retried partition rewrites identical bytes.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprof_spark.operators import gates

N_BUCKETS_DEFAULT = 8


def with_part_key(df: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT,
                  url_col: str = "url") -> DataFrame:
    """Deterministic partition key: xxhash64(url) mod n_buckets.

    Hash-bucketing (not domain) so heavy-domain skew cannot produce a
    straggler partition — the salting strategy from SURVEY.md §7.1
    step 7. On a real Iceberg table this is `bucket(N, url)` hidden
    partitioning composed with days(warc_ts).
    """
    return df.withColumn(
        "part_key", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets))
    )


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _manifest_path(out_dir: str, part_key: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"part_{part_key}.json")


def done_partitions(out_dir: str) -> set[int]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            row = json.load(f)
        if row.get("status") == "done":
            done.add(int(row["partition_id"]))
    return done


def _process_partition(
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    part_key: int,
    ts_col: str | None,
) -> dict:
    t0 = time.perf_counter()
    part = pages.filter(F.col("part_key") == part_key).drop("part_key")
    decisions = gates.decide(part, ts_col=ts_col)
    # deterministic file content: stable sort before write
    decisions = decisions.orderBy("url")
    dest = os.path.join(out_dir, "decisions", f"part_key={part_key}")
    decisions.write.mode("overwrite").parquet(dest)
    # counters from the written partition (one extra small scan)
    spark = pages.sparkSession
    written = spark.read.parquet(dest)
    agg = written.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("keep").cast("long")).alias("docs_out"),
    ).collect()[0]
    hist = {
        r["drop_reason"]: r["n"]
        for r in written.filter(~F.col("keep"))
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    scrub_totals = {
        k: v
        for k, v in written.select(
            F.explode("scrub_counts").alias("k", "v")
        )
        .groupBy("k")
        .agg(F.sum("v").alias("n"))
        .rdd.map(lambda r: (r["k"], r["n"]))
        .collect()
    }
    bytes_in = sum(
        os.path.getsize(os.path.join(dest, f))
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )
    row = {
        "run_id": run_id,
        "partition_id": part_key,
        "input_snapshot_id": 0,
        "docs_in": agg["docs_in"],
        "docs_out": agg["docs_out"],
        "drop_reason_counts": hist,
        "scrub_counts": scrub_totals,
        "bytes_in": bytes_in,
        "wall_ms": int((time.perf_counter() - t0) * 1000),
        "status": "done",
    }
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    tmp = _manifest_path(out_dir, part_key) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.replace(tmp, _manifest_path(out_dir, part_key))  # atomic commit
    return row


def run(
    pages: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    n_buckets: int = N_BUCKETS_DEFAULT,
    ts_col: str | None = "warc_ts",
    max_partitions: int | None = None,
) -> list[dict]:
    """Process all not-yet-done partitions; returns manifest rows.

    ``max_partitions`` processes only the first K pending partitions —
    used by tests to simulate a killed run mid-way.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    keyed = with_part_key(pages, n_buckets)
    pending = [
        k for k in range(n_buckets) if k not in done_partitions(out_dir)
    ]
    if max_partitions is not None:
        pending = pending[:max_partitions]
    return [
        _process_partition(keyed, out_dir, run_id, k, ts_col)
        for k in pending
    ]


def read_decisions(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "decisions"))


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The run_metrics lineage table (FIXTURES.md A3) from manifests."""
    mdir = _manifest_dir(out_dir)
    rows = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(f.read())
    return spark.read.json(spark.sparkContext.parallelize(rows))
