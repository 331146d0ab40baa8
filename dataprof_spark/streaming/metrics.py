"""Streaming twin of the pipeline metrics-table contract.

The batch pipeline checkpoints counters (docs in/out, drop-reason
histogram, scrub counts) into a manifest-backed metrics table
(pipeline/checkpoint.py, read_metrics). This module gives the
STREAMING ingest path the same lineage: each microbatch appends its
decisions to the output table AND one metrics row per (batch,
drop_reason) to a metrics table — so a killed stream restarts from
Spark's own checkpoint and the metrics table still reconciles
exactly with the decisions written (conservation law: docs_in =
kept + sum(dropped), tested).

Plan shape per microbatch: ONE gates.decide projection over the
batch (same zero-shuffle cascade as batch mode), one parquet append,
one tiny groupBy(drop_reason) append. No state store — the gate is
stateless per document; stateful operators (sessionization, dedup)
live in sessionize.py / events.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprof_spark.operators import gates

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string"
)


def read_page_stream(spark, src_dir: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def run_gated_stream(
    stream: DataFrame,
    out_dir: str,
    run_id: str = "stream",
    timeout_s: int = 300,
) -> None:
    """availableNow gated run: decisions + per-batch metrics written
    IDEMPOTENTLY from the same foreachBatch.

    foreachBatch is at-least-once: a crash after a write but before
    the streaming checkpoint commits replays the batch (ADVICE r3).
    Blind appends would then duplicate rows undetectably and break
    the conservation law. Both tables therefore carry batch_id and
    are written with dynamic partition overwrite on it — a replayed
    batch overwrites its own partition with identical content
    (gates.decide is deterministic per document), so the net effect
    is exactly-once regardless of where a kill lands."""
    decisions_dir = os.path.join(out_dir, "decisions")
    metrics_dir = os.path.join(out_dir, "metrics")
    ckpt_dir = os.path.join(out_dir, "_stream_checkpoint")

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        out = gates.decide(batch_df).select(
            "url", "keep", "drop_reason",
            F.length("scrubbed_text").alias("scrubbed_len"),
            F.lit(batch_id).alias("batch_id"),
        )
        # cache: decisions parquet + metrics agg share one compute
        out = out.cache()
        try:
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(decisions_dir)
            )
            (
                out.groupBy(
                    F.coalesce("drop_reason", F.lit("kept"))
                    .alias("reason")
                )
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("run_id", F.lit(run_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(metrics_dir)
            )
        finally:
            out.unpersist()

    q = (
        stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # a timed-out drain must not look like success: the tables
        # are missing trailing batches (the conservation-law
        # reconciliation would silently break) and the query keeps
        # writing into directories the caller is about to read
        q.stop()
        raise TimeoutError(
            f"gated stream drain did not finish within {timeout_s}s"
        )


def read_stream_metrics(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "metrics"))
