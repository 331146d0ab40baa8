"""Streaming metrics-table contract: per-microbatch gate counters
must reconcile exactly with the written decisions (conservation law)
and with a BATCH recompute of the same corpus — the streaming twin of
the checkpoint pipeline's counter lineage."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dataprof_spark.operators import gates
from dataprof_spark.streaming import metrics as sm


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    from dataprof_spark.pipeline import fixtures

    base = tmp_path_factory.mktemp("stream_pages")
    rows = fixtures.generate_pages(n=600, seed=11)
    # 3 files → 3 microbatches at maxFilesPerTrigger=1
    for i in range(3):
        chunk = rows[i * 200:(i + 1) * 200]
        t = pa.table({
            "url": [r["url"] for r in chunk],
            "warc_ts": pa.array(
                [r["warc_ts"] for r in chunk],
                type=pa.timestamp("us", tz="UTC"),
            ),
            "html": pa.array([r["html"] for r in chunk], type=pa.binary()),
            "text": [r["text"] for r in chunk],
            "lang": [r["lang"] for r in chunk],
        })
        pq.write_table(t, str(base / f"part_{i}.parquet"))
    return str(base)


def test_stream_metrics_reconcile_with_decisions_and_batch(
    spark, pages_dir, tmp_path
):
    out = str(tmp_path / "gated")
    sm.run_gated_stream(
        sm.read_page_stream(spark, pages_dir), out, run_id="t1"
    )

    met = sm.read_stream_metrics(spark, out)
    dec = spark.read.parquet(os.path.join(out, "decisions"))

    # one batch per file
    assert met.select("batch_id").distinct().count() == 3
    # conservation: metrics total == decisions rows == corpus size
    assert met.agg(F.sum("n_docs")).collect()[0][0] == 600
    assert dec.count() == 600

    # per-reason histogram from metrics == recomputed from decisions
    from_metrics = {
        r["reason"]: r["n"]
        for r in met.groupBy("reason")
        .agg(F.sum("n_docs").alias("n")).collect()
    }
    from_decisions = {
        r["reason"]: r["n"]
        for r in dec.groupBy(
            F.coalesce("drop_reason", F.lit("kept")).alias("reason")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert from_metrics == from_decisions

    # stream == batch: same corpus through batch gates gives the
    # identical histogram (the cross-engine-consistency discipline)
    batch = gates.decide(spark.read.parquet(pages_dir))
    from_batch = {
        r["reason"]: r["n"]
        for r in batch.groupBy(
            F.coalesce("drop_reason", F.lit("kept")).alias("reason")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert from_metrics == from_batch


def test_stream_restart_is_idempotent(spark, pages_dir, tmp_path):
    """Re-running availableNow over the SAME checkpoint must add no
    duplicate decisions or metrics (Spark's streaming checkpoint
    supplies the resume; the conservation law must survive it)."""
    out = str(tmp_path / "gated2")
    sm.run_gated_stream(
        sm.read_page_stream(spark, pages_dir), out, run_id="t2"
    )
    sm.run_gated_stream(
        sm.read_page_stream(spark, pages_dir), out, run_id="t2"
    )
    assert spark.read.parquet(os.path.join(out, "decisions")).count() == 600
    met = sm.read_stream_metrics(spark, out)
    assert met.agg(F.sum("n_docs")).collect()[0][0] == 600


def test_replay_after_lost_checkpoint_no_duplicates(
    spark, pages_dir, tmp_path
):
    """ADVICE r3 (medium): foreachBatch is at-least-once — a crash
    after a write but before the checkpoint commit replays the batch.
    Worst case is a LOST checkpoint (every batch replays). With
    batch_id dynamic-partition overwrite the replay overwrites its
    own partitions with identical content, so decisions and metrics
    stay exactly-once and the conservation law holds."""
    import shutil

    out = str(tmp_path / "gated3")
    sm.run_gated_stream(
        sm.read_page_stream(spark, pages_dir), out, run_id="t3"
    )
    shutil.rmtree(os.path.join(out, "_stream_checkpoint"))
    sm.run_gated_stream(
        sm.read_page_stream(spark, pages_dir), out, run_id="t3"
    )
    dec = spark.read.parquet(os.path.join(out, "decisions"))
    assert dec.count() == 600
    assert dec.select("url").distinct().count() == 600
    met = sm.read_stream_metrics(spark, out)
    assert met.agg(F.sum("n_docs")).collect()[0][0] == 600
