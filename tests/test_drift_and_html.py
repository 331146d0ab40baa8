"""Schema-stability/drift tracking (reference SchemaStabilityTracker,
stop_condition.rs:313-355) and HTML report export."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dataprof_spark.streaming import drift


def test_fingerprint_stable_across_column_order(spark):
    a = spark.createDataFrame([(1, "x")], "a int, b string")
    b = spark.createDataFrame([("x", 1)], "b string, a int")
    fa = drift.schema_fingerprint(drift.infer_batch_types(a))
    fb = drift.schema_fingerprint(drift.infer_batch_types(b))
    assert fa == fb


def test_fingerprint_tracks_inferred_type_not_storage_type(spark):
    """A string column whose VALUES drift from ints to text changes
    the fingerprint even though the storage type is unchanged — the
    reference fingerprints inferred types (streaming_stats.rs:617-634)."""
    ints = spark.createDataFrame([("1",), ("2",)], "v string")
    text = spark.createDataFrame([("one",), ("two",)], "v string")
    fi = drift.schema_fingerprint(drift.infer_batch_types(ints))
    ft = drift.schema_fingerprint(drift.infer_batch_types(text))
    assert fi != ft
    assert drift.infer_batch_types(ints)["v"] == "integer"
    assert drift.infer_batch_types(text)["v"] == "string"


def test_tracker_consecutive_accounting():
    t = drift.SchemaStabilityTracker(threshold=100)
    assert not t.update(1, 40, types={"v": "integer"}, batch_id=0)
    assert not t.update(1, 40, types={"v": "integer"}, batch_id=1)
    assert t.update(1, 40, types={"v": "integer"}, batch_id=2)  # 120 ≥ 100
    assert t.stable
    # drift RESETS the counter to this chunk's rows and records the event
    assert not t.update(2, 50, types={"v": "string"}, batch_id=3)
    assert t.consecutive_stable == 50
    assert len(t.drift_events) == 1
    ev = t.drift_events[0]
    assert ev.batch_id == 3
    assert ev.changed_columns == {"v": ("integer", "string")}
    assert t.truncation_reason() == "schema_stable(100)"


def test_monitor_detects_drift_between_microbatches(spark, tmp_path):
    """Two parquet files with drifting value-types, one file per
    micro-batch → the tracker sees the change at batch granularity."""
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame([("1",), ("2",)], "v string").coalesce(
        1
    ).write.parquet(str(src / "b0"))
    spark.createDataFrame([("x",), ("y",)], "v string").coalesce(
        1
    ).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    tracker = drift.SchemaStabilityTracker(threshold=10)
    q = drift.monitor(
        stream, tracker,
        checkpointLocation=str(tmp_path / "ckpt"),
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(tracker.drift_events) < 1:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(tracker.drift_events) == 1
    assert tracker.drift_events[0].changed_columns["v"][1] in (
        "string", "integer",
    )


def test_tabular_exports_round_trip(spark):
    """Reference to_dataframe/to_polars/to_arrow parity
    (python/dataprof/__init__.py:1869-2275): one flat record per
    column; values must match the underlying profiles."""
    from dataprof_spark.operators import profiler
    from dataprof_spark.sources import report

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    profiles = profiler.profile(df)
    rep = report.ProfileReport.from_profiles("orders", profiles)

    pdf = rep.to_dataframe()
    assert len(pdf) == len(profiles) == len(df.columns)
    by_name = pdf.set_index("name")
    for p in profiles:
        row = by_name.loc[p.name]
        assert row["null_count"] == p.null_count
        assert row["distinct_count"] == p.distinct_count
        assert row["spark_type"] == p.spark_type
        for k, v in p.stats.items():
            if isinstance(v, float):
                assert row[f"stats.{k}"] == round(v, 4)

    tbl = rep.to_arrow()
    assert tbl.num_rows == len(profiles)
    assert "name" in tbl.schema.names

    try:
        rep.to_polars()
    except ImportError:
        pass  # polars not bundled in this environment — gate works


def test_html_export_and_save_dispatch(spark, tmp_path):
    from dataprof_spark.operators import profiler, quality
    from dataprof_spark.sources import report

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rep = report.ProfileReport.from_profiles(
        "orders", profiler.profile(df),
        quality.assess(df, key_col="o_orderkey"),
        patterns_scanned=True,
    )
    html = rep.to_html()
    assert html.startswith("<div class='dataprof-report'>")
    assert "<td>o_orderkey</td>" in html
    assert "Overall quality:" in html
    assert rep._repr_html_() == html
    # values are escaped
    rep2 = report.ProfileReport(
        source="<script>alert(1)</script>", columns=[],
    )
    assert "<script>" not in rep2.to_html()

    p_html = str(tmp_path / "r.html")
    p_md = str(tmp_path / "r.md")
    p_json = str(tmp_path / "r.json")
    rep.save(p_html)
    rep.save(p_md)
    rep.save(p_json)
    assert open(p_html).read().startswith("<div")
    assert open(p_md).read().startswith("# Profile")
    assert report.ProfileReport.load(p_json).source == "orders"


def test_run_until_stable_stop_condition(spark, tmp_path):
    """SchemaStable stop condition: the query stops once the schema
    held for `threshold` consecutive rows."""
    src = tmp_path / "stable_src"
    src.mkdir()
    for i in range(3):
        spark.createDataFrame(
            [(str(j),) for j in range(i * 10, i * 10 + 10)], "v string"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    tracker = drift.SchemaStabilityTracker(threshold=15)
    stable = drift.run_until_stable(
        stream, tracker, timeout_seconds=90,
        checkpointLocation=str(tmp_path / "stable_ckpt"),
    )
    assert stable
    assert tracker.consecutive_stable >= 15
    assert tracker.truncation_reason() == "schema_stable(15)"
