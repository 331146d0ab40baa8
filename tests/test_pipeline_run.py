"""spark-submit entrypoint: zip packaging + end-to-end main()."""

from __future__ import annotations

import json
import zipfile

from dataprof_spark.pipeline import fixtures, run


def test_make_zip(tmp_path):
    out = run.make_zip(str(tmp_path / "dist"))
    names = zipfile.ZipFile(out).namelist()
    assert "dataprof_spark/__init__.py" in names
    assert "dataprof_spark/operators/gates.py" in names
    assert all(n.endswith(".py") for n in names)


def test_main_end_to_end(spark, tmp_path, capsys):
    src = tmp_path / "pages_in"
    fixtures.pages_df(spark, fixtures.generate_pages(n=120)).write.parquet(
        str(src)
    )
    out_dir = tmp_path / "out"
    rc = run.main(
        [
            "--input", str(src),
            "--output", str(out_dir),
            "--buckets", "3",
            "--run-id", "t1",
            "--master", "local[4]",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_in"] == 120
    assert summary["partitions_processed"] == 3
    # re-run: resumable → zero partitions reprocessed
    rc = run.main(
        [
            "--input", str(src),
            "--output", str(out_dir),
            "--buckets", "3",
            "--master", "local[4]",
        ]
    )
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["partitions_processed"] == 0
