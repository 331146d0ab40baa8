"""analyze_structure: bounded first-pass parity with the reference's
dataprof-partial crate (format/delimiter/encoding diagnosis, exact vs
windowed row counts, sample-derived column summaries, truncation
provenance) + the facade exports (analyze_structure, list_patterns)."""

from __future__ import annotations

import json

import pytest

from dataprof_spark import facade
from dataprof_spark.sources import structure


def test_detect_format():
    assert structure.detect_format("x.csv") == "csv"
    assert structure.detect_format("x.TSV") == "csv"
    assert structure.detect_format("x.txt") == "csv"
    assert structure.detect_format("x.jsonl") == "jsonl"
    assert structure.detect_format("x.ndjson") == "jsonl"
    assert structure.detect_format("x.json") == "json"
    assert structure.detect_format("x.parquet") == "parquet"
    assert structure.detect_format("x.xlsx").startswith("unknown")


def test_csv_structure_messy(tmp_path):
    """Semicolon delimiter, Latin-1 encoding, a ragged row, mixed
    types — the unknown-messy-file case the reference's first pass
    exists for."""
    p = tmp_path / "messy.csv"
    p.write_bytes(
        "id;price;flag;when;name\n"
        "1;9.5;true;2024-01-02;caf\xe9\n"
        "2;8.25;false;2024-02-03;plain\n"
        "3;7;true;2024-03-04\n"  # ragged: 4 cells
        "4;;false;2024-04-05;four\n".encode("latin-1")
    )
    rep = facade.analyze_structure(str(p))
    assert rep.format == "csv"
    assert rep.delimiter == ";"
    assert rep.encoding == "ISO-8859-1"
    assert rep.row_count.exact and rep.row_count.count == 4
    assert rep.rows_sampled == 4
    assert not rep.truncated and rep.source_exhausted
    assert any("ragged" in w for w in rep.warnings)
    cols = {c.name: c for c in rep.columns}
    assert cols["id"].data_type == "integer"
    assert cols["price"].data_type == "float"
    assert cols["flag"].data_type == "boolean"
    assert cols["when"].data_type == "date"
    assert cols["name"].data_type == "string"
    # ragged row 3 has no name cell; row 4 has an empty price
    assert cols["name"].null_count == 1
    assert cols["price"].null_count == 1
    assert cols["id"].unique_count == 4
    assert cols["id"].uniqueness_ratio == 1.0
    assert all(c.provenance == "sample" for c in rep.columns)


def test_truncation_provenance_exact_boundary(tmp_path):
    """cap == rowcount is NOT truncation — only discarding rows is
    (the reference's last-chunk contract)."""
    p = tmp_path / "even.csv"
    p.write_text("a\n" + "\n".join(str(i) for i in range(10)) + "\n")
    at_cap = structure.analyze_structure(str(p), max_rows=10)
    assert not at_cap.truncated and at_cap.source_exhausted
    assert at_cap.truncation_reason is None
    below = structure.analyze_structure(str(p), max_rows=9)
    assert below.truncated and not below.source_exhausted
    assert below.truncation_reason == "max_rows(9)"
    assert below.rows_sampled == 9


def test_jsonl_structure(tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text(
        '{"a": 1, "b": "x"}\nnot json\n{"a": 2}\n{"a": 3, "b": "y"}\n'
    )
    rep = structure.analyze_structure(str(p))
    assert rep.format == "jsonl"
    assert rep.delimiter is None
    assert any("malformed" in w for w in rep.warnings)
    cols = {c.name: c for c in rep.columns}
    assert cols["a"].data_type == "integer"
    assert cols["b"].null_count == 1  # missing key in one sampled row


def test_json_array_structure(tmp_path):
    p = tmp_path / "d.json"
    p.write_text(json.dumps([{"k": i, "v": i * 1.5} for i in range(5)]))
    rep = structure.analyze_structure(str(p))
    assert rep.format == "json"
    assert rep.row_count.count == 5 and rep.row_count.exact
    cols = {c.name: c for c in rep.columns}
    assert cols["k"].data_type == "integer"
    assert cols["v"].data_type == "float"


def test_parquet_structure_metadata_only():
    rep = structure.analyze_structure(
        "/root/testdata/sf0.001/orders.parquet"
    )
    assert rep.format == "parquet"
    assert rep.row_count.method == "metadata" and rep.row_count.exact
    assert rep.row_count.count > 0
    assert rep.rows_sampled == 0  # zero data read
    assert all(c.provenance == "metadata" for c in rep.columns)
    assert all(c.total_count == rep.row_count.count for c in rep.columns)


def test_windowed_row_estimate(tmp_path):
    """>10 MB line file: estimate from 16 evenly spaced windows must
    land within 5% of truth even with line lengths that DRIFT over
    the file (the prefix-bias case head-sampling gets wrong)."""
    p = tmp_path / "big.jsonl"
    n = 200_000
    with open(p, "w") as f:
        for i in range(n):
            f.write('{"i": %d, "pad": "%s"}\n' % (i, "x" * (20 + i % 80)))
    assert p.stat().st_size > structure.FULL_SCAN_THRESHOLD
    est = structure.quick_row_count(str(p))
    assert not est.exact and est.method == "windowed_sample"
    assert abs(est.count - n) / n < 0.05


def test_csv_quoted_newline_exact_count(tmp_path):
    """A quoted field with an embedded newline is ONE record: the
    exact count must use csv.reader semantics, not physical lines
    (ADVICE r4)."""
    p = tmp_path / "quoted.csv"
    p.write_text(
        'id,comment\n'
        '1,"first line\nsecond line of same record"\n'
        '2,plain\n'
        '3,"another\nmulti\nline"\n'
    )
    est = structure.quick_row_count(str(p))
    assert est.exact and est.count == 3
    rep = structure.analyze_structure(str(p))
    assert rep.row_count.count == 3
    assert rep.rows_sampled == 3


def test_unknown_extension_rejected(tmp_path):
    p = tmp_path / "x.xlsx"
    p.write_text("whatever")
    with pytest.raises(ValueError, match="unsupported"):
        structure.analyze_structure(str(p))
    with pytest.raises(FileNotFoundError):
        structure.analyze_structure(str(tmp_path / "absent.csv"))


def test_infer_value_type_thresholds():
    """The reference's inference.rs thresholds verbatim."""
    assert structure.infer_value_type(["1", "2", "-3"]) == "integer"
    assert structure.infer_value_type(["1", "2", "x"]) == "string"
    # float needs STRICTLY more than 80%: 4/5 = 0.8 fails, 9/10 passes
    assert structure.infer_value_type(
        ["1.5", "2e3", ".5", "4.0", "x"]
    ) == "string"
    assert structure.infer_value_type(
        ["1.5", "2e3", ".5", "4.0", "-1.25", "3.0", "7.5", "0.1", "9.9", "x"]
    ) == "float"
    assert structure.infer_value_type(["true", "false", "TRUE"]) == "boolean"
    assert structure.infer_value_type(
        ["2024-01-01", "01/02/2024", "2024-01-01 10:30:00", "x"]
    ) == "date"  # 3/4 = 75% > 70%
    # minutes-only is NOT a date shape in the reference (8 anchored
    # patterns, all datetimes require seconds — inference.rs:12-31)
    assert structure.infer_value_type(
        ["2024-01-01 10:30", "2024-01-01 11:30", "2024-01-01 12:30"]
    ) == "string"
    # DD/MM/YYYY datetime is the reference's 8th shape
    assert structure.infer_value_type(
        ["15/01/2024 10:30:00", "16/01/2024 11:00:00"]
    ) == "date"
    assert structure.infer_value_type([]) == "string"
    assert structure.infer_value_type([None, ""]) == "string"
    # null-like tokens filtered before inference; values trimmed
    # (inference.rs:34-38,98-103): 'NULL'/'NaN' markers and padding
    # must not demote an integer column
    assert structure.infer_value_type(
        ["  1 ", "NULL", "2", "NaN", "null", " 3"]
    ) == "integer"
    assert structure.infer_value_type(["null", "NaN", ""]) == "string"
    # i64 overflow falls through to float, as Rust's parse::<i64> does
    assert structure.infer_value_type(
        [str(2**70), str(2**70 + 1)]
    ) == "float"
    assert structure.infer_value_type(
        [" true ", "FALSE", "null", "NULL", "nan", "NaN", ""]
    ) == "boolean"


def test_list_patterns_facade():
    pats = facade.list_patterns()
    assert len(pats) == 35
    by_name = {p["name"]: p for p in pats}
    assert by_name["Email"]["category"] == "contact"
    assert by_name["Email"]["specificity"] == 80
    assert all(
        {"name", "regex", "category", "specificity", "locale",
         "min_threshold", "has_validator"} <= set(p) for p in pats
    )
    # locale filter keeps neutral + matching-locale patterns only
    it = facade.list_patterns(locale="IT")
    assert all(p["locale"] in (None, "IT") for p in it)
    assert len(it) < len(pats)


def test_csv_all_empty_field_record_counted(tmp_path):
    """',,' is a record of empty fields — Spark reads it as a row, so
    the exact record count must include it; truly blank lines are
    still skipped (r5 review)."""
    p = tmp_path / "empties.csv"
    p.write_text("a,b\n1,2\n,\n\n3,4\n")
    est = structure.quick_row_count(str(p))
    assert est.exact and est.count == 3
