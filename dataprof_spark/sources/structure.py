"""Bounded-scan structure analyzer — the reference's cheap first-pass
(`crates/dataprof-partial/src/lib.rs:63-180` analyze_structure /
quick_row_count / infer_schema) recast.

The point of this API is to diagnose an unknown, possibly messy file
WITHOUT reading it fully: format + delimiter + encoding detection, an
exact-or-estimated row count, and per-column structural summaries from
a small row sample. It deliberately runs driver-side (pure Python /
pyarrow) — the pass is bounded by construction (≤ max_rows rows + a
few 16 KiB probe windows), so spinning up a distributed scan would
cost more than the answer; the full profiler (operators/profiler.py)
is the distributed path once the structure is known.

Reference parity notes:
- row-count estimation samples ROW_SAMPLE_WINDOWS evenly spaced
  windows to remove head bias (lib.rs ROW_SAMPLE_WINDOWS=16), exact
  below FULL_SCAN_THRESHOLD=10 MB and always exact for parquet
  (footer metadata).
- type inference applies the reference's rules (inference.rs:33-96):
  100% integer → integer; >80% float-parsable → float; ≥90% strict
  true/false → boolean; >70% date-shaped → date; else string.
- "condition met on the last row is not truncation": the sample reads
  max_rows+1 and reports truncated only when the extra row exists.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any

from dataprof_spark.sources import readers as _readers

SCHEMA_SAMPLE_ROWS = 1000
FULL_SCAN_THRESHOLD = 10 * 1024 * 1024  # bytes: exact count below this
ROW_SAMPLE_WINDOWS = 16
ROW_SAMPLE_BYTES_PER_WINDOW = 16 * 1024

# the reference's 8 date shapes (inference.rs:12-31), one alternation,
# every branch fully anchored — seconds are REQUIRED in the datetime
# shapes ('2024-01-01 10:30' is NOT a date in the reference)
_DATE_RE = re.compile(
    r"^(?:\d{4}-\d{2}-\d{2}"                      # ISO 8601 date
    r"|\d{2}/\d{2}/\d{4}"                          # DD/MM/YYYY
    r"|\d{2}-\d{2}-\d{4}"                          # DD-MM-YYYY
    r"|\d{4}/\d{2}/\d{2}"                          # YYYY/MM/DD
    r"|\d{2}\.\d{2}\.\d{4}"                        # DD.MM.YYYY
    r"|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"  # ISO datetime
    r"|\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"        # spaced ISO datetime
    r"|\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2}"        # DD/MM/YYYY datetime
    r")$"
)
_INT_RE = re.compile(r"^[+-]?\d+$")
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_BOOL_SET = frozenset({"true", "false"})
_NULL_TOKENS = frozenset({"null", "nan"})


def is_null_like_token(value: str | None) -> bool:
    """Reference inference.rs:98-103: empty/whitespace-only, 'null',
    'nan' (ASCII case-insensitive, after trim) are all null-like."""
    if value is None:
        return True
    v = value.strip()
    return not v or v.lower() in _NULL_TOKENS


def _parses_as_i64(v: str) -> bool:
    """Rust `str::parse::<i64>()` twin: sign + digits, in i64 range
    (overflowing digit strings fall through to the float check there,
    exactly as in the reference's single numeric pass)."""
    if not _INT_RE.match(v):
        return False
    return _I64_MIN <= int(v) <= _I64_MAX


@dataclass
class RowCountEstimate:
    count: int
    exact: bool
    method: str  # "metadata" | "full_scan" | "windowed_sample"


@dataclass
class StructureColumnSummary:
    name: str
    data_type: str
    total_count: int | None = None
    null_count: int | None = None
    null_ratio: float | None = None
    unique_count: int | None = None
    uniqueness_ratio: float | None = None
    provenance: str = "sample"  # "sample" | "metadata"


@dataclass
class StructureReport:
    source: str
    format: str
    row_count: RowCountEstimate
    rows_sampled: int
    source_exhausted: bool
    truncated: bool
    truncation_reason: str | None
    delimiter: str | None
    encoding: str | None
    columns: list[StructureColumnSummary]
    warnings: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        from dataclasses import asdict

        return asdict(self)


def detect_format(path: str) -> str:
    """Extension → format, the reference's detect_format map
    (lib.rs:102-116: csv|tsv|txt → csv; unknown extensions rejected
    downstream rather than guessed)."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    return {
        "csv": "csv", "tsv": "csv", "txt": "csv",
        "json": "json", "jsonl": "jsonl", "ndjson": "jsonl",
        "parquet": "parquet", "pq": "parquet",
    }.get(ext, f"unknown({ext})")


# ------------------------------------------------------------ row count
def _count_lines_exact(path: str, skip_header: bool) -> int:
    n = 0
    with open(path, "rb") as f:
        for ln in f:
            if ln.strip():
                n += 1
    return max(0, n - 1) if skip_header else n


def _count_csv_records_exact(path: str) -> int:
    """Exact CSV RECORD count via the csv module — a quoted field with
    an embedded newline is one record, not two, so this (not a physical
    line count) is what 'exact' must mean for CSV (ADVICE r4)."""
    import csv as _csv

    encoding = _readers.detect_encoding(path)
    py_enc = {"ISO-8859-1": "latin-1"}.get(encoding, encoding)
    sep = _readers.detect_delimiter(path)
    n = 0
    with open(path, encoding=py_enc, errors="replace", newline="") as f:
        for rec in _csv.reader(f, delimiter=sep):
            # skip only truly blank lines ([] or ['']); a ',,' line is
            # a real record of empty fields and Spark reads it as a
            # row, so dropping it would make the 'exact' count wrong
            if len(rec) > 1 or (rec and rec[0].strip()):
                n += 1
    return max(0, n - 1)  # header


def _estimate_rows_windowed(path: str, skip_header: bool) -> int:
    """Windowed estimate for large line-oriented files: sample
    ROW_SAMPLE_WINDOWS evenly spaced byte windows, measure bytes/line
    in each, estimate = file_bytes / mean_bytes_per_line. Matches the
    reference's multi-offset design (prefix bias removed)."""
    size = os.path.getsize(path)
    stride = max(1, (size - ROW_SAMPLE_BYTES_PER_WINDOW) // ROW_SAMPLE_WINDOWS)
    line_bytes: list[int] = []
    with open(path, "rb") as f:
        for w in range(ROW_SAMPLE_WINDOWS):
            f.seek(w * stride)
            chunk = f.read(ROW_SAMPLE_BYTES_PER_WINDOW)
            if not chunk:
                break
            lines = chunk.split(b"\n")
            # drop the partial first and last lines of the window
            inner = lines[1:-1] if len(lines) > 2 else []
            line_bytes += [len(ln) + 1 for ln in inner if ln.strip()]
    if not line_bytes:
        return _count_lines_exact(path, skip_header)
    est = int(size / (sum(line_bytes) / len(line_bytes)))
    return max(0, est - 1) if skip_header else est


def quick_row_count(path: str, fmt: str | None = None) -> RowCountEstimate:
    """Exact count for parquet (footer) and small files; windowed
    estimate for large CSV/JSONL (reference quick_row_count)."""
    fmt = fmt or detect_format(path)
    if fmt == "parquet":
        return RowCountEstimate(
            _readers.quick_row_count(path), True, "metadata"
        )
    skip_header = fmt == "csv"
    if fmt == "json":
        # array-of-objects: must parse; bounded by the same threshold
        if os.path.getsize(path) <= FULL_SCAN_THRESHOLD:
            with open(path, encoding="utf-8", errors="replace") as f:
                data = json.load(f)
            return RowCountEstimate(len(data), True, "full_scan")
        raise ValueError(
            "row count for JSON arrays over 10 MB requires a full "
            "parse; convert to JSONL for streaming counting"
        )
    if os.path.getsize(path) <= FULL_SCAN_THRESHOLD:
        if fmt == "csv":
            # csv.reader honors quoted embedded newlines, so the
            # "exact" claim holds for records, not physical lines
            return RowCountEstimate(
                _count_csv_records_exact(path), True, "full_scan"
            )
        return RowCountEstimate(
            _count_lines_exact(path, skip_header), True, "full_scan"
        )
    return RowCountEstimate(
        _estimate_rows_windowed(path, skip_header), False,
        "windowed_sample",
    )


# -------------------------------------------------------- type inference
def infer_value_type(values: list[str]) -> str:
    """Reference inference.rs:33-96 thresholds over the sample strings:
    null-like tokens ('', 'null', 'nan' after trim) are filtered FIRST
    and every remaining value is trimmed before the type checks —
    100% i64-parsable → integer; >80% finite-float → float; ≥90%
    strict true/false → boolean; >70% matching any of the 8 anchored
    date shapes → date; else string."""
    vals = [v.strip() for v in values if not is_null_like_token(v)]
    if not vals:
        return "string"
    n = len(vals)
    if all(_parses_as_i64(v) for v in vals):
        return "integer"
    if sum(1 for v in vals if _FLOAT_RE.match(v)) / n > 0.8:
        return "float"
    if sum(1 for v in vals if v.lower() in _BOOL_SET) / n >= 0.9:
        return "boolean"
    if sum(1 for v in vals if _DATE_RE.match(v)) / n > 0.7:
        return "date"
    return "string"


def _summarize_sample(
    rows: list[dict[str, Any]], col_order: list[str]
) -> list[StructureColumnSummary]:
    out = []
    total = len(rows)
    for name in col_order:
        vals = [r.get(name) for r in rows]
        strs = [None if v is None else str(v) for v in vals]
        # null-like semantics match the reference's column.rs:35,110
        # (is_null_like_token): '', 'null', 'nan' count as null
        nulls = sum(1 for v in strs if is_null_like_token(v))
        nonnull = [v for v in strs if not is_null_like_token(v)]
        uniq = len(set(nonnull))
        out.append(
            StructureColumnSummary(
                name=name,
                data_type=infer_value_type(strs),
                total_count=total,
                null_count=nulls,
                null_ratio=round(nulls / total, 6) if total else None,
                unique_count=uniq,
                uniqueness_ratio=(
                    round(uniq / len(nonnull), 6) if nonnull else None
                ),
                provenance="sample",
            )
        )
    return out


# ------------------------------------------------------- sample readers
def _sample_csv(
    path: str, limit: int, sep: str, encoding: str
) -> tuple[list[dict], list[str], int]:
    """Header + up to limit+1 rows via the stdlib csv reader (handles
    quoting); ragged rows are counted, their extra cells dropped /
    missing cells padded — the reference's recovery policy."""
    import csv as _csv

    py_enc = {"ISO-8859-1": "latin-1"}.get(encoding, encoding)
    ragged = 0
    rows: list[dict] = []
    with open(path, encoding=py_enc, errors="replace", newline="") as f:
        reader = _csv.reader(f, delimiter=sep)
        header = next(reader, None) or []
        for rec in reader:
            if not any(cell.strip() for cell in rec):
                continue
            if len(rec) != len(header):
                ragged += 1
            rows.append({
                h: (rec[i] if i < len(rec) else None)
                for i, h in enumerate(header)
            })
            if len(rows) >= limit + 1:
                break
    return rows, header, ragged


def _sample_jsonl(path: str, limit: int) -> tuple[list[dict], int]:
    rows, malformed = [], 0
    with open(path, encoding="utf-8", errors="replace") as f:
        for ln in f:
            if not ln.strip():
                continue
            try:
                obj = json.loads(ln)
            except json.JSONDecodeError:
                malformed += 1
                continue
            if isinstance(obj, dict):
                rows.append(obj)
            else:
                malformed += 1
            if len(rows) >= limit + 1:
                break
    return rows, malformed


# --------------------------------------------------------------- public
def analyze_structure(
    path: str, max_rows: int | None = None
) -> StructureReport:
    """Bounded, lightweight structural pass: no quality scores, no
    pattern detection, no raw samples — format/delimiter/encoding
    diagnosis, exact-or-estimated rows, per-column structure from a
    ≤ max_rows sample (parquet: footer metadata only, zero data
    read)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"source not found: {path}")
    fmt = detect_format(path)
    if fmt.startswith("unknown"):
        raise ValueError(
            f"unsupported source extension for {path!r}: {fmt} — the "
            "reference rejects rather than guesses"
        )
    limit = max_rows or SCHEMA_SAMPLE_ROWS
    warnings: list[str] = []

    if fmt == "parquet":
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path)
        n_rows = meta.metadata.num_rows
        nulls_by_col: dict[str, int | None] = {}
        for name in meta.schema_arrow.names:
            tot = 0
            ok = True
            for rg in range(meta.metadata.num_row_groups):
                col_meta = None
                for ci in range(meta.metadata.row_group(rg).num_columns):
                    cc = meta.metadata.row_group(rg).column(ci)
                    if cc.path_in_schema == name:
                        col_meta = cc
                        break
                stats = col_meta.statistics if col_meta else None
                if stats is None or stats.null_count is None:
                    ok = False
                    break
                tot += stats.null_count
            nulls_by_col[name] = tot if ok else None
        cols = [
            StructureColumnSummary(
                name=f.name,
                data_type=str(f.type),
                total_count=n_rows,
                null_count=nulls_by_col[f.name],
                null_ratio=(
                    round(nulls_by_col[f.name] / n_rows, 6)
                    if n_rows and nulls_by_col[f.name] is not None
                    else None
                ),
                provenance="metadata",
            )
            for f in meta.schema_arrow
        ]
        return StructureReport(
            source=path, format=fmt,
            row_count=RowCountEstimate(n_rows, True, "metadata"),
            rows_sampled=0, source_exhausted=True, truncated=False,
            truncation_reason=None, delimiter=None, encoding=None,
            columns=cols, warnings=warnings,
        )

    delimiter = encoding = None
    if fmt == "csv":
        encoding = _readers.detect_encoding(path)
        delimiter = _readers.detect_delimiter(path)
        rows, header, ragged = _sample_csv(path, limit, delimiter, encoding)
        if ragged:
            warnings.append(
                f"{ragged} ragged row(s) in sample: cell count differs "
                "from header (extra cells dropped, missing padded)"
            )
        col_order = header
    elif fmt == "jsonl":
        rows, malformed = _sample_jsonl(path, limit)
        if malformed:
            warnings.append(
                f"{malformed} malformed line(s) skipped in sample"
            )
        col_order = sorted({k for r in rows for k in r})
    else:  # json array
        with open(path, encoding="utf-8", errors="replace") as f:
            data = json.load(f)
        rows = [r for r in data if isinstance(r, dict)][: limit + 1]
        col_order = sorted({k for r in rows for k in r})

    # "condition met on the last row is not truncation": we read
    # limit+1, so the extra row's existence IS the evidence
    truncated = len(rows) > limit
    rows = rows[:limit]
    rc = quick_row_count(path, fmt)
    if not rc.exact:
        warnings.append(
            f"row count is a windowed estimate ({ROW_SAMPLE_WINDOWS} "
            "sample windows), not exact"
        )
    return StructureReport(
        source=path, format=fmt, row_count=rc,
        rows_sampled=len(rows),
        source_exhausted=not truncated,
        truncated=truncated,
        truncation_reason=f"max_rows({limit})" if truncated else None,
        delimiter=delimiter, encoding=encoding,
        columns=_summarize_sample(rows, col_order),
        warnings=warnings,
    )
