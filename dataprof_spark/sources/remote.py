"""Remote-FS parquet source (S7) — HTTP range-request reader.

Reference parity: crates/dataprof-parquet/src/async_http.rs (543 LoC)
reads remote parquet footer-first over HTTP Range requests: fetch the
8-byte tail for the footer length, then the footer, then only the
row groups asked for. Spark's bundled HttpFileSystem cannot back a
DataFrame scan (no listStatus), so this module provides the same
contract Python-side:

- ``http_parquet_schema(url)`` — schema + row count from RANGE
  requests only (never downloads the data pages), the remote twin of
  the S5 footer-only local reader. Request/byte counters are exposed
  so tests can prove no full-file download happened.
- ``read_parquet_http(spark, url)`` — materializes the remote file
  through pyarrow into a Spark DataFrame.

Scale note: this is a DRIVER-SIDE ingest path for small/remote
side-inputs (exactly the reference's use: profiling a remote file).
Bulk data at 100 TB belongs on a real distributed FS (s3a/abfs/hdfs)
where `spark.read.parquet` scans natively; this module is the
metadata/ingest convenience, not the fact-table scan path.
"""

from __future__ import annotations

import io
import urllib.request
from dataclasses import dataclass, field


@dataclass
class HttpRangeFile:
    """Seekable read-only file over HTTP Range requests (the pyarrow
    file-like protocol: read/seek/tell/size). Counts requests and
    bytes so callers can assert footer-only access."""

    url: str
    _pos: int = 0
    _size: int | None = None
    _full_body: bytes | None = None
    requests_made: int = field(default=0)
    bytes_fetched: int = field(default=0)

    def size(self) -> int:
        if self._size is None:
            req = urllib.request.Request(self.url, method="HEAD")
            with urllib.request.urlopen(req) as resp:
                self._size = int(resp.headers["Content-Length"])
            self.requests_made += 1
        return self._size

    # pyarrow probes `closed` as an ATTRIBUTE (a bound method would be
    # truthy → "file closed"); dataclass fields can't be properties,
    # so expose it as a plain class attribute
    closed: bool = False

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def close(self) -> None:
        pass

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            self._pos = offset
        elif whence == io.SEEK_CUR:
            self._pos += offset
        elif whence == io.SEEK_END:
            self._pos = self.size() + offset
        return self._pos

    def read(self, nbytes: int | None = None) -> bytes:
        start = self._pos
        end = self.size() - 1 if nbytes is None else start + nbytes - 1
        if end < start:
            return b""
        if self._full_body is not None:
            # a previous 200 proved the server ignores Range: serve
            # every later read from the cached body instead of
            # re-downloading the whole file per pyarrow probe
            data = self._full_body[start:end + 1]
            self._pos += len(data)
            return data
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={start}-{end}"}
        )
        with urllib.request.urlopen(req) as resp:
            data = resp.read()
            status = resp.status
        self.requests_made += 1
        self.bytes_fetched += len(data)  # honest wire accounting
        if status == 200:
            # Server ignored Range (some plain file servers do).
            # ADVICE r3: without caching, EVERY read re-downloads the
            # full body (pyarrow issues several for tail/footer/
            # readahead) and the footer-only guarantee silently
            # degrades to N full downloads. Cache the body once, warn
            # once, and serve all later reads locally — counters still
            # record the one real download.
            import warnings

            warnings.warn(
                f"server at {self.url} ignored the Range header; "
                "footer-only access degraded to ONE full download "
                "(body cached for subsequent reads)",
                RuntimeWarning,
                stacklevel=2,
            )
            self._full_body = data
            data = data[start:end + 1]
        self._pos += len(data)
        return data


@dataclass
class RemoteParquetMeta:
    num_rows: int
    num_row_groups: int
    schema_names: list[str]
    file_size: int
    requests_made: int
    bytes_fetched: int


def http_parquet_schema(url: str) -> RemoteParquetMeta:
    """Footer-only remote metadata (async_http.rs:footer path): the
    bytes fetched are the footer + pyarrow's readahead, never the
    data pages — the returned counters let callers verify."""
    import pyarrow.parquet as pq

    f = HttpRangeFile(url)
    pf = pq.ParquetFile(f)
    meta = pf.metadata
    return RemoteParquetMeta(
        num_rows=meta.num_rows,
        num_row_groups=meta.num_row_groups,
        schema_names=list(meta.schema.to_arrow_schema().names),
        file_size=f.size(),
        requests_made=f.requests_made,
        bytes_fetched=f.bytes_fetched,
    )


def read_parquet_http(spark, url: str, columns: list[str] | None = None):
    """Remote parquet → Spark DataFrame (column pruning pushed into
    the HTTP reads: only the requested columns' pages are fetched)."""
    import pyarrow.parquet as pq

    f = HttpRangeFile(url)
    table = pq.ParquetFile(f).read(columns=columns)
    return spark.createDataFrame(table.to_pandas())
