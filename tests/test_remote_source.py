"""S7 remote-FS parquet: HTTP range-request reader against a real
(localhost) HTTP server — the sandbox-testable twin of the
reference's async_http.rs. Proves (a) footer-only metadata never
downloads the data pages, (b) the data path round-trips into a Spark
DataFrame, (c) column pruning reduces bytes on the wire."""

from __future__ import annotations

import http.server
import os
import threading

import pytest

from dataprof_spark.sources import remote

ROOT = "/root/testdata"
SF_DIR = "/root/testdata/sf0.001"


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """Minimal static server WITH Range support (http.server's
    SimpleHTTPRequestHandler ignores Range, which would silently turn
    every footer read into a full download)."""

    def _path(self):
        return os.path.join(ROOT, self.path.lstrip("/"))

    def do_HEAD(self):
        size = os.path.getsize(self._path())
        self.send_response(200)
        self.send_header("Content-Length", str(size))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        p = self._path()
        size = os.path.getsize(p)
        rng = self.headers.get("Range")
        with open(p, "rb") as f:
            if rng and rng.startswith("bytes="):
                start_s, end_s = rng[len("bytes="):].split("-", 1)
                start = int(start_s)
                end = int(end_s) if end_s else size - 1
                f.seek(start)
                body = f.read(end - start + 1)
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{size}"
                )
            else:
                body = f.read()
                self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _RangeHandler
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_footer_only_schema(http_base):
    # pyarrow reads a 64 KiB tail speculatively for the footer (the
    # same footer-first tail fetch async_http.rs does), so prove the
    # "no full download" property on a file comfortably above 64 KiB
    url = f"{http_base}/sf0.01/lineitem.parquet"  # ~1.0 MiB
    meta = remote.http_parquet_schema(url)
    assert meta.num_rows > 0
    assert "l_orderkey" in meta.schema_names
    assert meta.bytes_fetched < meta.file_size / 4
    assert meta.requests_made <= 6


def test_remote_read_round_trips(spark, http_base):
    df = remote.read_parquet_http(
        spark, f"{http_base}/sf0.001/region.parquet"
    )
    local = spark.read.parquet(f"{SF_DIR}/region.parquet")
    assert sorted(df.columns) == sorted(local.columns)
    assert df.count() == local.count() == 5


def test_column_pruning_reduces_bytes(spark, http_base):
    url = f"{http_base}/sf0.01/lineitem.parquet"
    import pyarrow.parquet as pq

    all_f = remote.HttpRangeFile(url)
    pq.ParquetFile(all_f).read()
    one_f = remote.HttpRangeFile(url)
    pq.ParquetFile(one_f).read(columns=["l_orderkey"])
    assert one_f.bytes_fetched < all_f.bytes_fetched


class _NoRangeHandler(_RangeHandler):
    """Server that IGNORES Range (SimpleHTTPRequestHandler behavior):
    always 200 + full body."""

    def do_GET(self):
        with open(self._path(), "rb") as f:
            body = f.read()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def norange_base():
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _NoRangeHandler
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_range_ignoring_server_downloads_once(norange_base):
    """ADVICE r3: when a server ignores Range, every read used to
    re-download the full body (pyarrow issues several reads for
    tail/footer/readahead). The first 200 now caches the body, warns,
    and serves later reads locally — exactly ONE full download on the
    wire regardless of read count."""
    import os as _os
    import warnings

    import pyarrow.parquet as pq

    url = f"{norange_base}/sf0.01/nation.parquet"
    size = _os.path.getsize("/root/testdata/sf0.01/nation.parquet")
    f = remote.HttpRangeFile(url)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        meta = pq.ParquetFile(f).metadata
    assert meta.num_rows > 0
    assert any("ignored the Range header" in str(w.message)
               for w in caught)
    # one HEAD + one full GET; the GET body equals the file size and
    # is fetched exactly once even though pyarrow read several ranges
    assert f.bytes_fetched == size
    assert f.requests_made == 2
