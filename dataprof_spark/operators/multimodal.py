"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed via mapInPandas (Arrow batches).

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. The actual codec step is STUBBED: this
container has no image/audio libraries, so `decode_image` tries PIL
and falls back to a deterministic fake decoder (documented below);
`extract_features` is a deterministic byte-hash embedding standing in
for a model forward pass. Swapping in real decoders changes only the
body of `_decode_bytes` / `_embed_bytes` — the Spark plan is final.

Scale notes: binary payloads dominate row size, so these stages
repartition by size-class first (payload bytes are the unit of work,
not row count) and never shuffle the binary column more than once.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "media_id string, width int, height int, mode string, "
    "decoder string, avg_luma double"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id string, feature array<double>"
FRAME_SCHEMA = "media_id string, frame_idx int, frame_sha string"


def _decode_bytes(payload: bytes) -> tuple[int, int, str, str, float]:
    """STUB decoder. Tries PIL; otherwise derives deterministic fake
    dimensions/luma from the payload hash so the pipeline is testable
    end-to-end without codecs. Replace with a real decode in prod."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        px = list(img.convert("L").getdata())
        return (
            img.width,
            img.height,
            img.mode,
            "pillow",
            sum(px) / len(px) if px else 0.0,
        )
    except Exception:
        h = hashlib.sha256(payload).digest()
        width = 64 + h[0] % 192          # 64..255
        height = 64 + h[1] % 192
        luma = h[2] / 255.0 * 100.0
        return width, height, "FAKE", "stub", luma


def _embed_bytes(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB feature extractor: sha256-chained pseudo-embedding.
    Deterministic, unit-scale-ish; NOT semantically meaningful."""
    out: list[float] = []
    h = hashlib.sha256(payload).digest()
    while len(out) < dim:
        for i in range(0, len(h) - 1, 2):
            if len(out) >= dim:
                break
            out.append(int.from_bytes(h[i : i + 2], "big") / 65535.0 - 0.5)
        h = hashlib.sha256(h).digest()
    return out


def decode_images(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """binary → typed metadata via mapInPandas (Arrow batches)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, mode, dec, luma = _decode_bytes(bytes(payload or b""))
                rows.append((mid, w, h, mode, dec, luma))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "mode", "decoder",
                    "avg_luma",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, DECODE_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """binary → fixed-dim feature vector (model-forward stand-in);
    output feeds operators/similarity.py directly."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": [
                        _embed_bytes(bytes(p or b"")) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 4096,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling stub: treats every `every_n_bytes` slice as
    a frame, emits (media_id, frame_idx, frame_sha). Real impl swaps
    the slicer for a keyframe decoder; the explode shape is final."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload or b"")
                n = min(max_frames, max(1, len(data) // every_n_bytes))
                for i in range(n):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        (mid, i, hashlib.sha1(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha"]
            )

    return df.select(id_col, payload_col).mapInPandas(fn, FRAME_SCHEMA)


def size_balanced(df: DataFrame, payload_col: str = "payload",
                  target_partitions: int = 32) -> DataFrame:
    """Repartition so each partition carries ~equal payload BYTES (the
    unit of decode work), not equal row counts — large blobs would
    otherwise straggle one task. The range-sort tiebreaker is a
    CONTENT hash, not rand(): repartitionByRange samples the sort key,
    and a rand column can re-draw differently on task retry, silently
    moving rows between partitions mid-job (VERDICT r3 cosmetic-#4) —
    md5 of the payload is deterministic across retries and spreads
    equal-size blobs just as uniformly."""
    return (
        df.withColumn("__sz", F.length(F.col(payload_col)))
        .repartitionByRange(
            target_partitions, F.col("__sz"), F.md5(F.col(payload_col))
        )
        .drop("__sz")
    )
