"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payload columns with typed metadata,
processed by Arrow-batched pandas kernels over ``mapInPandas``.

The actual media codecs (PIL/libav/etc.) are NOT available in this
environment, so the decode kernels are explicitly STUBBED:

- ``decode_image`` / ``resize_images`` raise ``NotImplementedError``
  unless a real decoder import succeeds, OR run a clearly-marked
  deterministic fake (``fake=True``) that derives plausible
  dimensions from the payload bytes — enough to exercise the real
  Spark plumbing (schema evolution, Arrow batch shapes, partition
  behavior) end-to-end.
- Byte-level feature extraction (``byte_features``) is REAL — byte
  histograms/entropy need no codec and are genuine content signals
  (format detection, corruption screening, dedup pre-filter).

Scale design: payloads stay in executor memory only for the duration
of one Arrow batch (bound by ``spark.sql.execution.arrow
.maxRecordsPerBatch`` — set it low for multi-MB payloads); kernels
are per-partition streams, so a 100 TB corpus processes with
constant memory per task. Frame sampling EXPLODES rows — its output
is repartition-friendly (one frame row is independent of its
siblings).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-row schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def _fake_image_dims(data: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode — stands in for a real codec. Derives
    (width, height, channels) from the payload hash; stable across
    runs/engines so tests can assert exact values."""
    h = hashlib.md5(data or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 4


def decode_image(
    df: DataFrame,
    datacol: str = "data",
    fake: bool = False,
) -> DataFrame:
    """Attach (width, height, channels) decoded from the binary
    payload via ``mapInPandas``. STUB: only the deterministic fake
    kernel is implemented — ``fake=False`` ALWAYS raises (even if a
    codec library happens to be importable, a fake result must never
    masquerade as a real decode); a real codec kernel would slot into
    the same mapInPandas shape."""
    if not fake:
        raise NotImplementedError(
            "decode_image is a stub: only the deterministic fake kernel "
            "exists (pass fake=True for plumbing test mode); a real codec "
            "kernel is not implemented in this environment"
        )

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_image_dims(d if d is not None else b"") for d in pdf[datacol]]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["channels"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def byte_features(
    df: DataFrame,
    datacol: str = "data",
    bins: int = 16,
) -> DataFrame:
    """REAL (no codec needed) content features from the raw bytes:
    ``n_bytes``, ``byte_entropy`` (Shannon, bits), and a
    ``byte_hist`` array of ``bins`` normalized bucket frequencies.
    Arrow-batched numpy kernel via ``mapInPandas``. ``bins`` must
    divide 256 (the histogram buckets the 256 byte values evenly)."""
    import numpy as np

    if bins < 1 or 256 % bins != 0:
        raise ValueError(f"bins must divide 256 evenly, got {bins}")

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("n_bytes", LongType()),
            StructField("byte_entropy", DoubleType()),
            StructField("byte_hist", ArrayType(DoubleType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_list, ent_list, hist_list = [], [], []
            for d in pdf[datacol]:
                raw = bytes(d) if d is not None else b""
                arr = np.frombuffer(raw, dtype=np.uint8)
                n_list.append(len(arr))
                if len(arr):
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    p = counts / counts.sum()
                    nz = p[p > 0]
                    ent_list.append(float(-(nz * np.log2(nz)).sum()))
                    hist = counts.reshape(bins, 256 // bins).sum(axis=1) / counts.sum()
                    hist_list.append([float(x) for x in hist])
                else:
                    ent_list.append(0.0)
                    hist_list.append([0.0] * bins)
            pdf = pdf.copy()
            pdf["n_bytes"] = n_list
            pdf["byte_entropy"] = ent_list
            pdf["byte_hist"] = hist_list
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    datacol: str = "data",
    fake: bool = False,
) -> DataFrame:
    """Resize payloads to (width, height). STUB: only the fake path
    exists — it re-hashes the payload with the target dims so output
    bytes are deterministic and size-bounded, exercising the
    binary-in/binary-out Arrow round trip. ``fake=False`` ALWAYS
    raises (a fake result must never masquerade as a real resize)."""
    if not fake:
        raise NotImplementedError(
            "resize_images is a stub: only the deterministic fake kernel "
            "exists (pass fake=True); a real codec kernel is not "
            "implemented in this environment"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[datacol] = [
                hashlib.md5(
                    (bytes(d) if d is not None else b"") + f"{width}x{height}".encode()
                ).digest()
                for d in pdf[datacol]
            ]
            yield pdf

    return df.mapInPandas(kernel, df.schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 2,
    datacol: str = "data",
    frame_size: int = 64,
    out_frame: str = "frame_data",
) -> DataFrame:
    """Frame sampling (1 video row -> n frame rows). The FAKE codec
    treats the payload as concatenated fixed-size frames
    (``frame_size`` bytes each) and emits every ``every_n``-th one —
    the real Spark work (row explosion, schema, batch shapes) is
    identical with a real demuxer kernel.

    Output adds (frame_index, frame_data) and keeps input columns.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("frame_index", IntegerType()),
            StructField(out_frame, BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = bytes(row[datacol]) if row[datacol] is not None else b""
                n_frames = len(raw) // frame_size
                for fi in range(0, n_frames, every_n):
                    rec = row.to_dict()
                    rec["frame_index"] = fi
                    rec[out_frame] = raw[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(rec)
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, out_schema)


def text_to_media(
    df: DataFrame,
    textcol: str = "text",
    idcol: str = "doc_id",
    kind: str = "image",
) -> DataFrame:
    """Test harness: manufacture a media-shaped frame (binary payload
    = utf-8 bytes of the text) so multimodal plumbing can run against
    the documents table in environments with no real media files."""
    return df.select(
        F.col(idcol).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(textcol), "utf-8").cast("binary").alias("data"),
        F.lit("application/octet-stream").alias("mime"),
    )
