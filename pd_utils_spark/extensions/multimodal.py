"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payload columns with typed metadata,
processed by Arrow-batched pandas kernels over ``mapInPandas``.

Codec policy (environments differ in what is installed):

- ``decode_image`` is REAL by default: Pillow when importable on the
  executors (any PIL-supported format), else a dependency-free
  container-header parser for PNG/GIF/BMP/JPEG — width/height/
  channels are fixed header fields, exact without a pixel codec.
  Unrecognized payloads yield NULLs, never task failures.
- ``resize_images``'s real path needs an actual pixel codec, so it
  requires Pillow (clear ``NotImplementedError`` on the driver when
  absent); ``fake=True`` keeps a deterministic hash kernel for
  codec-less CI.
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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_image_header(raw: bytes):
    """REAL, dependency-free image-container header parse: (width,
    height, channels, format) for PNG / GIF / BMP / JPEG payloads, or
    None when the bytes are not a recognized image. Dimensions and
    channel counts live in fixed header fields of each container —
    no pixel codec is needed to read them, so this path is exact on
    real image bytes even in codec-less environments."""
    if raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) >= 26:
        return (
            int.from_bytes(raw[16:20], "big"),
            int.from_bytes(raw[20:24], "big"),
            _PNG_CHANNELS.get(raw[25]),
            "png",
        )
    if raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
        return (
            int.from_bytes(raw[6:8], "little"),
            int.from_bytes(raw[8:10], "little"),
            3,
            "gif",
        )
    if raw[:2] == b"BM" and len(raw) >= 30:
        bpp = int.from_bytes(raw[28:30], "little")
        return (
            int.from_bytes(raw[18:22], "little", signed=True),
            abs(int.from_bytes(raw[22:26], "little", signed=True)),
            max(1, bpp // 8),
            "bmp",
        )
    if raw[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(raw) and raw[i] == 0xFF:
            marker = raw[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    int.from_bytes(raw[i + 7 : i + 9], "big"),
                    int.from_bytes(raw[i + 5 : i + 7], "big"),
                    raw[i + 9],
                    "jpeg",
                )
            i += 2 + int.from_bytes(raw[i + 2 : i + 4], "big")
    return None


def decode_image(
    df: DataFrame,
    datacol: str = "data",
    fake: bool = False,
) -> DataFrame:
    """Attach (width, height, channels, img_format) decoded from the
    binary payload via an Arrow-batched ``mapInPandas`` kernel.

    Real path (``fake=False``, default): if Pillow is importable on
    the executors it decodes every format PIL supports; otherwise the
    dependency-free container-header parser handles PNG/GIF/BMP/JPEG
    (dimensions and channel counts are header fields — exact without
    a pixel codec). Unrecognized payloads yield NULL columns rather
    than failing the job — at 100 TB a corrupt payload must never
    kill a task; filter on ``img_format IS NULL`` to quarantine.

    ``fake=True`` keeps the deterministic hash-derived fake kernel
    (``img_format='fake'``) for plumbing tests that need stable dims
    on arbitrary non-image bytes.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("img_format", StringType()),
        ]
    )

    if fake:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                dims = [
                    _fake_image_dims(d if d is not None else b"") for d in pdf[datacol]
                ]
                pdf = pdf.copy()
                pdf["width"] = [d[0] for d in dims]
                pdf["height"] = [d[1] for d in dims]
                pdf["channels"] = [d[2] for d in dims]
                pdf["img_format"] = "fake"
                yield pdf

    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            try:  # optional import, evaluated on the executor
                import io

                from PIL import Image  # type: ignore

                def parse(raw: bytes):
                    try:
                        with Image.open(io.BytesIO(raw)) as img:
                            return (
                                img.width,
                                img.height,
                                len(img.getbands()),
                                (img.format or "").lower() or None,
                            )
                    except Exception:
                        return _parse_image_header(raw)

            except ImportError:
                parse = _parse_image_header

            for pdf in batches:
                ws, hs, cs, fs = [], [], [], []
                for d in pdf[datacol]:
                    got = parse(bytes(d) if d is not None else b"")
                    w, h, c, fmt = got if got is not None else (None,) * 4
                    ws.append(w)
                    hs.append(h)
                    cs.append(c)
                    fs.append(fmt)
                pdf = pdf.copy()
                pdf["width"] = pd.array(ws, dtype="Int32")
                pdf["height"] = pd.array(hs, dtype="Int32")
                pdf["channels"] = pd.array(cs, dtype="Int32")
                pdf["img_format"] = fs
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
    out_format: str = "PNG",
) -> DataFrame:
    """Resize payloads to (width, height), re-encoded as
    ``out_format``. The real path (``fake=False``) decodes, resizes
    (bilinear) and re-encodes each payload with Pillow inside the
    Arrow-batched kernel — pixel resampling genuinely requires a
    codec, so it raises ``NotImplementedError`` up front when Pillow
    is not importable (checked on the driver for a clear error before
    any job runs). Payloads Pillow cannot open pass through as NULL
    (corrupt inputs must never kill a 100 TB job).

    ``fake=True``: deterministic hash kernel (payload + target dims ->
    16 bytes) for codec-less environments — exercises the
    binary-in/binary-out Arrow round trip with stable outputs.
    """
    if fake:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf[datacol] = [
                    hashlib.md5(
                        (bytes(d) if d is not None else b"")
                        + f"{width}x{height}".encode()
                    ).digest()
                    for d in pdf[datacol]
                ]
                yield pdf

        return df.mapInPandas(kernel, df.schema)

    try:
        import PIL  # noqa: F401  — driver-side availability check
    except ImportError as exc:
        raise NotImplementedError(
            "resize_images requires Pillow for the real resample path "
            "(pip install Pillow), or pass fake=True for the "
            "deterministic codec-less kernel"
        ) from exc

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            out = []
            for d in pdf[datacol]:
                try:
                    with Image.open(io.BytesIO(bytes(d))) as img:
                        buf = io.BytesIO()
                        img.resize((width, height)).save(buf, format=out_format)
                        out.append(buf.getvalue())
                except Exception:
                    out.append(None)
            pdf = pdf.copy()
            pdf[datacol] = out
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


def binary_ahash(
    df: DataFrame,
    datacol: str = "data",
    bits: int = 64,
) -> DataFrame:
    """Codec-free average-hash fingerprint of a binary payload,
    appended as ``ahash`` — a ``bits``-character '0'/'1' string. The
    byte stream is cut into ``bits`` contiguous strided segments
    (segment i spans ``[floor(i*n/bits), floor((i+1)*n/bits))``);
    bit i is 1 iff the segment's mean byte exceeds the WHOLE
    payload's mean byte. Byte at 0-based position p belongs to
    segment ``(p * bits) // n`` — the per-position floor mapping, so
    any engine reproduces the exact same partition from (p, n)
    alone. The comparison is evaluated as the integer cross-product
    ``seg_sum * n > total_sum * seg_len`` — no float ever enters, so
    the hash is bit-identical on any engine and any partitioning,
    which is what makes it usable as a dedup/join key.
    The aHash idea from perceptual image hashing, applied to raw
    bytes: same-structure payloads (same template, same container,
    retranscoded media) land on equal or near-equal hashes without
    decoding anything. Empty/null payloads hash to all zeros; empty
    segments (n < bits) contribute 0 bits.

    Scale shape: Arrow-batched ``mapInPandas`` numpy kernel (one pass
    per payload, O(n) per row, bounded memory), zero shuffles. Pair
    with a banded substring equi-join for hamming-near matching —
    the same pigeonhole plan ``simhash_near_dup_pairs`` uses.
    """
    import numpy as np

    if bits < 1:
        raise ValueError(f"bits must be >= 1: {bits}")

    out_schema = StructType(
        df.schema.fields + [StructField("ahash", StringType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for d in pdf[datacol]:
                raw = bytes(d) if d is not None else b""
                n = len(raw)
                if n == 0:
                    hashes.append("0" * bits)
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8)
                total = int(arr.sum())
                seg = (np.arange(n, dtype=np.int64) * bits) // n
                seg_sums = np.bincount(
                    seg, weights=arr.astype(np.float64), minlength=bits
                )
                seg_lens = np.bincount(seg, minlength=bits)
                out = []
                for i in range(bits):
                    if seg_lens[i] == 0:
                        out.append("0")
                        continue
                    # integer cross-product: exact on every engine
                    # (float64 sums of <= 255*n are exact integers
                    # far below 2^53)
                    lhs = int(seg_sums[i]) * n
                    rhs = total * int(seg_lens[i])
                    out.append("1" if lhs > rhs else "0")
                hashes.append("".join(out))
            pdf = pdf.copy()
            pdf["ahash"] = hashes
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def ahash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    idcol: str = "media_id",
    hashcol: str = "ahash",
) -> DataFrame:
    """Near-duplicate media pairs from :func:`binary_ahash`
    fingerprints: ``(id_a, id_b, hamming)`` with ``id_a < id_b`` and
    bitstring hamming distance <= ``max_hamming`` — the undecoded
    twin of perceptual-hash image dedup (same container re-saved,
    retranscoded media, templated binary payloads). Works on any
    '0'/'1' fingerprint column, so it composes with whatever hash the
    decode path produces.

    Scale shape — the pigeonhole plan ``simhash_near_dup_pairs``
    uses: the fingerprint splits into ``max_hamming + 1`` contiguous
    blocks; two hashes within ``max_hamming`` MUST agree exactly on
    at least one block, so candidates come from ``max_hamming + 1``
    (block_id, block_substring) equi-joins (one exploded join),
    never an all-pairs comparison. Verification is a JVM-side
    ``zip_with`` over the two bit arrays — no Python in the join
    path. Flood behavior: all-identical payloads share every block;
    dedup exact duplicates first (``ahash`` equality group-by) when
    the corpus is copy-heavy.
    """
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0: {max_hamming}")
    nblocks = max_hamming + 1
    h = F.col(hashcol)
    bits = F.length(h)
    # block b spans [floor(b*len/nblocks) + 1, floor((b+1)*len/nblocks)]
    # (1-based substring) — same floor partition rule as binary_ahash's
    # byte segments, so any engine reproduces it from (b, len) alone
    blk = df.select(
        F.col(idcol).alias("__id__"),
        h.alias("__h__"),
        F.explode(F.sequence(F.lit(0), F.lit(nblocks - 1))).alias("__b__"),
    ).select(
        "__id__",
        "__h__",
        "__b__",
        F.expr(
            f"substring(__h__, cast(__b__ * length(__h__) / {nblocks} as int)"
            f" + 1, cast((__b__ + 1) * length(__h__) / {nblocks} as int)"
            f" - cast(__b__ * length(__h__) / {nblocks} as int))"
        ).alias("__bv__"),
    )
    a, b = blk.alias("a"), blk.alias("b")
    ham = F.aggregate(
        F.zip_with(
            F.split(F.col("a.__h__"), "(?!^)"),
            F.split(F.col("b.__h__"), "(?!^)"),
            lambda x, y: (x != y).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cand = (
        a.join(
            b,
            (F.col("a.__b__") == F.col("b.__b__"))
            & (F.col("a.__bv__") == F.col("b.__bv__"))
            & (F.col("a.__id__") < F.col("b.__id__")),
        )
        .select(
            F.col("a.__id__").alias("id_a"),
            F.col("b.__id__").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
