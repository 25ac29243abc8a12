"""Multimodal column plumbing (north star ops).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. Two feature tiers:

  * CODEC-FREE byte-level features — size, magic-number format sniff,
    byte histogram stats (mean/modal byte), Shannon byte entropy,
    distinct byte count, strided frame sample. These are REAL on any
    blob (no decoder needed) and are what a 100 TB ingest runs first:
    corrupt-file triage, format routing, compressed-vs-text detection
    (entropy ≈ 8 bits ⇒ already compressed).
  * The codec tier — ``decode_media(..., codec="real")`` is the marked
    extension point and raises ``NotImplementedError`` (image/audio
    libraries are not in this container); the default fake codec is the
    identity so the full dataflow stays exercised.

At 100 TB: media bytes ride the same parquet scan as the metadata
(no side-channel fetch), ``mapInPandas`` processes whole Arrow record
batches (numpy histogram per blob, no per-byte Python), and
``spark.sql.files.maxPartitionBytes`` bounds decoder memory per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("top_byte", T.IntegerType(), True),
        T.StructField("n_distinct_bytes", T.IntegerType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("frame_sample", T.ArrayType(T.IntegerType()), True),
    ]
)

# magic-number table for the codec-free format sniff (prefix → MIME)
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"%PDF-", "application/pdf"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (b"\x1aE\xdf\xa3", "video/webm"),
    (b"\x1f\x8b", "application/gzip"),
    (b"PK\x03\x04", "application/zip"),
]


def sniff_format(raw: bytes) -> str:
    """Codec-free container detection from leading magic bytes — the
    format-routing step of a media ingest. Unknown blobs fall through
    to application/octet-stream."""
    for magic, fmt in _MAGIC:
        if raw.startswith(magic):
            return fmt
    if raw[4:8] == b"ftyp":
        return "video/mp4"
    if raw.startswith(b"RIFF"):
        if raw[8:12] == b"WAVE":
            return "audio/wav"
        if raw[8:12] == b"AVI ":
            return "video/avi"
        return "application/riff"
    return "application/octet-stream"


def fake_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic binary payloads: the utf-8 bytes of each document
    act as an opaque media blob, with typed metadata alongside."""
    media = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("fake/bin").alias("format"),
            F.octet_length(media).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _pil():
    """Import-guarded Pillow handle: the real-codec tier activates
    when the library exists, stays hermetically absent when it
    doesn't (this container ships no codec libs)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_media(media_bytes: bytes, codec: str = "fake") -> bytes:
    """The codec boundary. ``codec="real"`` decodes via Pillow when it
    is importable (image bytes → raw RGB24), and raises
    ``NotImplementedError`` otherwise — the marked extension point
    stays honest in codec-free environments."""
    if codec == "real":
        image_mod = _pil()
        if image_mod is None:
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present in this container"
            )
        import io

        with image_mod.open(io.BytesIO(media_bytes)) as im:
            return im.convert("RGB").tobytes()
    return media_bytes  # fake codec: identity — plumbing stays real


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("n_pixels", T.LongType(), True),
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Real-codec tier: per-image width/height/mode via Pillow inside
    ``mapInPandas`` (Arrow batches; one open per blob, header-only
    parse — PIL is lazy, pixel data is not decoded for size/mode).
    Undecodable blobs yield null features (corrupt-file triage rows),
    mirroring how a 100 TB ingest quarantines rather than dies.
    Raises ``NotImplementedError`` on the driver — before any job is
    launched — when Pillow is absent."""
    if _pil() is None:
        raise NotImplementedError(
            "extract_image_features requires Pillow; this container has no codec libs"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        image_mod = _pil()
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                try:
                    with image_mod.open(io.BytesIO(bytes(blob))) as im:
                        rows.append(
                            (int(doc_id), im.width, im.height, im.mode,
                             im.width * im.height)
                        )
                except Exception:
                    rows.append((int(doc_id), None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return media.select("doc_id", "media").mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_off", T.LongType(), False),
        T.StructField("n_frame_bytes", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 2, codec: str = "fake"
) -> DataFrame:
    """Frame sampling over binary media: split each blob into fixed
    ``frame_bytes`` frames and emit every ``stride``-th one as its own
    row — the video/audio frame-extraction plumbing (one row per kept
    frame, ready for a per-frame decoder or embedding stage).

    Row amplification happens INSIDE mapInPandas (Arrow batch in,
    longer Arrow batch out), so blobs never ride a shuffle to be split.
    Frame identity is md5 over the frame's UPPERCASE hex — the one
    blob-slice spelling DuckDB can mirror (`md5(substr(hex(b), …))`),
    keeping even this binary operator differentially checkable.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                raw = decode_media(bytes(blob), codec=codec)
                n = len(raw)
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = raw[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            i * frame_bytes,
                            len(frame),
                            hashlib.md5(frame.hex().upper().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("doc_id", "media").mapInPandas(batches, FRAME_SCHEMA)


def extract_media_features(media: DataFrame, codec: str = "fake", frame_stride: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    Per blob, all codec-free (real on any blob): byte count, sniffed
    container format, mean byte value, modal byte (min wins ties),
    distinct byte count, Shannon byte entropy in bits (≈8 ⇒ already
    compressed/encrypted, low ⇒ text-like — the classic quality/triage
    signal), and a strided "frame sample" (every ``frame_stride``-th
    byte) — the deterministic stand-in for image resize / audio
    frame-sampling. One numpy histogram per blob; no per-byte Python.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                raw = decode_media(bytes(blob), codec=codec)
                fmt = sniff_format(raw)
                n = len(raw)
                if n == 0:
                    rows.append((int(doc_id), 0, fmt, None, None, 0, 0.0, []))
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                nz = counts[counts > 0].astype(np.float64)
                p = nz / n
                entropy = float(-(p * np.log2(p)).sum())
                rows.append(
                    (
                        int(doc_id),
                        n,
                        fmt,
                        float(arr.sum(dtype=np.int64)) / n,
                        int(np.argmax(counts)),  # first max == smallest byte
                        int(nz.size),
                        entropy,
                        [int(x) for x in raw[::frame_stride]],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "format", "mean_byte", "top_byte",
                    "n_distinct_bytes", "byte_entropy", "frame_sample",
                ],
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
