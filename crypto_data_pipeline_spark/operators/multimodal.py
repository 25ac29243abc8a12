"""Multimodal column plumbing (north star ops).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. Three feature tiers:

  * CODEC-FREE byte-level features — size, magic-number format sniff,
    byte histogram stats (mean/modal byte), Shannon byte entropy,
    distinct byte count, strided frame sample. These are REAL on any
    blob (no decoder needed) and are what a 100 TB ingest runs first:
    corrupt-file triage, format routing, compressed-vs-text detection
    (entropy ≈ 8 bits ⇒ already compressed).
  * The BUILTIN codec — dependency-free pure-Python decoders for the
    two uncompressed public formats (24-bit BI_RGB BMP, binary PPM)
    → raw RGB24. A real decode that runs hermetically in this
    container, exercising the full decode→feature/frame dataflow.
  * The REAL codec — ``decode_media(..., codec="real")`` via Pillow
    when importable, ``NotImplementedError`` otherwise (compressed
    formats need libraries this container doesn't ship); the default
    fake codec is the identity so plumbing tests stay cheap.

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
    is importable (image bytes → raw RGB24) and raises
    ``NotImplementedError`` otherwise — the marked extension point
    stays honest in codec-free environments. ``codec="builtin"``
    decodes the two uncompressed public formats (24-bit BMP, binary
    PPM) with the dependency-free parsers below — a REAL decode that
    runs hermetically in this container."""
    if codec == "real":
        image_mod = _pil()
        if image_mod is None:
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present in this container"
            )
        import io

        with image_mod.open(io.BytesIO(media_bytes)) as im:
            return im.convert("RGB").tobytes()
    if codec == "builtin":
        return decode_image_builtin(media_bytes)[3]
    return media_bytes  # fake codec: identity — plumbing stays real


def _ppm_header_tokens(raw: bytes) -> tuple[list[bytes], int]:
    """Scan the 4 Netpbm header tokens (magic, w, h, maxval): ASCII
    tokens separated by whitespace, ``#`` comments to end-of-line.
    Returns (tokens, index-just-past-the-last-token)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4 and i < len(raw):
        c = raw[i : i + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        elif c == b"#":
            j = raw.find(b"\n", i)
            i = len(raw) if j < 0 else j + 1
        else:
            j = i
            while j < len(raw) and raw[j : j + 1] not in (b" ", b"\t", b"\r", b"\n", b"#"):
                j += 1
            toks.append(raw[i:j])
            i = j
    return toks, i


def _parse_ppm(raw: bytes) -> tuple[int, int, str, bytes]:
    """Binary PPM (P6, maxval ≤ 255) → (width, height, "RGB", rgb24).
    Exactly ONE whitespace byte sits between the maxval token and the
    pixel payload (Netpbm spec)."""
    toks, i = _ppm_header_tokens(raw)
    if len(toks) != 4 or toks[0] != b"P6":
        raise ValueError("not a binary PPM (P6) header")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if w <= 0 or h <= 0 or not 0 < maxval < 256:
        raise ValueError("unsupported PPM geometry/maxval")
    # the byte after maxval MUST be a single whitespace (Netpbm spec);
    # anything else (e.g. a '#' starting a comment there) would make
    # the pixel-offset arithmetic read garbage as image data — corrupt
    # headers must quarantine, not decode silently wrong
    if raw[i : i + 1] not in (b" ", b"\t", b"\r", b"\n"):
        raise ValueError("malformed PPM: maxval not followed by whitespace")
    px = raw[i + 1 : i + 1 + 3 * w * h]
    if len(px) != 3 * w * h:
        raise ValueError("truncated PPM pixel payload")
    return w, h, "RGB", px


def _parse_bmp(raw: bytes) -> tuple[int, int, str, bytes]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) →
    (width, height, "RGB", rgb24). Handles the format's two quirks:
    rows are stored bottom-up (unless height is negative) with 4-byte
    padding, and pixels are B,G,R order."""
    import struct

    if raw[:2] != b"BM" or len(raw) < 54:
        raise ValueError("not a BMP file")
    off = struct.unpack_from("<I", raw, 10)[0]
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
        raise ValueError("builtin BMP decoder supports only 24bpp BI_RGB")
    bottom_up, h = h_signed > 0, abs(h_signed)
    stride = (w * 3 + 3) & ~3
    if len(raw) < off + stride * h:
        raise ValueError("truncated BMP pixel payload")
    rows = np.frombuffer(raw, np.uint8, count=stride * h, offset=off).reshape(h, stride)
    rows = rows[::-1] if bottom_up else rows
    # strip row padding, flip BGR→RGB — two numpy slices, no per-pixel Python
    return w, h, "RGB", rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].tobytes()


def decode_image_builtin(raw: bytes) -> tuple[int, int, str, bytes]:
    """Dependency-free image decode for the uncompressed public
    formats: 24-bit BMP and binary PPM. Returns
    (width, height, mode, rgb24_bytes); raises ValueError on anything
    else (corrupt-file triage, same contract as the Pillow tier)."""
    if raw[:2] == b"BM":
        return _parse_bmp(raw)
    if raw[:2] == b"P6":
        return _parse_ppm(raw)
    raise ValueError("builtin codec handles only 24-bit BMP and binary PPM")


def image_header_builtin(raw: bytes) -> tuple[int, int, str]:
    """Header-only (width, height, mode): full geometry/payload-length
    validation, ZERO pixel copies — PIL-style laziness for the builtin
    tier, the property that matters when a feature pass only needs
    dimensions from multi-megabyte blobs. Validation is identical to
    the full decode (a truncated payload still raises), only the
    BGR→RGB materialization is skipped."""
    if raw[:2] == b"BM":
        import struct

        if len(raw) < 54:
            raise ValueError("not a BMP file")
        off = struct.unpack_from("<I", raw, 10)[0]
        w, h_signed = struct.unpack_from("<ii", raw, 18)
        bpp = struct.unpack_from("<H", raw, 28)[0]
        comp = struct.unpack_from("<I", raw, 30)[0]
        if bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
            raise ValueError("builtin BMP decoder supports only 24bpp BI_RGB")
        h = abs(h_signed)
        stride = (w * 3 + 3) & ~3
        if len(raw) < off + stride * h:
            raise ValueError("truncated BMP pixel payload")
        return w, h, "RGB"
    if raw[:2] == b"P6":
        # _parse_ppm would slice (copy) the payload; header-only does
        # the identical token parse + arithmetic length check instead
        toks, i = _ppm_header_tokens(raw)
        if len(toks) != 4 or toks[0] != b"P6":
            raise ValueError("not a binary PPM (P6) header")
        w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
        if w <= 0 or h <= 0 or not 0 < maxval < 256:
            raise ValueError("unsupported PPM geometry/maxval")
        if raw[i : i + 1] not in (b" ", b"\t", b"\r", b"\n"):
            raise ValueError("malformed PPM: maxval not followed by whitespace")
        if len(raw) - (i + 1) < 3 * w * h:
            raise ValueError("truncated PPM pixel payload")
        return w, h, "RGB"
    raise ValueError("builtin codec handles only 24-bit BMP and binary PPM")


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("n_pixels", T.LongType(), True),
    ]
)


def extract_image_features(media: DataFrame, codec: str = "real") -> DataFrame:
    """Image-decode tier: per-image width/height/mode inside
    ``mapInPandas`` (Arrow batches). ``codec="real"`` opens blobs via
    Pillow (one open per blob, header-only parse — PIL is lazy, pixel
    data is not decoded for size/mode) and raises
    ``NotImplementedError`` on the driver — before any job launches —
    when Pillow is absent. ``codec="builtin"`` uses the hermetic
    pure-Python BMP/PPM decoders, so the decode path runs for real in
    this container. Either way, undecodable blobs yield null features
    (corrupt-file triage rows), mirroring how a 100 TB ingest
    quarantines rather than dies."""
    if codec == "real" and _pil() is None:
        raise NotImplementedError(
            "extract_image_features requires Pillow; this container has no codec libs"
        )
    if codec not in ("real", "builtin"):
        raise ValueError(f"unknown image codec {codec!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        image_mod = _pil() if codec == "real" else None

        def header(blob: bytes) -> tuple[int, int, str]:
            if image_mod is not None:
                with image_mod.open(io.BytesIO(blob)) as im:
                    return im.width, im.height, im.mode
            # header-only: no pixel materialization just to read dims
            return image_header_builtin(blob)

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                try:
                    w, h, mode = header(bytes(blob))
                    rows.append((int(doc_id), w, h, mode, w * h))
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
