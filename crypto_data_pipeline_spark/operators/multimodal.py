"""Multimodal column plumbing (north star ops).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-preserving
``mapInPandas``, Arrow batch shape — is real and tested; the actual
codec step is STUBBED (the image/audio libraries are not in this
container): ``decode_media(..., codec="real")`` raises
``NotImplementedError``, while the default deterministic fake decoder
exercises the identical dataflow (bytes in → feature vector out).

At 100 TB: media bytes ride the same parquet scan as the metadata
(no side-channel fetch), ``mapInPandas`` processes whole Arrow record
batches (no per-row Python), and ``spark.sql.files.maxPartitionBytes``
bounds decoder memory per task.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("top_byte", T.IntegerType(), True),
        T.StructField("frame_sample", T.ArrayType(T.IntegerType()), True),
    ]
)


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


def decode_media(media_bytes: bytes, codec: str = "fake") -> bytes:
    """The codec boundary. Real decoders (PIL/ffmpeg/librosa) are not
    available in this environment — ``codec="real"`` is the marked
    extension point."""
    if codec == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present in this container"
        )
    return media_bytes  # fake codec: identity — plumbing stays real


def extract_media_features(media: DataFrame, codec: str = "fake", frame_stride: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    Per blob: byte count, mean byte value, modal byte (min wins ties),
    and a strided "frame sample" (every ``frame_stride``-th byte) —
    the deterministic stand-in for image resize / audio frame-sampling.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                raw = decode_media(bytes(blob), codec=codec)
                if len(raw) == 0:
                    rows.append((doc_id, 0, None, None, []))
                    continue
                counts: dict[int, int] = {}
                total = 0
                for b in raw:
                    counts[b] = counts.get(b, 0) + 1
                    total += b
                top = min(b for b, c in counts.items() if c == max(counts.values()))
                rows.append(
                    (
                        int(doc_id),
                        len(raw),
                        total / len(raw),
                        int(top),
                        [int(x) for x in raw[::frame_stride]],
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "mean_byte", "top_byte", "frame_sample"])

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
