"""Spark ML regression stage (M1-M6) and multimodal plumbing tests."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from crypto_data_pipeline_spark.ml import regression
from crypto_data_pipeline_spark.operators import multimodal


@pytest.fixture(scope="module")
def feature_df(spark):
    """Noisy linear target over two features, chronological index —
    y_t = 2*f1 + 3*f2 + eps, so the linear family must fit near-perfectly."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        f1, f2 = rng.normal(), rng.normal()
        rows.append(
            (
                dt.date(2024, 1, 1) + dt.timedelta(days=i),
                float(f1),
                float(f2),
                float(2 * f1 + 3 * f2 + rng.normal(0, 0.01)),
            )
        )
    return spark.createDataFrame(rows, "d date, f1 double, f2 double, next_day_price double")


def test_chronological_split_no_leakage(feature_df):
    train, test = regression.chronological_split(feature_df, "d")
    max_train = train.agg(F.max("d")).collect()[0][0]
    min_test = test.agg(F.min("d")).collect()[0][0]
    assert max_train < min_test  # strictly time-ordered cut
    n_train, n_test = train.count(), test.count()
    assert n_test == 300 - int(300 * (1 - 1 / 6))


def test_model_comparison_table(feature_df):
    out = regression.model_comparison(feature_df, ["f1", "f2"], "d").collect()
    assert [set(r.asDict()) for r in out] == [{"model", "rmse", "mae", "r2"}] * 4
    assert {r.model for r in out} == {"linear", "ridge", "lasso", "gbt"}
    # best-first ordering (O4: orderBy(rmse).limit(1) picks the winner)
    rmses = [r.rmse for r in out]
    assert rmses == sorted(rmses)
    # the unregularized linear fit must recover the clean linear target
    best = out[0]
    assert best.model == "linear" and best.rmse < 0.1 and best.r2 > 0.99
    # metric invariants (the hash-checked face of model_comparison_sanity)
    for r in out:
        assert r.rmse >= r.mae > 0 and r.r2 <= 1.0
    # ridge(α=1) shrinks a clean linear target strictly toward zero:
    # never better than the unregularized fit, but still a strong fit
    by_model = {r.model: r for r in out}
    assert by_model["ridge"].rmse >= by_model["linear"].rmse
    assert by_model["ridge"].r2 > 0.9


def test_fake_media_schema_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "aab"), (2, "zz")], "doc_id long, text string"
    )
    media = multimodal.fake_media_from_documents(docs)
    # simpleString compares names/types while ignoring nullability
    assert media.schema.simpleString() == multimodal.MEDIA_SCHEMA.simpleString()
    feats = {r.doc_id: r for r in multimodal.extract_media_features(media).collect()}
    # "aab" → bytes 97,97,98: mean 97.333..., modal byte 97
    assert feats[1].n_bytes == 3
    assert abs(feats[1].mean_byte - (97 + 97 + 98) / 3) < 1e-12
    assert feats[1].top_byte == 97
    assert feats[1].frame_sample == [97]  # stride 64 over 3 bytes → first only
    assert feats[2].top_byte == 122
    # "aab": p = (2/3, 1/3) → H = 2/3*log2(3/2) + 1/3*log2(3)
    import math

    h = (2 / 3) * math.log2(3 / 2) + (1 / 3) * math.log2(3)
    assert abs(feats[1].byte_entropy - h) < 1e-9
    assert feats[1].n_distinct_bytes == 2
    # "zz": single symbol → zero entropy
    assert feats[2].byte_entropy == 0.0 and feats[2].n_distinct_bytes == 1
    assert feats[1].format == "application/octet-stream"


def test_magic_number_sniffing(spark):
    """Real container magics route to the right format; the features
    stay codec-free (computed on the raw bytes either way)."""
    blobs = [
        (1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "image/png"),
        (2, b"\xff\xd8\xff\xe0" + b"\x01" * 16, "image/jpeg"),
        (3, b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
        (4, b"\x00\x00\x00\x20ftypisom" + b"\x00" * 8, "video/mp4"),
        (5, b"\x1f\x8b\x08\x00" + b"\xaa" * 8, "application/gzip"),
        (6, b"just plain text", "application/octet-stream"),
    ]
    for _, raw, want in blobs:
        assert multimodal.sniff_format(raw) == want
    media = spark.createDataFrame(
        [(i, raw, ("sniff", len(raw))) for i, raw, _ in blobs],
        multimodal.MEDIA_SCHEMA,
    )
    got = {r.doc_id: r for r in multimodal.extract_media_features(media).collect()}
    for i, raw, want in blobs:
        assert got[i].format == want
        assert got[i].n_bytes == len(raw)


def test_media_feature_batching_matches_python(spark, sf_dir):
    """mapInPandas over the real documents table: per-blob features
    equal a driver-side recomputation on a sample (Arrow batch shape
    doesn't change values)."""
    from crypto_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.fake_media_from_documents(docs)
    got = {r.doc_id: r for r in multimodal.extract_media_features(media).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode("utf-8")
        assert got[row.doc_id].n_bytes == len(raw)
        assert abs(got[row.doc_id].mean_byte - sum(raw) / len(raw)) < 1e-9


def test_real_codec_raises_hermetically_without_pillow(monkeypatch):
    """In a codec-free environment the real tier must refuse loudly,
    never fake an answer. Forced via monkeypatch so this contract
    holds (and is tested) even on machines where Pillow IS present."""
    monkeypatch.setattr(multimodal, "_pil", lambda: None)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00", codec="real")
    with pytest.raises(NotImplementedError):
        multimodal.extract_image_features(None)


def test_real_codec_decodes_when_pillow_present(spark):
    """The import-guarded real tier: with Pillow installed, images
    decode to real width/height/mode features and RGB24 bytes;
    undecodable blobs quarantine as null-feature rows. Skipped (not
    faked) where Pillow is absent — this container ships no codec
    libs, so there the hermetic test above is the active contract."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 3), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()

    assert multimodal.decode_media(png, codec="real") == b"\xff\x00\x00" * 21

    media = spark.createDataFrame(
        [(1, png, ("image/png", len(png))), (2, b"not an image", ("junk", 12))],
        multimodal.MEDIA_SCHEMA,
    )
    got = {r.doc_id: r for r in multimodal.extract_image_features(media).collect()}
    assert (got[1].width, got[1].height, got[1].mode, got[1].n_pixels) == (7, 3, "RGB", 21)
    assert got[2].width is None and got[2].n_pixels is None
