"""Multimodal plumbing: typed metadata, Arrow-batched decode/feature/
resize/frame-sample stages (stub kernels, real Spark contracts)."""

from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.operators.multimodal import (
    attach_media_meta, decode_features, frame_sample_stub, resize_stub)


def payloads(spark, sf_dir="/root/testdata/sf0.001"):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.col("text").cast("binary").alias("payload")))


def test_media_meta_struct(spark):
    df = attach_media_meta(payloads(spark), kind="image")
    r = df.select("media.*").first()
    assert r["kind"] == "image" and 1 <= r["width"] <= 1920


def test_decode_features_shape_and_determinism(spark):
    df = payloads(spark)
    f1 = {r["doc_id"]: r["feature"] for r in decode_features(df).collect()}
    f2 = {r["doc_id"]: r["feature"] for r in decode_features(df).collect()}
    assert f1 == f2
    any_vec = next(iter(f1.values()))
    assert len(any_vec) == 8
    assert abs(sum(any_vec) - 1.0) < 1e-5  # normalized histogram


def test_resize_stub_binary_roundtrip(spark):
    out = resize_stub(payloads(spark), target=(224, 224))
    rows = out.collect()
    sizes = {len(r["payload"]) for r in rows}
    assert sizes == {(224 * 224) // 512}
    assert all(r["media_width"] == 224 for r in rows[:5])


def test_frame_sample_explodes_rows(spark):
    src = payloads(spark).limit(20)
    frames = frame_sample_stub(src).collect()
    assert len(frames) >= 20  # at least one frame per doc
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, fs in by_doc.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))  # dense frame indexes


def test_png_codec_roundtrip_and_integrity():
    import numpy as np

    from logstash_filter_elastic_integration_spark.operators.multimodal import (
        png_decode_gray, png_encode_gray)
    px = ((np.arange(256) * 7 + 42 * 31) % 256).astype(np.uint8).reshape(16, 16)
    buf = png_encode_gray(px)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    assert (png_decode_gray(buf) == px).all()
    # CRC integrity: flipping a data byte must be detected, not decoded
    corrupted = bytearray(buf)
    corrupted[40] ^= 0xFF
    import pytest as _pytest
    with _pytest.raises(ValueError):
        png_decode_gray(bytes(corrupted))


def test_multimodal_image_features_exact(spark):
    from logstash_filter_elastic_integration_spark import queries as Q
    rows = Q.QUERIES["multimodal_av"](spark, "/root/testdata/sf0.001") \
        .orderBy("doc_id").limit(3).collect()
    import numpy as np
    for r in rows:
        px = ((r.doc_id * 31 + np.arange(256) * 7) % 256).reshape(16, 16)
        assert r.width == 16 and r.height == 16
        assert r.pix_sum == int(px.sum())
        # block_sums is pipe-joined (driver canonicalizer can't sort lists)
        assert [int(x) for x in r.block_sums.split("|")] == [
            int(x) for x in px.reshape(4, 4, 4, 4).sum(axis=(1, 3)).ravel()]


def test_gif_lzw_roundtrip_with_dictionary_reset():
    import random

    import numpy as np

    from logstash_filter_elastic_integration_spark.operators.multimodal import (
        _gif_lzw_decode, _gif_lzw_encode)
    random.seed(11)
    for n in (0, 1, 255, 256, 4096):
        data = bytes(random.randrange(256) for _ in range(n))
        assert _gif_lzw_decode(_gif_lzw_encode(data)) == data
    # repetitive data forces the in-width dictionary reset path
    rep = bytes(np.tile(np.arange(64, dtype=np.uint8), 200))
    assert _gif_lzw_decode(_gif_lzw_encode(rep)) == rep


def test_gif_structure_corruption_detected():
    import numpy as np
    import pytest as _pytest

    from logstash_filter_elastic_integration_spark.operators.multimodal import (
        gif_decode_gray_frames, gif_encode_gray_frames)
    fs = [np.full((4, 4), 9, dtype=np.uint8)]
    buf = gif_encode_gray_frames(fs)
    with _pytest.raises(ValueError):
        gif_decode_gray_frames(b"NOTGIF" + buf[6:])
    with _pytest.raises(ValueError):
        gif_decode_gray_frames(buf[:-1])  # trailer gone


def test_gif_frame_sample_exact(spark):
    """Real animated-GIF round trip through the Spark stages: every 2nd
    frame sampled, features match the closed form of the deterministic
    pixel pattern."""
    import numpy as np

    from logstash_filter_elastic_integration_spark.operators.multimodal import (
        encode_gif, sample_gif_frames)
    doc = spark.range(5).selectExpr("id AS doc_id")
    out = (sample_gif_frames(encode_gif(doc, side=8, frames=6), every=2)
           .orderBy("doc_id", "frame_idx").collect())
    assert len(out) == 5 * 3  # frames 0, 2, 4 per doc
    idx = np.arange(64, dtype=np.int64)
    for r in out:
        assert r.n_frames == 6 and r.frame_idx in (0, 2, 4)
        px = (r.doc_id * 31 + r.frame_idx * 17 + idx * 7) % 256
        assert r.f_sum == int(px.sum())
        assert r.f_min == int(px.min()) and r.f_max == int(px.max())
