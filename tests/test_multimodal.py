"""Multimodal plumbing: typed metadata (pure-Column header parsing),
Arrow-batched decode/feature/resize/frame-sample stages — all over REAL
WAV / PNG / GIF containers."""

import numpy as np
from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.operators.multimodal import (
    attach_media_meta, decode_features, gif_encode_gray_frames,
    png_decode_gray, png_encode_gray, pooled_resize, resize_png,
    wav_encode_bytes)


def payloads(spark, sf_dir="/root/testdata/sf0.001"):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.col("text").cast("binary").alias("payload")))


def test_media_meta_parses_real_container_headers(spark):
    """attach_media_meta reads REAL headers with pure Column byte math:
    PNG IHDR dims, GIF logical-screen dims, WAV rate + duration."""
    png = png_encode_gray(np.arange(35, dtype=np.uint8).reshape(5, 7))
    gif = gif_encode_gray_frames(
        [np.zeros((4, 6), dtype=np.uint8) for _ in range(2)])
    wav = wav_encode_bytes(1, 8000, sample_rate=16000)  # 0.5 s mono PCM16
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(wav)),
         (4, bytearray(b"garbage-bytes"))],
        "doc_id long, payload binary")
    out = attach_media_meta(df)
    # zero Python in the metadata plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    by = {r["doc_id"]: r["media"].asDict() for r in out.collect()}
    assert by[1]["kind"] == "image" and by[1]["mime"] == "image/png"
    assert (by[1]["width"], by[1]["height"]) == (7, 5)
    assert by[2]["kind"] == "video" and (by[2]["width"],
                                         by[2]["height"]) == (6, 4)
    assert by[3]["kind"] == "audio" and by[3]["sample_rate"] == 16000
    assert by[3]["duration_ms"] == 500  # 8000 samples / 16 kHz
    assert by[4]["kind"] == "unknown" and by[4]["width"] is None


def test_decode_features_shape_and_determinism(spark):
    df = payloads(spark)
    f1 = {r["doc_id"]: r["feature"] for r in decode_features(df).collect()}
    f2 = {r["doc_id"]: r["feature"] for r in decode_features(df).collect()}
    assert f1 == f2
    any_vec = next(iter(f1.values()))
    assert len(any_vec) == 8
    assert abs(sum(any_vec) - 1.0) < 1e-5  # normalized histogram


def test_pooled_resize_closed_form():
    """4x4 -> 2x2 area pooling: each output pixel is the exact mean of its
    2x2 block."""
    px = np.array([[0, 10, 100, 110],
                   [20, 30, 120, 130],
                   [200, 210, 40, 50],
                   [220, 230, 60, 70]], dtype=np.uint8)
    out = pooled_resize(px, (2, 2))
    assert out.tolist() == [[15, 115], [215, 55]]
    # non-divisible: 5x3 -> 2x2 still covers every pixel once; the integer
    # grid puts rows [0,1) cols [0,2) in the first block -> mean([0,1])
    px2 = np.arange(15, dtype=np.uint8).reshape(3, 5)
    out2 = pooled_resize(px2, (2, 2))
    assert out2.shape == (2, 2)
    assert out2[0, 0] == int(round(np.mean([0, 1])))
    assert out2[1, 1] == int(round(np.mean([7, 8, 9, 12, 13, 14])))


def test_resize_png_real_decode_pool_encode(spark):
    """resize_png round-trips REAL PNGs: output payloads are valid PNGs of
    the target size whose pixels equal the closed-form pooling."""
    src_px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(png_encode_gray(src_px)))],
        "doc_id long, payload binary")
    rows = resize_png(df, target=(4, 4)).collect()
    assert rows[0]["media_width"] == 4
    got = png_decode_gray(bytes(rows[0]["payload"]))
    want = pooled_resize(src_px, (4, 4))
    assert got.tolist() == want.tolist()


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
