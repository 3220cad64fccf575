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
