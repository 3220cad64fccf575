"""Multimodal column plumbing (brief: first-class training-data-pipeline
component): image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are deterministic stand-ins clearly marked STUB — but the
Spark-side contract is the real thing: schemas, batch iteration, partition
sizing, and the pattern of narrow mapInPandas stages that at 100 TB keeps
decode embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# typed metadata carried alongside every payload
MEDIA_META_DDL = ("media STRUCT<kind: STRING, mime: STRING, width: INT, "
                  "height: INT, duration_ms: INT, sample_rate: INT>")


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      kind: str = "image") -> DataFrame:
    """Derive the typed metadata struct for opaque payloads.  STUB decode:
    dimensions are deterministic functions of the payload bytes (a real
    deployment parses the container header here, still JVM/Arrow-side)."""
    p = F.col(payload_col)
    return df.withColumn("media", F.struct(
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/x-stub").alias("mime"),
        (F.octet_length(p) % 1920 + 1).cast("int").alias("width"),
        (F.octet_length(p) % 1080 + 1).cast("int").alias("height"),
        (F.octet_length(p) * 40).cast("int").alias("duration_ms"),
        F.lit(16000).alias("sample_rate")))


def decode_features(df: DataFrame, payload_col: str = "payload",
                    dim: int = 8) -> DataFrame:
    """'Decode + feature-extract' stage: mapInPandas over Arrow batches ->
    fixed-dim float feature vector per payload.  STUB kernel: deterministic
    byte-histogram features (a real kernel would call the image/audio
    library on ``buf`` — same signature, same batching)."""
    schema = f"doc_id LONG, feature ARRAY<FLOAT>, byte_len LONG"

    def kernel(batches):
        import numpy as np
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            feats = []
            for buf in pdf[payload_col]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                norm = float(hist.sum()) or 1.0
                feats.append((hist / norm).tolist())
            out["feature"] = feats
            out["byte_len"] = pdf[payload_col].map(len)
            yield out

    return df.mapInPandas(kernel, schema)


def resize_stub(df: DataFrame, payload_col: str = "payload",
                target: tuple[int, int] = (224, 224)) -> DataFrame:
    """'Resize' stage shape: payload -> payload' (binary -> binary) through
    mapInPandas.  STUB: truncates/pads bytes to a deterministic size
    proportional to the target area; a real kernel decodes-resizes-encodes."""
    w, h = target
    size = max(16, (w * h) // 512)
    schema = "doc_id LONG, payload BINARY, media_width INT, media_height INT"

    def kernel(batches):
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["payload"] = pdf[payload_col].map(
                lambda b: (bytes(b) * (size // max(len(b), 1) + 1))[:size])
            out["media_width"] = w
            out["media_height"] = h
            yield out

    return df.mapInPandas(kernel, schema)


def frame_sample_stub(df: DataFrame, payload_col: str = "payload",
                      every_ms: int = 1000) -> DataFrame:
    """'Frame sampling' stage shape: one row per sampled frame (row
    explosion inside mapInPandas, the video->frames pattern).  STUB: frame
    count = duration_ms // every_ms derived from payload size; frame bytes
    are deterministic slices."""
    schema = "doc_id LONG, frame_idx INT, frame BINARY, ts_ms INT"

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                buf = bytes(r[payload_col])
                n = max(1, min((len(buf) * 40) // every_ms, 8))
                step = max(1, len(buf) // n)
                for i in range(n):
                    rows.append((r["doc_id"], i,
                                 buf[i * step:(i + 1) * step], i * every_ms))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "frame", "ts_ms"])

    return df.mapInPandas(kernel, schema)
