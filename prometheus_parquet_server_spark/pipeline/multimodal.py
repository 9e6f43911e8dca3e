"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Decode support is two-tier:

- REAL pure-Python codecs that need no external libraries: 24-bit BMP and
  P6 PPM images, non-interlaced 8-bit truecolor PNG (stdlib ``zlib``
  inflate + full None/Sub/Up/Average/Paeth unfiltering —
  :func:`decode_png`), all via :func:`decode_image`; PCM WAV audio
  (:func:`decode_audio`). These parse actual bytes — magic, headers,
  chunk CRCs, pixel rows / sample frames — through the same
  ``mapInPandas`` Arrow path a PIL/ffmpeg kernel would use
  (:func:`decode_media`).
- Formats needing codec libraries NOT in this container (JPEG/MP3/MP4,
  interlaced or paletted PNG) fall back to the clearly-marked
  deterministic stub so pipelines stay end-to-end runnable.

At scale: binary payloads ride in their own column so column pruning keeps
metadata-only queries payload-free; ``spark.sql.files.maxPartitionBytes``
governs scan granularity; the pandas iterator processes one Arrow batch at a
time so peak memory is bounded by batch size, not partition size.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("decoder", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# pure-Python codecs (no external libraries): BMP / PPM images, PCM WAV audio
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer. ``pixels`` is width*height*3 BGR
    bytes, top-down; rows are written bottom-up with 4-byte padding per the
    format."""
    row = width * 3
    pad = (-row) % 4
    img_size = (row + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        body += pixels[y * row : (y + 1) * row]
        body += b"\x00" * pad
    return header + bytes(body)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, pixels: bytes, filters: bytes | None = None) -> bytes:
    """Minimal non-interlaced 8-bit truecolor PNG writer (stdlib zlib +
    CRC32). ``pixels``: width*height*3 RGB bytes, top-down. ``filters``:
    optional per-row filter-type bytes (default all 0/None) — used by
    tests to exercise every unfilter arm with known pixel data."""
    row = width * 3
    raw = bytearray()
    for y in range(height):
        f = filters[y] if filters else 0
        line = bytearray(pixels[y * row : (y + 1) * row])
        if f == 1:  # Sub: delta against the previous pixel in the row
            for i in range(row - 1, 2, -1):
                line[i] = (line[i] - line[i - 3]) & 0xFF
        elif f == 2:  # Up: delta against the previous row
            prev = pixels[(y - 1) * row : y * row] if y else bytes(row)
            for i in range(row):
                line[i] = (line[i] - prev[i]) & 0xFF
        elif f != 0:
            raise ValueError(f"encode_png supports filters 0/1/2, got {f}")
        raw.append(f)
        raw += line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes] | None:
    """Real PNG decode for the non-interlaced 8-bit subset — color type 2
    (truecolor) and 6 (truecolor+alpha, alpha dropped) — implemented from
    the public PNG specification with stdlib zlib: chunk walk, IDAT
    concatenation, inflate, and full per-row unfiltering
    (None/Sub/Up/Average/Paeth). Returns (width, height, top-down RGB
    bytes); None for anything outside the subset (interlaced, paletted,
    16-bit, grayscale) — those fall to the documented stub."""
    if not payload.startswith(_PNG_SIG):
        return None
    pos = 8
    width = height = ctype = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln or pos + 12 + ln > len(payload):
            return None
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            return None  # corrupted chunk — reject, don't decode garbage
        if tag == b"IHDR":
            if ln < 13:
                return None
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8 or ctype not in (2, 6) or comp or filt or ilace:
                return None
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None or not width or not height or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp = 3 if ctype == 2 else 4
    stride = width * bpp
    if len(raw) < height * (stride + 1):
        return None
    out = bytearray(height * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += stride + 1
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                line[i] = (
                    line[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 0xFF
        elif f != 0:
            return None
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if bpp == 4:  # drop alpha
        rgb = bytearray(width * height * 3)
        for i in range(width * height):
            rgb[3 * i : 3 * i + 3] = out[4 * i : 4 * i + 3]
        return width, height, bytes(rgb)
    return width, height, bytes(out)


def _parse_image(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse an image payload (24-bit BMP, binary P6 PPM, or subset PNG —
    :func:`decode_png`) into (width, height, top-down RGB/BGR pixel
    bytes), or None."""
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if len(payload) >= 54 and payload[:2] == b"BM":
        (dib_size, width, height, _planes, bpp) = struct.unpack_from(
            "<IiiHH", payload, 14
        )
        if dib_size < 40 or bpp != 24:
            return None
        offset = struct.unpack_from("<I", payload, 10)[0]
        top_down = height < 0
        height = abs(height)
        row = width * 3
        pad = (-row) % 4
        if offset + (row + pad) * height > len(payload):
            return None
        rows = []
        for i in range(height):
            start = offset + i * (row + pad)
            rows.append(payload[start : start + row])
        if not top_down:
            rows.reverse()
        pix = b"".join(rows)
    elif payload[:2] == b"P6":
        import re as _re

        # the header ends after exactly ONE whitespace byte following
        # maxval — bytes.split would also swallow pixel bytes that happen
        # to be whitespace values (0x09-0x0D, 0x20)
        mh = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", payload)
        if not mh:
            return None
        width, height, maxval = (int(mh.group(g)) for g in (1, 2, 3))
        pix = payload[mh.end() : mh.end() + width * height * 3]
        if maxval > 255 or len(pix) < width * height * 3:
            return None
    else:
        return None
    return width, height, pix


def decode_image(payload: bytes) -> dict | None:
    """Decode an image payload (24-bit BMP, binary P6 PPM, or subset PNG).

    Returns {width, height, feature} — feature = [mean byte value of each
    third of the pixel stream, mean overall] scaled to [0,1] — or None when
    the payload is not a format this pure-Python decoder handles."""
    parsed = _parse_image(payload)
    if parsed is None:
        return None
    width, height, pix = parsed
    n = max(1, len(pix))
    third = max(1, n // 3)
    chunks = [pix[:third], pix[third : 2 * third], pix[2 * third :]]
    feature = [
        (sum(c) / len(c) / 255.0) if c else 0.0 for c in chunks
    ] + [sum(pix) / n / 255.0]
    return {"width": width, "height": height, "feature": feature}


def encode_wav(samples: list[int], rate: int = 8000) -> bytes:
    """Minimal PCM16 mono WAV writer."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_audio(payload: bytes) -> dict | None:
    """Decode a PCM WAV payload by walking its RIFF chunks.

    Returns {duration_s, feature} — feature = [rms, mean, peak] of the
    normalized samples — or None for non-WAV / non-PCM payloads."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits, data = 12, None, 1, 16, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if fmt != 1:  # PCM only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if rate is None or data is None or bits != 16 or channels < 1:
        return None
    n = len(data) // 2
    if n == 0:
        return {"duration_s": 0.0, "feature": [0.0, 0.0, 0.0]}
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    duration = n / channels / rate
    norm = [s / 32768.0 for s in samples]
    rms = (sum(s * s for s in norm) / n) ** 0.5
    return {
        "duration_s": duration,
        "feature": [rms, sum(norm) / n, max(abs(s) for s in norm)],
    }


def _try_real_decode(kind: str, payload: bytes) -> list[float] | None:
    """Real decoder hook used by :func:`extract_features`: pure-Python
    BMP/PPM/PNG/WAV parsing (no codec libraries needed — PNG rides stdlib
    zlib). Formats needing absent libraries (JPEG/MP3/..., PNG variants
    outside the 8-bit truecolor subset) fall through to the stub."""
    if kind == "image":
        out = decode_image(payload)
        return out["feature"] if out else None
    if kind == "audio":
        out = decode_audio(payload)
        return out["feature"] if out else None
    return None


def _stub_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fallback feature: bytes of md5(payload) scaled to [0,1).
    Keeps the full pipeline runnable and testable without codecs."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 256.0 for b in digest[:dim]]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over a media frame (MEDIA_SCHEMA).

    Real Spark plumbing: mapInPandas streams Arrow batches; per-batch pandas
    work is vectorized-ish; output schema is fixed (FEATURE_SCHEMA).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            kinds = pdf["kind"]
            feats, digests, decoders = [], [], []
            for kind, payload in zip(kinds, payloads):
                payload = bytes(payload) if payload is not None else b""
                real = _try_real_decode(kind, payload)
                if real is not None:  # pragma: no cover - codecs absent
                    feats.append(real)
                    decoders.append("real")
                else:
                    feats.append(_stub_feature(payload))
                    decoders.append("stub")
                digests.append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "digest": digests,
                    "feature": feats,
                    "decoder": decoders,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("decoder", T.StringType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode over a media frame: parse each payload's actual bytes
    (BMP/PPM headers + pixel rows, WAV RIFF chunks + PCM frames) inside the
    Arrow-batched ``mapInPandas`` kernel and emit the decoded metadata.
    Unrecognized/compressed payloads fall back to the stub feature with
    decoder='stub' and NULL dimensions."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "n_bytes", "width", "height",
                "duration_s", "feature", "decoder",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                width = height = duration = None
                dec = decode_image(payload) if kind == "image" else (
                    decode_audio(payload) if kind == "audio" else None
                )
                if dec is not None:
                    width = dec.get("width")
                    height = dec.get("height")
                    duration = dec.get("duration_s")
                    feature, decoder = dec["feature"], "real"
                else:
                    feature, decoder = _stub_feature(payload), "stub"
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["width"].append(width)
                out["height"].append(height)
                out["duration_s"].append(duration)
                out["feature"].append(feature)
                out["decoder"].append(decoder)
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads derived from doc_id: even ids
    become 24-bit BMPs (width = id%21+4, height = id*7%13+3, pixel bytes
    from a rolling (id*31 + i)%251 ramp), odd ids become PCM WAV clips
    (rate 8000, n_samples = (id%50+1)*400, a (id%17+1)-step sawtooth).
    An oracle can predict every decoded field from doc_id alone, making the
    decode kernels end-to-end checkable."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "payload", "meta")}
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    w = did % 21 + 4
                    h = (did * 7) % 13 + 3
                    pix = bytes((did * 31 + i) % 251 for i in range(w * h * 3))
                    payload, kind = encode_bmp(w, h, pix), "image"
                else:
                    n = (did % 50 + 1) * 400
                    step = did % 17 + 1
                    samples = [((i * step) % 2048) - 1024 for i in range(n)]
                    payload, kind = encode_wav(samples, rate=8000), "audio"
                out["media_id"].append(did)
                out["kind"].append(kind)
                out["payload"].append(payload)
                out["meta"].append(
                    {"mime": None, "width": None, "height": None, "duration_s": None}
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(_gen, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize kernel over the media frame.

    Decodable payloads (24-bit BMP / P6 PPM / subset PNG) get a REAL
    nearest-neighbor resize — parse pixels, sample, re-encode as BMP —
    with decoder='real'. Other formats (would need PIL/ffmpeg) fall back to a
    deterministic stub payload of exactly width*height bytes derived from a
    rolling hash of the input so downstream operators see realistic shapes.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out_payloads, decoders = [], []
            for payload in pdf["payload"]:
                payload = bytes(payload) if payload is not None else b""
                parsed = _parse_image(payload)
                if parsed is not None:
                    sw, sh, pix = parsed
                    out = bytearray()
                    for y in range(height):
                        sy = min(sh - 1, y * sh // height)
                        for x in range(width):
                            sx = min(sw - 1, x * sw // width)
                            o = (sy * sw + sx) * 3
                            out += pix[o : o + 3]
                    out_payloads.append(encode_bmp(width, height, bytes(out)))
                    decoders.append("real")
                else:
                    seed = hashlib.md5(payload).digest()
                    reps = (n // len(seed)) + 1
                    out_payloads.append((seed * reps)[:n])
                    decoders.append("stub")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                    "decoder": decoders,
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_s", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_s: float = 1.0, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a 1→N
    mapInPandas — the batch shape a real ffmpeg-backed kernel needs).
    Stub frames are deterministic slices of the payload; duration comes from
    ``meta.duration_s`` (default 1s when absent)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_idx", "frame_ts_s", "frame")}
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload) if payload is not None else b""
                duration = (meta or {}).get("duration_s") or 1.0
                n = min(max_frames, max(1, int(duration / every_s)))
                step = max(1, len(payload) // max(n, 1)) if payload else 1
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_s"].append(i * every_s)
                    rows["frame"].append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(rows)

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def media_frame_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as an opaque binary payload — the
    stand-in media table for this container (no real media in testdata)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )
