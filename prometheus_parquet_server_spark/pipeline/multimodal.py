"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed behind clearly-marked gates — but everything
Spark-side is real and tested: the schema, the Arrow batch path through
``mapInPandas``, the partition-size control, and the deterministic fallback
feature extractor (so pipelines are end-to-end runnable without the codecs).

At scale: binary payloads ride in their own column so column pruning keeps
metadata-only queries payload-free; ``spark.sql.files.maxPartitionBytes``
governs scan granularity; the pandas iterator processes one Arrow batch at a
time so peak memory is bounded by batch size, not partition size.
"""

from __future__ import annotations

import hashlib
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


def _try_real_decode(kind: str, payload: bytes) -> list[float] | None:
    """Real decoder hook. The codec libraries are not installed in this
    environment; when they are, this returns e.g. a resized-pixel or
    mel-spectrogram feature vector."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401  (absent here)
        elif kind == "audio":
            import soundfile  # noqa: F401  (absent here)
        else:
            return None
    except ImportError:
        return None
    raise NotImplementedError(
        "real media decode requires codec libraries not present in this build"
    )


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

    Real Spark plumbing (Arrow batches, fixed output schema, payload column
    rewritten); the pixel work is stubbed deterministically — with PIL
    installed, `_try_real_decode`-style code would decode/resize/re-encode.
    The stub emits a payload of exactly width*height bytes derived from a
    rolling hash of the input so downstream operators see realistic shapes.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                payload = bytes(payload) if payload is not None else b""
                seed = hashlib.md5(payload).digest()
                reps = (n // len(seed)) + 1
                out_payloads.append((seed * reps)[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                    "decoder": "stub",
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
