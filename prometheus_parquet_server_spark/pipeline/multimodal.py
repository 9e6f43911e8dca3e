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
