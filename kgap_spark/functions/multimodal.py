"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested; the actual media decode is stubbed
behind ``KGAP_FAKE_DECODE`` (the image/audio libraries are not in this
container). The stub is a deterministic pure function of the bytes, so
tests exercise the full distributed path with stable outputs; swapping
in a real decoder (PIL / torchaudio / pyav) changes only `_decode_*`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16

KGAP_FAKE_DECODE = True  # flip off when real media libs are installed


def _decode_image(payload: bytes) -> list[float]:
    """STUB: real impl = PIL.Image.open → resize → pooled features.
    The fake is a deterministic pure function of the bytes."""
    if not KGAP_FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real image decode requires PIL — not in this image")
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _decode_audio(payload: bytes) -> list[float]:
    """STUB: real impl = soundfile/torchaudio load → mel pooling."""
    if not KGAP_FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real audio decode requires soundfile")
    digest = hashlib.sha256(b"audio:" + (payload or b"")).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


_DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_image}

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, features array<double>"
)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """media table → (media_id, kind, n_bytes, features).

    mapInPandas: each Arrow batch is decoded in one Python call;
    feature extraction is per-row *inside* the vectorized batch loop —
    the sanctioned shape for opaque-binary work (payloads can't be
    expressed as Catalyst expressions). Partition sizing upstream
    controls memory: payload bytes live in the Arrow batch, so callers
    repartition such that rows_per_partition × avg_payload fits the
    executor (see session.ARROW_BATCH_ROWS)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _DECODERS.get(kind, _decode_image)(payload)
                for kind, payload in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for
    a downstream decoder, native explode — demonstrates the schema and
    partition shape without decoding (stub container)."""
    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))),
        )
        .select("media_id", "frame_idx")
    )
