"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partition-sized Arrow batches,
mapInPandas signatures, metadata propagation) is real and tested; the
actual media decode is stubbed behind `DECODERS` because the image/audio
libraries are not in this container — swap in PIL/torchaudio decoders by
registering a callable, nothing else changes.

Scale notes: binary payloads ride in the same parquet row group as their
metadata; `spark.sql.files.maxPartitionBytes` bounds batch memory, and
frame-sample/resize run as Arrow-batched mapInPandas so bytes never leave
the executor except through the declared output schema.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _stub_decode(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake decoder: a tiny feature vector derived from the
    payload digest. Replace via DECODERS[kind] = real_decoder."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:8]]


DECODERS: dict[str, Callable[[str, bytes], list[float]]] = {
    "image": _stub_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Decode/feature-extract as Arrow-batched mapInPandas. The UDF sees
    pandas batches of (media_id, kind, payload) and emits FEATURE_SCHEMA
    rows; executors never materialize more than one Arrow batch of
    payloads at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS.get(k, _stub_decode)(k, bytes(p)) if p is not None else None
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": feats,
                }
            )

    from gfe_db_spark.operators import spread_small_input

    cols = spread_small_input(media.select("media_id", "kind", "payload"))
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZERS: dict[str, Callable[[bytes, int, int], bytes]] = {}


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: payloads route through an Arrow-batched mapInPandas
    whose pixel transform comes from RESIZERS['image'] (register a PIL
    round-trip to make it real). STUB default: deterministic passthrough —
    the Spark plan (batching, schema, metadata update) is the real,
    final contract."""
    resizer = RESIZERS.get("image", lambda payload, w, h: payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(
                lambda b: None if b is None else resizer(bytes(b), width, height)
            )
            yield pdf

    resized = media.mapInPandas(run, schema=media.schema)
    resized_meta = F.struct(
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return resized.withColumn("meta", resized_meta)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp
    (metadata-driven; payload decode stubbed). Emits (media_id, frame_ts_ms,
    frame_payload) with frame_payload = None until a video decoder is
    registered — the explode/timestamp arithmetic is the Spark-side work."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn("frame_payload", F.lit(None).cast("binary"))
