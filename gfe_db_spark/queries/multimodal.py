"""Multimodal query inventory: exercises the binary-column plumbing in
operators/multimodal.py against the documents table.

The media table is derived deterministically from `documents` (payload =
UTF-8 bytes of the text, kind round-robins image/audio/video by doc_id),
so the whole path — binary column → Arrow batch → mapInPandas decode →
typed metadata out — runs under the same oracle harness as everything
else, including the stub decoder's md5-derived feature vectors (DuckDB's
md5_number_upper reproduces them bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfe_db_spark.operators.multimodal import extract_features, sample_video_frames
from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table

KINDS = ["image", "audio", "video"]


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table over documents: MEDIA_SCHEMA-shaped, with
    real binary payloads (UTF-8 text bytes) and typed metadata."""
    docs = table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind media stats AFTER the mapInPandas decode pass: proves the
    binary payloads round-trip through Arrow batching intact (byte counts
    are recomputed from the payload inside the UDF, then checked against
    the SQL oracle's octet_length on the source text)."""
    feats = extract_features(media_from_documents(spark, sf_dir))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("kind")
    )


MULTIMODAL_METADATA_SQL = """
SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY kind
ORDER BY kind
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the full binary path: payload → Arrow
    batch → mapInPandas stub decode → 8-dim vector. The stub derives each
    component from one byte of md5(payload), so the oracle can recompute
    it exactly (DuckDB md5_number_upper == little-endian first 8 digest
    bytes); components are unpacked to rounded doubles because the value
    hash needs scalar columns."""
    feats = extract_features(media_from_documents(spark, sf_dir))
    comp = [
        F.round(F.element_at("feature", i + 1).cast("double"), 6).alias(f"f{i}")
        for i in range(8)
    ]
    return (
        feats.select("media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes"), *comp)
        .orderBy("media_id")
        .limit(100)
    )


MULTIMODAL_FEATURES_SQL = """
WITH h AS (
  SELECT doc_id AS media_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5_number_upper(text) AS h64
  FROM documents
)
SELECT media_id, kind, n_bytes,
       round(CAST(CAST(CAST((h64 >> 0)  & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f0,
       round(CAST(CAST(CAST((h64 >> 8)  & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f1,
       round(CAST(CAST(CAST((h64 >> 16) & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f2,
       round(CAST(CAST(CAST((h64 >> 24) & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f3,
       round(CAST(CAST(CAST((h64 >> 32) & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f4,
       round(CAST(CAST(CAST((h64 >> 40) & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f5,
       round(CAST(CAST(CAST((h64 >> 48) & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f6,
       round(CAST(CAST(CAST((h64 >> 56) & 255 AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f7
FROM h
ORDER BY media_id
LIMIT 100
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame timestamp,
    driven by the duration metadata. Frame count per video is
    floor(duration/step)+1 — SQL-checkable without any decode."""
    media = media_from_documents(spark, sf_dir)
    frames = sample_video_frames(media, every_ms=100_000)
    return (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )


MULTIMODAL_FRAMES_SQL = """
SELECT doc_id AS media_id,
       CAST(FLOOR((n_chars * 10) / 100000) + 1 AS BIGINT) AS n_frames
FROM documents
WHERE (doc_id % 3) = 2
ORDER BY media_id
"""


def real_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL media fixture: image docs get a valid 8×4 image
    whose pixels cycle md5(doc_id:img) — alternating between 24-bit BMP and
    zlib-compressed RGB PNG by doc parity, so both container decoders are
    exercised; audio docs a valid 8-bit PCM WAV whose 192 samples cycle
    md5(doc_id:aud); video keeps an opaque payload (no self-contained video
    format exists to hand-build). Built in an Arrow-batched mapInPandas —
    the same shape real ingestion has. 8×4×3 = 96 bytes is an exact
    multiple of the 16-byte digest, so the pixel mean equals the digest
    mean for both containers and the oracle needs no per-format branch."""
    import hashlib

    from pyspark.sql import types as T

    from gfe_db_spark.operators.multimodal import (
        encode_bmp_rgb24,
        encode_png_rgb8,
        encode_wav_pcm8,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                kind = KINDS[int(did) % 3]
                if kind == "image":
                    enc = encode_bmp_rgb24 if int(did) % 2 == 0 else encode_png_rgb8
                    payload = enc(8, 4, hashlib.md5(f"{did}:img".encode()).digest())
                elif kind == "audio":
                    payload = encode_wav_pcm8(
                        8000, hashlib.md5(f"{did}:aud".encode()).digest() * 12
                    )
                else:
                    payload = b"opaque-video"
                rows.append((int(did), kind, payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    from gfe_db_spark.operators import spread_small_input

    return spread_small_input(docs, key="doc_id").mapInPandas(build, schema=schema)


def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL decode path end-to-end: build valid BMP/PNG/WAV payloads,
    parse them back inside mapInPandas (magic sniffing, header validation,
    zlib inflate + unfilter for PNG, dimensions + content stats),
    unsupported kinds to the error column. The oracle recomputes every
    stat from the md5 bytes the payloads were built from — the decode
    arithmetic is fully checked."""
    from gfe_db_spark.operators.multimodal import decode_media_stats

    media = real_media_from_documents(spark, sf_dir)
    out = decode_media_stats(media)
    return out.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_samples",
        "sample_rate",
        F.round(F.col("mean_value"), 6).alias("mean_value"),
        "decode_error",
    )


# mean over the 16 md5 digest bytes (payloads cycle the digest, so the
# cycled mean equals the digest mean); bytes via the LE halves.
_D16 = "(" + " + ".join(
    [f"((md5_number_upper(k) >> {8 * i}) & 255)" for i in range(8)]
    + [f"((md5_number_lower(k) >> {8 * i}) & 255)" for i in range(8)]
) + ")"

MULTIMODAL_REAL_DECODE_SQL = f"""
WITH base AS (
  SELECT doc_id AS media_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
  FROM documents
), img AS (
  SELECT media_id, kind, CAST(doc_id AS VARCHAR) || ':img' AS k
  FROM documents JOIN base ON doc_id = media_id WHERE kind = 'image'
), aud AS (
  SELECT media_id, kind, CAST(doc_id AS VARCHAR) || ':aud' AS k
  FROM documents JOIN base ON doc_id = media_id WHERE kind = 'audio'
)
SELECT media_id, kind,
       8 AS width, 4 AS height,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INTEGER) AS sample_rate,
       round({_D16} / 16.0, 6) AS mean_value,
       CAST(NULL AS VARCHAR) AS decode_error
FROM img
UNION ALL
SELECT media_id, kind,
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(192 AS BIGINT), 8000,
       round({_D16} / 16.0, 6),
       CAST(NULL AS VARCHAR)
FROM aud
UNION ALL
SELECT media_id, kind,
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
       CAST(NULL AS DOUBLE),
       'no decoder for kind ''video''' AS decode_error
FROM base WHERE kind = 'video'
ORDER BY media_id
"""


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups over the binary payload column (md5 digest
    groupBy — the binary twin of dedup_exact). One shuffle on the digest;
    at 100 TB the digest (32 bytes) shuffles, never the payload."""
    media = media_from_documents(spark, sf_dir)
    return (
        media.select(F.md5(F.col("payload")).alias("payload_hash"), "media_id")
        .groupBy("payload_hash")
        .agg(
            F.min("media_id").alias("representative"),
            F.count(F.lit(1)).alias("n_media"),
        )
    )


MULTIMODAL_DEDUP_SQL = """
-- payload is the UTF-8 encoding of text, so md5(text) hashes the same bytes
SELECT md5(text) AS payload_hash,
       MIN(doc_id) AS representative,
       COUNT(*) AS n_media
FROM documents
GROUP BY 1
ORDER BY payload_hash
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_metadata": QuerySpec(
        multimodal_metadata, MULTIMODAL_METADATA_SQL, "binary payload round-trip stats"
    ),
    "multimodal_features": QuerySpec(
        multimodal_features, MULTIMODAL_FEATURES_SQL, "stubbed decode → feature vectors"
    ),
    "multimodal_frame_sample": QuerySpec(
        multimodal_frame_sample, MULTIMODAL_FRAMES_SQL, "metadata-driven frame sampling"
    ),
    "multimodal_dedup": QuerySpec(
        multimodal_dedup, MULTIMODAL_DEDUP_SQL, "binary payload exact dedup"
    ),
    "multimodal_real_decode": QuerySpec(
        multimodal_real_decode,
        MULTIMODAL_REAL_DECODE_SQL,
        "real BMP/WAV struct decode + stats",
    ),
}


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup key over REALLY decoded pixels: the image
    payloads (BMP for even ids, zlib PNG for odd — both real containers)
    decode to the canonical top-down grid and aHash from pixel content,
    so the key survives container conversion (pinned by the planted
    cross-format test). The oracle recomputes every gray value and hash
    bit from the md5 bytes the pixels were built from, including the BMP
    bottom-up row flip."""
    from gfe_db_spark.operators.multimodal import perceptual_ahash

    media = real_media_from_documents(spark, sf_dir).filter(F.col("kind") == "image")
    return perceptual_ahash(media).select("media_id", "container", "ahash")


MULTIMODAL_PHASH_SQL = """
WITH img AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS container,
         CAST(doc_id AS VARCHAR) || ':img' AS k
  FROM documents WHERE doc_id % 3 = 0
), bytes16 AS (
  SELECT media_id, container,
         list_transform(range(0, 16), kk ->
           CASE WHEN kk < 8
                THEN CAST((md5_number_upper(k) >> (8 * kk)) & 255 AS BIGINT)
                ELSE CAST((md5_number_lower(k) >> (8 * (kk - 8))) & 255 AS BIGINT)
           END) AS d
  FROM img
), grays AS (
  -- both encoders take the fixture's cycled digest as the CANONICAL
  -- top-down grid (the BMP encoder flips rows into the file and the
  -- decoder flips them back), so canonical byte j = digest[j % 16] for
  -- either container
  SELECT media_id, container,
         list_transform(range(0, 32), p ->
           d[((p * 3 + 0) % 16) + 1]
           + d[((p * 3 + 1) % 16) + 1]
           + d[((p * 3 + 2) % 16) + 1]) AS g
  FROM bytes16
)
SELECT media_id, container,
       CAST(list_sum(list_transform(range(0, 32), p ->
         CASE WHEN 32 * g[p + 1] > list_sum(g)
              THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
         AS ahash
FROM grays
ORDER BY media_id
"""


QUERIES["multimodal_phash_dedup"] = QuerySpec(
    multimodal_phash_dedup,
    MULTIMODAL_PHASH_SQL,
    "perceptual aHash over really-decoded pixels (container-independent dedup key)",
)
