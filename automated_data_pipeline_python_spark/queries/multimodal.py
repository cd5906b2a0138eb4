"""Multimodal planning queries for the driver catalog.

The corpus has no binary table, so media blobs are derived from document
text bytes (payload-agnostic plumbing — see multimodal/binary_ops.py for
the mapInPandas decode/feature/frame passes, which have no SQL oracle and
are covered by tests/test_multimodal.py). Everything UPSTREAM of the
codec boundary is JVM-side and oracle-checkable, and that is where the
100 TB leverage lives: a video/audio pipeline never materializes decoded
frames across a shuffle — it computes a PLAN of (blob, offset/timestamp)
rows with integer arithmetic and ships only that plan into the
Arrow-batched codec stage. Three such passes here:

- blob metadata (byte length + content hash — the media dedup key)
- uniform frame-sampling schedule (k timestamps/frame indices per video)
- audio window segmentation (fixed window/hop byte-offset spans)
- image tile grid (edge-clamped 64x64 patch plan)

Media attributes (duration, fps, sample rate) come deterministically
from blob bytes/ids, standing in for container-header fields the codec
stage would parse; the arithmetic downstream of them is the real
operator and is exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load, load_scaled


@register(
    "multimodal_media_metadata",
    oracle="""
    SELECT
        doc_id                              AS media_id,
        CAST(strlen(text) AS INT)           AS n_bytes,
        sha256(text)                        AS content_sha,
        CAST(length(text) AS INT)           AS n_chars
    FROM documents
    """,
)
def multimodal_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob metadata: UTF-8 byte size + SHA-256 content hash.

    Scale: pure projection (no shuffle); the hash doubles as the
    content-address for exact media dedup.
    """
    docs = load_scaled(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length("text").alias("n_bytes"),
        F.sha2("text", 256).alias("content_sha"),
        F.length("text").alias("n_chars"),
    )


def _docs_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# Uniform frame-sampling schedule (video)
# ---------------------------------------------------------------------------
# The planning half of video frame extraction: k uniformly-spaced sample
# timestamps per clip, mapped to frame indices at the clip's fps. The
# decode half (seek + decode at those indices) is the mapInPandas codec
# pass in multimodal/binary_ops.py (frame_sample), which consumes exactly
# this (media_id, frame_idx) plan. duration/fps stand in for container
# header fields; all downstream arithmetic is exact BIGINT.
#
# Scale: map-only explode of a constant-8 sequence — no shuffle at any
# SF, output is 8 rows per clip regardless of media size, so the plan
# table stays ~doc-count-sized while the blobs themselves never move.

_N_SAMPLES = 8

_FRAME_PLAN_SPARK_SQL = f"""
WITH media AS (
    SELECT doc_id                                        AS media_id,
           CAST(octet_length(text) AS BIGINT)            AS n_bytes,
           CAST(1000 + (octet_length(text) % 97) * 250 AS BIGINT)
                                                         AS duration_ms,
           CAST(CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 24 ELSE 30 END
                AS BIGINT)                               AS fps
    FROM documents
    WHERE octet_length(text) > 0
)
SELECT media_id,
       CAST(i AS BIGINT)                                 AS sample_id,
       duration_ms,
       fps,
       CAST((i * duration_ms) div {_N_SAMPLES} AS BIGINT)       AS ts_ms,
       CAST(((i * duration_ms) div {_N_SAMPLES}) * fps div 1000 AS BIGINT)
                                                         AS frame_idx
FROM media
LATERAL VIEW explode(sequence(0, {_N_SAMPLES - 1})) t AS i
"""

_FRAME_PLAN_DUCK_SQL = f"""
WITH media AS (
    SELECT doc_id                                        AS media_id,
           CAST(strlen(text) AS BIGINT)                  AS n_bytes,
           CAST(1000 + (strlen(text) % 97) * 250 AS BIGINT)
                                                         AS duration_ms,
           CAST(CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 24 ELSE 30 END
                AS BIGINT)                               AS fps
    FROM documents
    WHERE strlen(text) > 0
)
SELECT media_id,
       CAST(i AS BIGINT)                                 AS sample_id,
       duration_ms,
       fps,
       CAST((i * duration_ms) // {_N_SAMPLES} AS BIGINT)        AS ts_ms,
       CAST(((i * duration_ms) // {_N_SAMPLES}) * fps // 1000 AS BIGINT)
                                                         AS frame_idx
FROM media, UNNEST(generate_series(0, {_N_SAMPLES - 1})) AS t(i)
"""


@register("multimodal_frame_sample_plan", oracle=_FRAME_PLAN_DUCK_SQL)
def multimodal_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame-sampling schedule: 8 sample timestamps per clip,
    mapped to frame indices at the clip's fps.

    Map-only (constant-width sequence explode, no shuffle at any SF);
    the output plan is what ships to the Arrow-batched codec stage —
    decoded frames never cross a shuffle boundary.
    """
    return _docs_sql(spark, sf_dir, _FRAME_PLAN_SPARK_SQL)


# ---------------------------------------------------------------------------
# Audio window segmentation (byte-offset spans)
# ---------------------------------------------------------------------------
# Fixed 80 ms window / 40 ms hop segmentation of PCM-style blobs at
# 2 bytes/ms, emitted as (byte_off, seg_len) spans plus their timeline
# positions. This is the offset plan an audio featurizer consumes — the
# codec stage slices each blob locally by (byte_off, seg_len); the
# segments themselves are never materialized engine-side. (Rates are
# scaled to the corpus's ~300-byte blobs so the window/hop fan-out is
# actually exercised — real PCM constants would put every blob inside
# one hop and degenerate to a projection.)

_BYTES_PER_MS = 2
_WIN_B = 160  # 80 ms
_HOP_B = 80  # 40 ms

_AUDIO_SEG_SPARK_SQL = f"""
WITH media AS (
    SELECT doc_id                             AS media_id,
           CAST(octet_length(text) AS BIGINT) AS n_bytes
    FROM documents
    WHERE octet_length(text) > 0
)
SELECT media_id,
       CAST(start div {_HOP_B} AS BIGINT)                 AS seg_id,
       CAST(start AS BIGINT)                              AS byte_off,
       CAST(least({_WIN_B}, n_bytes - start) AS BIGINT)   AS seg_len,
       CAST(start div {_BYTES_PER_MS} AS BIGINT)          AS start_ms,
       CAST((start + least({_WIN_B}, n_bytes - start)) div {_BYTES_PER_MS}
            AS BIGINT)                                    AS end_ms,
       (start + {_HOP_B} >= n_bytes)                      AS is_last
FROM media
LATERAL VIEW explode(sequence(0, n_bytes - 1, {_HOP_B})) t AS start
"""

_AUDIO_SEG_DUCK_SQL = f"""
WITH media AS (
    SELECT doc_id                             AS media_id,
           CAST(strlen(text) AS BIGINT)       AS n_bytes
    FROM documents
    WHERE strlen(text) > 0
)
SELECT media_id,
       CAST(start // {_HOP_B} AS BIGINT)                  AS seg_id,
       CAST(start AS BIGINT)                              AS byte_off,
       CAST(least({_WIN_B}, n_bytes - start) AS BIGINT)   AS seg_len,
       CAST(start // {_BYTES_PER_MS} AS BIGINT)           AS start_ms,
       CAST((start + least({_WIN_B}, n_bytes - start)) // {_BYTES_PER_MS}
            AS BIGINT)                                    AS end_ms,
       (start + {_HOP_B} >= n_bytes)                      AS is_last
FROM media, UNNEST(generate_series(0, n_bytes - 1, {_HOP_B})) AS t(start)
"""


@register("multimodal_audio_segments", oracle=_AUDIO_SEG_DUCK_SQL)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio window segmentation: 80 ms window / 40 ms hop at
    2 bytes/ms, as (byte_off, seg_len) spans with timeline positions.

    Map-only sequence() explode (no shuffle); row count scales with
    total media bytes / hop, never quadratically, and blobs are sliced
    locally in the codec stage — only the offset plan flows through
    the engine.
    """
    return _docs_sql(spark, sf_dir, _AUDIO_SEG_SPARK_SQL)


# ---------------------------------------------------------------------------
# Image tile grid (2D patch plan)
# ---------------------------------------------------------------------------
# Completes the planning triad (video frames / audio windows / image
# tiles): the 64x64 patch grid a vision preprocessor cuts each image
# into, with edge tiles clamped to the image bounds. Dimensions derive
# deterministically from blob bytes/id (standing in for header fields);
# the grid itself — a double sequence() explode over ceil(w/64) x
# ceil(h/64) — is exact integer arithmetic on both engines.

_TILE = 64

_TILE_PLAN_SPARK_SQL = f"""
WITH media AS (
    SELECT doc_id                                             AS media_id,
           CAST(64 + (octet_length(text) % 193) AS BIGINT)    AS width,
           CAST(64 + (doc_id % 157) AS BIGINT)                AS height
    FROM documents
    WHERE octet_length(text) > 0
)
SELECT media_id, width, height,
       CAST(tx AS BIGINT)                                     AS tile_x,
       CAST(ty AS BIGINT)                                     AS tile_y,
       CAST(tx * {_TILE} AS BIGINT)                           AS off_x,
       CAST(ty * {_TILE} AS BIGINT)                           AS off_y,
       CAST(least({_TILE}, width - tx * {_TILE}) AS BIGINT)   AS tile_w,
       CAST(least({_TILE}, height - ty * {_TILE}) AS BIGINT)  AS tile_h
FROM media
LATERAL VIEW explode(sequence(0, (width + {_TILE - 1}) div {_TILE} - 1)) a AS tx
LATERAL VIEW explode(sequence(0, (height + {_TILE - 1}) div {_TILE} - 1)) b AS ty
"""

_TILE_PLAN_DUCK_SQL = f"""
WITH media AS (
    SELECT doc_id                                             AS media_id,
           CAST(64 + (strlen(text) % 193) AS BIGINT)          AS width,
           CAST(64 + (doc_id % 157) AS BIGINT)                AS height
    FROM documents
    WHERE strlen(text) > 0
)
SELECT media_id, width, height,
       CAST(tx AS BIGINT)                                     AS tile_x,
       CAST(ty AS BIGINT)                                     AS tile_y,
       CAST(tx * {_TILE} AS BIGINT)                           AS off_x,
       CAST(ty * {_TILE} AS BIGINT)                           AS off_y,
       CAST(least({_TILE}, width - tx * {_TILE}) AS BIGINT)   AS tile_w,
       CAST(least({_TILE}, height - ty * {_TILE}) AS BIGINT)  AS tile_h
FROM media,
     UNNEST(generate_series(0, (width + {_TILE - 1}) // {_TILE} - 1)) AS a(tx),
     UNNEST(generate_series(0, (height + {_TILE - 1}) // {_TILE} - 1)) AS b(ty)
"""


@register("multimodal_image_tile_plan", oracle=_TILE_PLAN_DUCK_SQL)
def multimodal_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64x64 image tile grid with edge-clamped tile sizes — the 2D
    patch plan a vision preprocessor consumes.

    Map-only double sequence() explode (no keyed exchange); output rows
    scale with total pixels / tile area, and pixels never cross the
    engine — the codec stage crops locally from (off_x, off_y, w, h).
    """
    return _docs_sql(spark, sf_dir, _TILE_PLAN_SPARK_SQL)
