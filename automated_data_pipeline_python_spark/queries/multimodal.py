"""Multimodal planning queries for the driver catalog.

The corpus has no binary table, so media blobs are derived from document
text bytes (payload-agnostic plumbing — see multimodal/binary_ops.py for
the mapInPandas decode/feature/frame passes, which have no SQL oracle and
are covered by tests/test_multimodal.py). Everything UPSTREAM of the
codec boundary is JVM-side and oracle-checkable, and that is where the
100 TB leverage lives: a video/audio/image pipeline never materializes
decoded media across a shuffle — it computes a PLAN of (blob,
offset/timestamp) rows with integer arithmetic and ships only that plan
into the Arrow-batched codec stage. Four such passes here:

- blob metadata (byte length + content hash — the media dedup key)
- uniform frame-sampling schedule (k timestamps/frame indices per video)
- audio window segmentation (fixed window/hop byte-offset spans)
- image tile grid (edge-clamped 64x64 patch plan)

Media attributes (duration, fps, sample rate, dimensions) come
deterministically from blob bytes/ids, standing in for container-header
fields the codec stage would parse; the arithmetic downstream of them is
the real operator and is exact in both engines.

Each plan is ONE SQL body per query: the engines differ only in a few
tokens (byte length, integer division, sequence explode), injected as
dialect fragments so the twin texts cannot drift apart.
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
# Dialect fragments
# ---------------------------------------------------------------------------
# nbytes: UTF-8 byte length of a column.
# idiv:   integer division (both operands integral in every use below).
# expl1/expl2: explode a generate_series/sequence range (inclusive
#   bounds, optional step — identical semantics in both engines) into
#   column(s) joined laterally against the preceding relation.


def _spark_dialect() -> dict[str, object]:
    return {
        "nbytes": lambda c: f"octet_length({c})",
        "idiv": lambda a, b: f"({a}) div ({b})",
        "expl": lambda var, lo, hi, step=None: (
            f"LATERAL VIEW explode(sequence({lo}, {hi}"
            + (f", {step}" if step else "")
            + f")) {var}_t AS {var}"
        ),
    }


def _duck_dialect() -> dict[str, object]:
    return {
        "nbytes": lambda c: f"strlen({c})",
        "idiv": lambda a, b: f"({a}) // ({b})",
        "expl": lambda var, lo, hi, step=None: (
            f", UNNEST(generate_series({lo}, {hi}"
            + (f", {step}" if step else "")
            + f")) AS {var}_t({var})"
        ),
    }


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


def _frame_plan_sql(d: dict[str, object]) -> str:
    nbytes, idiv, expl = d["nbytes"], d["idiv"], d["expl"]
    ts_ms = idiv("i * duration_ms", _N_SAMPLES)
    return f"""
WITH media AS (
    SELECT doc_id                                        AS media_id,
           CAST(1000 + ({nbytes('text')} % 97) * 250 AS BIGINT)
                                                         AS duration_ms,
           CAST(CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 24 ELSE 30 END
                AS BIGINT)                               AS fps
    FROM documents
    WHERE {nbytes('text')} > 0
)
SELECT media_id,
       CAST(i AS BIGINT)                                 AS sample_id,
       duration_ms,
       fps,
       CAST({ts_ms} AS BIGINT)                           AS ts_ms,
       CAST({idiv(f'({ts_ms}) * fps', 1000)} AS BIGINT)  AS frame_idx
FROM media
{expl('i', 0, _N_SAMPLES - 1)}
"""


@register("multimodal_frame_sample_plan", oracle=_frame_plan_sql(_duck_dialect()))
def multimodal_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame-sampling schedule: 8 sample timestamps per clip,
    mapped to frame indices at the clip's fps.

    Map-only (constant-width sequence explode, no shuffle at any SF);
    the output plan is what ships to the Arrow-batched codec stage —
    decoded frames never cross a shuffle boundary.
    """
    return _docs_sql(spark, sf_dir, _frame_plan_sql(_spark_dialect()))


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


def _audio_seg_sql(d: dict[str, object]) -> str:
    nbytes, idiv, expl = d["nbytes"], d["idiv"], d["expl"]
    return f"""
WITH media AS (
    SELECT doc_id                             AS media_id,
           CAST({nbytes('text')} AS BIGINT)   AS n_bytes
    FROM documents
    WHERE {nbytes('text')} > 0
)
SELECT media_id,
       CAST({idiv('start', _HOP_B)} AS BIGINT)            AS seg_id,
       CAST(start AS BIGINT)                              AS byte_off,
       CAST(least({_WIN_B}, n_bytes - start) AS BIGINT)   AS seg_len,
       CAST({idiv('start', _BYTES_PER_MS)} AS BIGINT)     AS start_ms,
       CAST({idiv(f'start + least({_WIN_B}, n_bytes - start)', _BYTES_PER_MS)}
            AS BIGINT)                                    AS end_ms,
       (start + {_HOP_B} >= n_bytes)                      AS is_last
FROM media
{expl('start', 0, 'n_bytes - 1', _HOP_B)}
"""


@register("multimodal_audio_segments", oracle=_audio_seg_sql(_duck_dialect()))
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio window segmentation: 80 ms window / 40 ms hop at
    2 bytes/ms, as (byte_off, seg_len) spans with timeline positions.

    Map-only sequence() explode (no shuffle); row count scales with
    total media bytes / hop, never quadratically, and blobs are sliced
    locally in the codec stage — only the offset plan flows through
    the engine.
    """
    return _docs_sql(spark, sf_dir, _audio_seg_sql(_spark_dialect()))


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


def _tile_plan_sql(d: dict[str, object]) -> str:
    nbytes, idiv, expl = d["nbytes"], d["idiv"], d["expl"]
    n_tiles = lambda dim: f"{idiv(f'{dim} + {_TILE - 1}', _TILE)} - 1"  # noqa: E731
    return f"""
WITH media AS (
    SELECT doc_id                                             AS media_id,
           CAST(64 + ({nbytes('text')} % 193) AS BIGINT)      AS width,
           CAST(64 + (doc_id % 157) AS BIGINT)                AS height
    FROM documents
    WHERE {nbytes('text')} > 0
)
SELECT media_id, width, height,
       CAST(tx AS BIGINT)                                     AS tile_x,
       CAST(ty AS BIGINT)                                     AS tile_y,
       CAST(tx * {_TILE} AS BIGINT)                           AS off_x,
       CAST(ty * {_TILE} AS BIGINT)                           AS off_y,
       CAST(least({_TILE}, width - tx * {_TILE}) AS BIGINT)   AS tile_w,
       CAST(least({_TILE}, height - ty * {_TILE}) AS BIGINT)  AS tile_h
FROM media
{expl('tx', 0, n_tiles('width'))}
{expl('ty', 0, n_tiles('height'))}
"""


@register("multimodal_image_tile_plan", oracle=_tile_plan_sql(_duck_dialect()))
def multimodal_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64x64 image tile grid with edge-clamped tile sizes — the 2D
    patch plan a vision preprocessor consumes.

    Map-only double sequence() explode (no keyed exchange); output rows
    scale with total pixels / tile area, and pixels never cross the
    engine — the codec stage crops locally from (off_x, off_y, w, h).
    """
    return _docs_sql(spark, sf_dir, _tile_plan_sql(_spark_dialect()))
