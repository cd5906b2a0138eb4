"""RAG / serving-side corpus preparation operators.

What a retrieval pipeline runs between curation (queries/curation.py)
and indexing (queries/similarity.py):

- overlapping document chunking (fixed window + stride over chars; the
  token-budget variant is pack_sequences_chunked in training.py)
- chunk-level exact-duplicate rate (overlap windows re-emit shared
  spans; an index wants each span once)
- document length histogram (equi-width buckets for corpus profiling)
- per-vector int8 scalar quantization of embeddings (the memory-format
  step before an IVF/PQ index ships to serving)

All are single-scan map/agg shapes with exact integer or
double-identical arithmetic, so every query carries a DuckDB oracle.

Scale: chunking and quantization are map-only (no shuffle at any SF —
they pipeline into whatever sink follows); the histogram and dup-rate
are single hash aggregations on bounded key spaces (buckets; chunk
hashes). Nothing here materializes per-pair or per-token state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load, load_scaled

_CHUNK = 160  # window (chars)
_STRIDE = 120  # step (chars) -> 40-char overlap between neighbors


def _docs_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(sql)


def _emb_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    load_scaled(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# Overlapping chunker: fixed char window, fixed stride
# ---------------------------------------------------------------------------
# Spark and DuckDB substring share 1-based, end-clamped semantics, so
# the chunk text itself is oracle-comparable. Start offsets come from
# sequence()/generate_series — fully codegen'd, no iteration. Map-only:
# a 100 TB corpus chunks in place with zero shuffle; downstream
# embedding/indexing sees ~n_chars/stride rows per doc.

_CHUNK_SPARK_SQL = f"""
SELECT doc_id,
       CAST(start div {_STRIDE} AS BIGINT)         AS chunk_id,
       substring(text, start + 1, {_CHUNK})        AS chunk_text,
       CAST(length(substring(text, start + 1, {_CHUNK})) AS BIGINT)
                                                   AS chunk_len
FROM (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) > 0)
LATERAL VIEW explode(sequence(0, n - 1, {_STRIDE})) t AS start
"""

_CHUNK_DUCK_SQL = f"""
SELECT doc_id,
       CAST(start // {_STRIDE} AS BIGINT)          AS chunk_id,
       substr(text, start + 1, {_CHUNK})           AS chunk_text,
       CAST(len(substr(text, start + 1, {_CHUNK})) AS BIGINT)
                                                   AS chunk_len
FROM (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) > 0),
     UNNEST(generate_series(0, n - 1, {_STRIDE})) AS t(start)
"""


@register("chunk_documents_overlap", oracle=_CHUNK_DUCK_SQL)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (160ch window, 120ch
    stride) — the standard RAG splitter, emitted by sequence() explode.

    Map-only (no shuffle at any scale); chunk count scales with corpus
    chars, never quadratically.
    """
    return _docs_sql(spark, sf_dir, _CHUNK_SPARK_SQL)


# ---------------------------------------------------------------------------
# Chunk-level duplicate rate
# ---------------------------------------------------------------------------
# Overlap windows re-emit shared spans and boilerplate repeats across
# docs; an index wants each distinct span once. One hash-agg on the
# chunk text (at 100 TB: on a 64-bit chunk hash) — same shape as
# dedup_exact_documents but at sub-document granularity.

_CHUNK_DUP_SPARK_SQL = f"""
WITH chunks AS (
    SELECT substring(text, start + 1, {_CHUNK}) AS chunk_text
    FROM (SELECT text, length(text) AS n FROM documents WHERE length(text) > 0)
    LATERAL VIEW explode(sequence(0, n - 1, {_STRIDE})) t AS start
),
per AS (
    SELECT chunk_text, CAST(count(*) AS BIGINT) AS n_copies
    FROM chunks GROUP BY chunk_text
)
SELECT CAST(sum(n_copies) AS BIGINT)                      AS n_chunks,
       CAST(count(*) AS BIGINT)                           AS n_distinct,
       CAST(sum(n_copies) - count(*) AS BIGINT)           AS n_redundant,
       floor((1.0 - CAST(count(*) AS DOUBLE) / sum(n_copies)) * 1e6 + 0.5) / 1e6
                                                          AS dup_ratio
FROM per
"""

_CHUNK_DUP_DUCK_SQL = f"""
WITH chunks AS (
    SELECT substr(text, start + 1, {_CHUNK}) AS chunk_text
    FROM (SELECT text, len(text) AS n FROM documents WHERE len(text) > 0),
         UNNEST(generate_series(0, n - 1, {_STRIDE})) AS t(start)
),
per AS (
    SELECT chunk_text, CAST(count(*) AS BIGINT) AS n_copies
    FROM chunks GROUP BY chunk_text
)
SELECT CAST(sum(n_copies) AS BIGINT)                      AS n_chunks,
       CAST(count(*) AS BIGINT)                           AS n_distinct,
       CAST(sum(n_copies) - count(*) AS BIGINT)           AS n_redundant,
       floor((1.0 - CAST(count(*) AS DOUBLE) / sum(n_copies)) * 1e6 + 0.5) / 1e6
                                                          AS dup_ratio
FROM per
"""


@register("chunk_dedup_rate", oracle=_CHUNK_DUP_DUCK_SQL)
def chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of redundant chunks after overlap-window splitting: one
    hash-agg over chunk text (a 64-bit chunk hash at scale), exact
    integer counts + snapped ratio."""
    return _docs_sql(spark, sf_dir, _CHUNK_DUP_SPARK_SQL)


# ---------------------------------------------------------------------------
# Document length histogram
# ---------------------------------------------------------------------------
# Equi-width profile of n_chars. Integer floor-division bucketing is
# engine-exact; one hash agg over ~dozens of buckets (map-side combine
# collapses everything before the shuffle).

_HIST_WIDTH = 200

_HIST_SPARK_SQL = f"""
SELECT CAST(n_chars div {_HIST_WIDTH} AS BIGINT)            AS bucket,
       CAST(n_chars div {_HIST_WIDTH} AS BIGINT) * {_HIST_WIDTH}
                                                            AS bucket_lo,
       CAST(count(*) AS BIGINT)                             AS n_docs,
       CAST(min(n_chars) AS BIGINT)                         AS min_chars,
       CAST(max(n_chars) AS BIGINT)                         AS max_chars,
       floor(avg(CAST(n_chars AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS avg_chars
FROM documents
GROUP BY bucket, bucket_lo
"""

_HIST_DUCK_SQL = f"""
SELECT CAST(n_chars // {_HIST_WIDTH} AS BIGINT)             AS bucket,
       CAST(n_chars // {_HIST_WIDTH} AS BIGINT) * {_HIST_WIDTH}
                                                            AS bucket_lo,
       CAST(count(*) AS BIGINT)                             AS n_docs,
       CAST(min(n_chars) AS BIGINT)                         AS min_chars,
       CAST(max(n_chars) AS BIGINT)                         AS max_chars,
       floor(avg(CAST(n_chars AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS avg_chars
FROM documents
GROUP BY 1, 2
"""


@register("doc_length_histogram", oracle=_HIST_DUCK_SQL)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width (width=200) histogram of document lengths with
    per-bucket min/max/avg — integer bucketing, map-side-combined agg."""
    return _docs_sql(spark, sf_dir, _HIST_SPARK_SQL)


# ---------------------------------------------------------------------------
# Int8 scalar quantization of embeddings
# ---------------------------------------------------------------------------
# Symmetric per-vector quantization: scale = max(|x|), q = round(x /
# scale * 127). All arithmetic is promoted to DOUBLE before any op —
# float32→float64 promotion is exact and IEEE double ops are
# engine-identical, so q is bit-equal across Spark and DuckDB (round
# via the floor(+0.5) house form; max(|x|) is order-independent).
# Output is exploded to (vec_id, dim_idx, q) — scalar rows the driver
# canonicalizer can sort (array-typed outputs crash it; see round 1's
# map_functions_demo). Map-only: no shuffle at any scale.

_QUANT_SPARK_SQL = """
WITH scaled AS (
    SELECT vec_id,
           array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx,
           embedding
    FROM embeddings
)
SELECT vec_id,
       CAST(dim_idx AS BIGINT)                                  AS dim_idx,
       CAST(floor(CAST(val AS DOUBLE) / mx * 127.0 + 0.5) AS BIGINT) AS q,
       floor(mx * 1e6 + 0.5) / 1e6                              AS scale
FROM scaled
LATERAL VIEW posexplode(embedding) t AS dim_idx, val
WHERE mx > 0
"""

_QUANT_DUCK_SQL = """
WITH scaled AS (
    SELECT vec_id,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx,
           embedding
    FROM embeddings
)
SELECT vec_id,
       CAST(dim - 1 AS BIGINT)                                  AS dim_idx,
       CAST(floor(CAST(embedding[dim] AS DOUBLE) / mx * 127.0 + 0.5) AS BIGINT) AS q,
       floor(mx * 1e6 + 0.5) / 1e6                              AS scale
FROM scaled,
     UNNEST(generate_series(1, len(embedding))) AS t(dim)
WHERE mx > 0
"""


@register("embedding_quantize_int8", oracle=_QUANT_DUCK_SQL)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (q = round(x/max|x|*127))
    exploded to scalar rows; double-promoted arithmetic keeps both
    engines bit-identical. Map-only."""
    return _emb_sql(spark, sf_dir, _QUANT_SPARK_SQL)
