"""Training-data pipeline operators beyond the reference's surface.

The operations a 100 TB LLM pre-training data pipeline runs after
dedup (queries/dedup.py) and quality scoring (queries/text.py):

- benchmark decontamination (n-gram overlap against an eval set)
- repetition detection (within-document duplication signals)
- deterministic stratified sampling (hash-bucket quotas per stratum)
- sequence packing (concat-and-chunk token spans into fixed budgets)
- domain mixture weights (resampling factors toward a target mix)

All five are single-scan or two-scan shapes with broadcast-sized small
sides and integer/exact arithmetic, so every query carries a DuckDB
oracle. Scale notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_data_pipeline_python_spark.functions.text import (
    DUCK_TOKENS,
    SPARK_TOKENS,
    duck_hash28,
    duck_hash60,
    duck_word_shingles,
    spark_hash28,
    spark_hash60,
    spark_word_shingles,
)
from automated_data_pipeline_python_spark.queries.catalog import register
from automated_data_pipeline_python_spark.tables import load, load_scaled

_S_TOK = SPARK_TOKENS.format(col="text")
_D_TOK = DUCK_TOKENS.format(col="text")


def _docs_sql(
    spark: SparkSession, sf_dir: str, sql: str, scaled: bool = False
) -> DataFrame:
    # scaled=True only for tokenize/shingle-heavy pipelines where per-row
    # compute dominates; cheap scan+filter shapes (sampling, mixture)
    # stay exchange-free (tests/test_plans.py pins that).
    loader = load_scaled if scaled else load
    loader(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap vs a held-out eval set
# ---------------------------------------------------------------------------
# The eval set here is the deterministic slice doc_id % 19 == 0 (a real
# deployment joins the actual benchmark corpus — identical plan shape).
# Scale: the benchmark shingle set is eval-sized (tiny vs the corpus),
# so Spark broadcasts it; the corpus shingle relation is scanned once
# and never reshuffles — cost is O(corpus shingles), no pair explosion.

_CONTAM_MOD = 19

# r12 optimization (guide §2.3/§2.4): a document's DISTINCT shingle set
# is intra-row (array_distinct over its own shingle array), so the old
# corpus-wide DISTINCT exchange and its localCheckpoint disappear —
# both the benchmark side (filter pushed to the scan: only the 1/19
# eval slice is tokenized) and the corpus side explode per-doc
# DISTINCT arrays computed map-side. The broadcast hash join + per-doc
# aggregation stay: probing a broadcast hash table per shingle beats a
# per-row array_intersect against the full eval-set array (measured
# 6x wall on exactly that variant).
# The per-doc set relation is materialized (localCheckpoint): both the
# benchmark and corpus branches explode it, and explode-of-an-attribute
# makes InferFiltersFromGenerate add a size(shs) > 0 filter that would
# otherwise be pushed below the repartition exchange with the WHOLE
# tokenize+distinct expression re-expanded into it, single-core
# (measured 13x wall). Against checkpointed arrays the inferred filter
# is a cheap size() probe.
_CONTAM_SETS_SPARK = f"""
SELECT doc_id, array_distinct({spark_word_shingles('w', 3)}) AS shs
FROM (SELECT doc_id, {_S_TOK} AS w FROM documents) toks
"""

_CONTAM_SPARK_SQL = f"""
WITH sets AS (SELECT doc_id, shs FROM ct_sets),
bench AS (
    SELECT DISTINCT shingle
    FROM (SELECT shs FROM sets WHERE doc_id % {_CONTAM_MOD} = 0) e
    LATERAL VIEW explode(shs) t AS shingle
)
SELECT /*+ BROADCAST(b) */
       c.doc_id,
       count(*)                                       AS n_shingles,
       count(b.shingle)                               AS n_contaminated,
       floor((CAST(count(b.shingle) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6
                                                      AS contamination_ratio
FROM (SELECT doc_id, shingle
      FROM (SELECT doc_id, shs FROM sets WHERE doc_id % {_CONTAM_MOD} != 0) x
      LATERAL VIEW explode(shs) t AS shingle) c
LEFT JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
"""

_CONTAM_DUCK_SQL = f"""
WITH toks AS (
    SELECT doc_id, {_D_TOK} AS w FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, shingle
    FROM toks, UNNEST({duck_word_shingles('w', 3)}) AS t(shingle)
),
bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % {_CONTAM_MOD} = 0
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT)         AS n_shingles,
       CAST(count(b.shingle) AS BIGINT) AS n_contaminated,
       floor((CAST(count(b.shingle) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6
                                        AS contamination_ratio
FROM (SELECT doc_id, shingle FROM sh WHERE doc_id % {_CONTAM_MOD} != 0) c
LEFT JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
"""


@register("contamination_ngram_overlap", oracle=_CONTAM_DUCK_SQL)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram overlap against a held-out benchmark slice.

    contamination_ratio = |doc shingles ∩ benchmark shingles| / |doc
    shingles|; a curation pipeline drops or flags docs above a
    threshold before training. Per-doc distinct shingle sets are
    intra-row (array_distinct, map-side — no corpus-wide DISTINCT
    exchange or checkpoint since r12); the benchmark shingle set is
    broadcast and the only corpus exchange left is the per-doc count
    aggregation (map-side partials).
    """
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(_CONTAM_SETS_SPARK).localCheckpoint(eager=True).createOrReplaceTempView(
        "ct_sets"
    )
    return spark.sql(_CONTAM_SPARK_SQL)


# ---------------------------------------------------------------------------
# Repetition detection: within-document duplication signals
# ---------------------------------------------------------------------------
# Boilerplate and degenerate generations repeat tokens/n-grams far more
# than natural text. Signals: distinct-token ratio, top-token share,
# duplicate-trigram ratio. Two corpus scans (token stats, trigram
# stats), both partial-aggregated map-side; no joins bigger than
# doc-count rows.

_REPEAT_SPARK_SQL = f"""
WITH toks AS (
    SELECT doc_id, {_S_TOK} AS w FROM documents
),
tok AS (
    SELECT doc_id, token, count(*) AS cnt
    FROM toks LATERAL VIEW explode(w) t AS token
    GROUP BY doc_id, token
),
tokagg AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(cnt) AS BIGINT) AS top_cnt
    FROM tok GROUP BY doc_id
),
tris AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                AS n_tri,
           CAST(count(DISTINCT shingle) AS BIGINT) AS n_tri_distinct
    FROM (SELECT doc_id, shingle
          FROM toks LATERAL VIEW explode({spark_word_shingles('w', 3)}) t AS shingle)
    GROUP BY doc_id
)
SELECT a.doc_id,
       a.n_tokens,
       floor((CAST(a.n_distinct AS DOUBLE) / a.n_tokens) * 1e6 + 0.5) / 1e6 AS distinct_token_ratio,
       floor((CAST(a.top_cnt AS DOUBLE) / a.n_tokens) * 1e6 + 0.5) / 1e6    AS top_token_share,
       coalesce(floor((1.0 - CAST(t.n_tri_distinct AS DOUBLE) / t.n_tri) * 1e6 + 0.5) / 1e6,
                CAST(0 AS DOUBLE))                                          AS dup_trigram_ratio
FROM tokagg a LEFT JOIN tris t ON a.doc_id = t.doc_id
"""

_REPEAT_DUCK_SQL = f"""
WITH toks AS (
    SELECT doc_id, {_D_TOK} AS w FROM documents
),
tok AS (
    SELECT doc_id, token, count(*) AS cnt
    FROM toks, UNNEST(w) AS t(token)
    GROUP BY doc_id, token
),
tokagg AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(cnt) AS BIGINT) AS top_cnt
    FROM tok GROUP BY doc_id
),
tris AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                AS n_tri,
           CAST(count(DISTINCT shingle) AS BIGINT) AS n_tri_distinct
    FROM (SELECT doc_id, shingle
          FROM toks, UNNEST({duck_word_shingles('w', 3)}) AS t(shingle))
    GROUP BY doc_id
)
SELECT a.doc_id,
       a.n_tokens,
       floor((CAST(a.n_distinct AS DOUBLE) / a.n_tokens) * 1e6 + 0.5) / 1e6 AS distinct_token_ratio,
       floor((CAST(a.top_cnt AS DOUBLE) / a.n_tokens) * 1e6 + 0.5) / 1e6    AS top_token_share,
       coalesce(floor((1.0 - CAST(t.n_tri_distinct AS DOUBLE) / t.n_tri) * 1e6 + 0.5) / 1e6,
                CAST(0 AS DOUBLE))                                          AS dup_trigram_ratio
FROM tokagg a LEFT JOIN tris t ON a.doc_id = t.doc_id
"""


# Map-only rewrite: every metric is per-document, so nothing needs an
# explode or a shuffle — compute over the token ARRAY row-locally.
# top_cnt (the mode count) folds over the SORTED array tracking the
# current/best run length: O(n log n) per row, linear memory, instead of
# the O(distinct*n) filter-per-distinct-token form.
_TOP_RUN = (
    "aggregate(array_sort(w),"
    " named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),"
    " (acc, x) -> named_struct("
    "   'prev', x,"
    "   'run',  IF(x <=> acc.prev, acc.run + 1, 1L),"
    "   'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1L))),"
    " acc -> acc.best)"
)

_REPEAT_SPARK_MAPONLY = f"""
WITH base AS (
    SELECT doc_id, {_S_TOK} AS w FROM documents
),
m AS (
    SELECT doc_id,
           CAST(size(w) AS BIGINT)                 AS n_tokens,
           CAST(size(array_distinct(w)) AS BIGINT) AS n_distinct,
           {_TOP_RUN}                              AS top_cnt,
           {spark_word_shingles('w', 3)}           AS tris
    FROM base
)
SELECT doc_id,
       n_tokens,
       floor((CAST(n_distinct AS DOUBLE) / n_tokens) * 1e6 + 0.5) / 1e6 AS distinct_token_ratio,
       floor((CAST(top_cnt AS DOUBLE) / n_tokens) * 1e6 + 0.5) / 1e6    AS top_token_share,
       coalesce(floor((1.0 - CAST(size(array_distinct(tris)) AS DOUBLE)
                           / nullif(size(tris), 0)) * 1e6 + 0.5) / 1e6,
                CAST(0 AS DOUBLE))                                      AS dup_trigram_ratio
FROM m
"""


@register("text_repetition_scores", oracle=_REPEAT_DUCK_SQL)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition: distinct-token ratio, top-token share,
    duplicate-trigram ratio — the standard degenerate-text filters.

    Scale: map-only compute — zero joins, no per-token shuffle. The
    prior relational form (explode → groupBy(doc_id, token) → join)
    shuffled every token occurrence twice and re-ran the tokenizer per
    CTE reference (Spark inlines CTEs); the array form computes all
    four metrics row-locally over ``tables.load_scaled`` partitions
    (full-width locally, no added shuffle at real scale), so the
    sort+fold compute stays embarrassingly parallel at 100 TB.
    """
    return _docs_sql(spark, sf_dir, _REPEAT_SPARK_MAPONLY, scaled=True)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: hash-bucket quotas per stratum
# ---------------------------------------------------------------------------
# rand()-based sampling is neither reproducible across engines nor
# stable under retries; production pipelines sample on a content hash.
# Stratum rates: en 50%, de 30%, everything else 10%. One scan, the
# predicate evaluates row-local (no shuffle at all) — at 100 TB this is
# a map-only job.

_SAMPLE_RATE_CASE = (
    "CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 ELSE 10 END"
)

_SAMPLE_SPARK_SQL = f"""
SELECT doc_id, lang, source, bucket
FROM (
    SELECT doc_id, lang, source,
           pmod({spark_hash28('CAST(doc_id AS STRING)')}, 100) AS bucket
    FROM documents
)
WHERE bucket < {_SAMPLE_RATE_CASE}
"""

_SAMPLE_DUCK_SQL = f"""
SELECT doc_id, lang, source, bucket
FROM (
    SELECT doc_id, lang, source,
           {duck_hash28('CAST(doc_id AS VARCHAR)')} % 100 AS bucket
    FROM documents
)
WHERE bucket < {_SAMPLE_RATE_CASE}
"""


@register("sample_stratified_deterministic", oracle=_SAMPLE_DUCK_SQL)
def sample_stratified_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-bucket stratified sample (en 50%, de 30%, else 10%).

    The SHA-derived bucket is a pure function of doc_id, so the sample
    is identical across engines, retries, and partitionings — unlike
    rand()/TABLESAMPLE. Map-only: no shuffle.
    """
    return _docs_sql(spark, sf_dir, _SAMPLE_SPARK_SQL)


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-chunk token spans into fixed budgets
# ---------------------------------------------------------------------------
# GPT-style packing: concatenate each source's docs in a deterministic
# order and slice the token stream at seq_len boundaries; a doc spans
# 1..k packs. The running-total window partitions by source — at 100 TB
# packing runs per shard/file (same plan, narrower partitions), never a
# global sort. Emission is sequence()/generate_series explode — pure
# codegen, no iteration.

_PACK_LEN = 512

_PACK_SPARK_SQL = f"""
WITH base AS (
    SELECT source, doc_id, CAST(size({_S_TOK}) AS BIGINT) AS n_tok
    FROM documents
),
pos AS (
    SELECT source, doc_id, n_tok,
           sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
    FROM base WHERE n_tok > 0
)
SELECT source, doc_id, pack_id,
       least(cum, (pack_id + 1) * {_PACK_LEN})
           - greatest(cum - n_tok, pack_id * {_PACK_LEN}) AS tokens_in_pack
FROM pos
LATERAL VIEW explode(sequence((cum - n_tok) div {_PACK_LEN},
                              (cum - 1) div {_PACK_LEN})) t AS pack_id
"""

_PACK_DUCK_SQL = f"""
WITH base AS (
    SELECT source, doc_id, CAST(len({_D_TOK}) AS BIGINT) AS n_tok
    FROM documents
),
pos AS (
    SELECT source, doc_id, n_tok,
           CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM base WHERE n_tok > 0
)
SELECT source, doc_id, pack_id,
       least(cum, (pack_id + 1) * {_PACK_LEN})
           - greatest(cum - n_tok, pack_id * {_PACK_LEN}) AS tokens_in_pack
FROM pos, UNNEST(generate_series((cum - n_tok) // {_PACK_LEN},
                                 (cum - 1) // {_PACK_LEN})) AS t(pack_id)
"""


@register("pack_sequences_chunked", oracle=_PACK_DUCK_SQL)
def pack_sequences_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into {len}-token packs.

    Each (source, doc) maps to the pack ids its token span crosses,
    with the token count it contributes to each — the exact bookkeeping
    a training loader needs. Deterministic (doc_id order), one window
    shuffle on source, emission fully codegen'd.
    """
    return _docs_sql(spark, sf_dir, _PACK_SPARK_SQL)


# ---------------------------------------------------------------------------
# Domain mixture weights: resampling factors toward a target mix
# ---------------------------------------------------------------------------
# Given per-language token counts, compute each language's share and
# the resample weight that would equalize the mixture (target = uniform
# across observed languages; a deployment passes its own targets).
# Aggregate-then-broadcast: per-language rollup is lang-count-sized.

_MIX_SPARK_SQL = f"""
WITH per AS (
    SELECT lang,
           CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(sum(size({_S_TOK})) AS BIGINT)   AS n_tokens
    FROM documents
    GROUP BY lang
),
tot AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT)      AS n_langs
    FROM per
)
SELECT lang, n_docs, n_tokens,
       floor((CAST(n_tokens AS DOUBLE) / total_tokens) * 1e6 + 0.5) / 1e6 AS token_share,
       floor((1.0 / n_langs) * 1e6 + 0.5) / 1e6                           AS target_share,
       floor(((1.0 / n_langs) / (CAST(n_tokens AS DOUBLE) / total_tokens)) * 1e6 + 0.5) / 1e6
                                                                          AS resample_weight
FROM per CROSS JOIN tot
"""

_MIX_DUCK_SQL = f"""
WITH per AS (
    SELECT lang,
           CAST(count(*) AS BIGINT)            AS n_docs,
           CAST(sum(len({_D_TOK})) AS BIGINT)  AS n_tokens
    FROM documents
    GROUP BY lang
),
tot AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT)      AS n_langs
    FROM per
)
SELECT lang, n_docs, n_tokens,
       floor((CAST(n_tokens AS DOUBLE) / total_tokens) * 1e6 + 0.5) / 1e6 AS token_share,
       floor((1.0 / n_langs) * 1e6 + 0.5) / 1e6                           AS target_share,
       floor(((1.0 / n_langs) / (CAST(n_tokens AS DOUBLE) / total_tokens)) * 1e6 + 0.5) / 1e6
                                                                          AS resample_weight
FROM per CROSS JOIN tot
"""


@register("mixture_domain_weights", oracle=_MIX_DUCK_SQL)
def mixture_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token shares + resampling weights toward a uniform
    target mixture (weight = target_share / actual_share)."""
    return _docs_sql(spark, sf_dir, _MIX_SPARK_SQL)


# ---------------------------------------------------------------------------
# Per-group reservoir sampling: deterministic k docs per stratum
# ---------------------------------------------------------------------------
# The distributed equivalent of a per-group reservoir: rank by content
# hash inside each (lang, source) stratum and keep the first k. The
# hash gives a uniform, engine/retry/partitioning-independent order;
# doc_id breaks the (improbable) hash ties so the k-set is total-ordered.
# Scale: one shuffle on the stratum key; per-group sort cost is bounded
# by stratum size (use the aggregate min_by-k pattern if strata are
# huge and k tiny).

_GROUP_K = 5

_GROUP_SAMPLE_SPARK_SQL = f"""
WITH h AS (
    SELECT doc_id, lang, source,
           {spark_hash28('CAST(doc_id AS STRING)')} AS hsh
    FROM documents
),
r AS (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY lang, source
                              ORDER BY hsh, doc_id) AS rn
    FROM h
)
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
FROM r WHERE rn <= {_GROUP_K}
"""

_GROUP_SAMPLE_DUCK_SQL = f"""
WITH h AS (
    SELECT doc_id, lang, source,
           {duck_hash28('CAST(doc_id AS VARCHAR)')} AS hsh
    FROM documents
),
r AS (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY lang, source
                              ORDER BY hsh, doc_id) AS rn
    FROM h
)
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
FROM r WHERE rn <= {_GROUP_K}
"""


@register("sample_per_group_reservoir", oracle=_GROUP_SAMPLE_DUCK_SQL)
def sample_per_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample (hash-ranked reservoir)."""
    return _docs_sql(spark, sf_dir, _GROUP_SAMPLE_SPARK_SQL)


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle → training shards
# ---------------------------------------------------------------------------
# The last step before export: training wants the corpus in a
# reproducible pseudo-random order, split into shards (one per output
# file / data-loader worker). The portable-hash key gives the same
# order on any engine and any run; shard assignment is map-only and the
# within-shard position is a per-shard sort — exactly
# repartitionByRange + sortWithinPartitions before the write, NEVER a
# global sort. Shard count = output file count at 100 TB; skew is
# impossible because the key is a cryptographic hash of the doc id.

_N_SHARDS = 8


def _shuffle_sql(hash60, str_t: str) -> str:
    key = hash60(f"concat('shuffle:', CAST(doc_id AS {str_t}))")
    return f"""
WITH keyed AS (
    SELECT doc_id, n_chars, {key} AS key
    FROM documents
),
sharded AS (
    SELECT doc_id, n_chars, key, key % {_N_SHARDS} AS shard
    FROM keyed
)
SELECT doc_id,
       CAST(shard AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
            AS INT) AS pos
FROM sharded
"""


@register(
    "corpus_shuffle_shards",
    oracle=_shuffle_sql(duck_hash60, "VARCHAR"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle into training shards.

    Scale: hashing and shard assignment are map-only; ordering is
    within-shard only (per-partition sort at write time) — no global
    sort, no skew (hash keys are uniform). Deterministic across
    engines/runs via the portable SHA-derived key.
    """
    return _docs_sql(spark, sf_dir, _shuffle_sql(spark_hash60, "STRING"))


# ---------------------------------------------------------------------------
# Token-budget sampling per source (data mixing under a budget)
# ---------------------------------------------------------------------------
# Mixture weights say WHAT fraction each domain contributes; this
# operator enforces it: walk each source's documents in deterministic
# hash order, accumulate token counts, keep documents until the
# source's token budget is spent. The kept set is stable across runs
# and engines — the property a reproducible training mix needs.

_TOKEN_BUDGET = 2000  # per-source token budget on this corpus


def _budget_sql(hash60, tok, str_t: str) -> str:
    key = hash60(f"concat('budget:', CAST(doc_id AS {str_t}))")
    return f"""
WITH counted AS (
    SELECT doc_id, source, {key} AS key,
           CAST(len_w AS BIGINT) AS tok_cnt
    FROM (SELECT doc_id, source, {tok} AS len_w FROM documents) c0
),
walked AS (
    SELECT doc_id, source, tok_cnt,
           CAST(sum(tok_cnt) OVER (PARTITION BY source ORDER BY key, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum_tokens
    FROM counted
)
SELECT doc_id, source, CAST(tok_cnt AS BIGINT) AS tok_cnt, cum_tokens
FROM walked
WHERE cum_tokens <= {_TOKEN_BUDGET}
"""


_BUDGET_SPARK_TOK = f"size({_S_TOK})"
_BUDGET_DUCK_TOK = f"len({_D_TOK})"


@register(
    "sample_token_budget",
    oracle=_budget_sql(duck_hash60, _BUDGET_DUCK_TOK, "VARCHAR"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents per source until a token budget is spent.

    Scale: one shuffle on source (the same partitioning every per-source
    op uses), one running-sum window inside each source partition, and
    integer arithmetic end-to-end (token counts and cumulative sums are
    exact) — no float discipline needed. The deterministic hash walk
    order makes the kept set reproducible across engines and runs.
    """
    return _docs_sql(spark, sf_dir, _budget_sql(spark_hash60, _BUDGET_SPARK_TOK, "STRING"))


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------
# Quality-weighted corpus selection: pick k docs per language where a
# doc's inclusion probability is proportional to its weight (here
# n_chars — substitute any quality score). A-ES makes that a rank
# problem: key = ln(u) / w with u uniform in (0,1]; the top-k keys per
# stratum ARE a weighted sample without replacement. u derives from the
# portable SHA hash of the doc id, so the "randomness" is reproducible
# on any engine and any run — the same trick as the unweighted
# reservoir above, with the weight exponent added.
#
# Float discipline: u is an exact dyadic rational (28-bit integer /
# 2^28); ln(u)/w is one deterministic double op per row, snapped to
# the 1e-9 grid BEFORE ranking so an ulp at a rank boundary cannot
# reorder engines (doc_id breaks exact ties).
#
# Scale: map-only keying + one k-per-stratum rank — identical shape to
# the unweighted reservoir (no global sort; per-stratum top-k).

_WEIGHTED_K = 40


def _weighted_sample_sql(hash28, str_t: str) -> str:
    u = f"(CAST({hash28(f'''concat('wsample:', CAST(doc_id AS {str_t}))''')} AS DOUBLE) + 1) / 268435456.0"
    return f"""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           floor((ln({u}) / n_chars) * 1e9 + 0.5) / 1e9 AS skey
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, n_chars, skey,
           row_number() OVER (PARTITION BY lang
                              ORDER BY skey DESC, doc_id) AS rn
    FROM keyed
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, skey
FROM ranked
WHERE rn <= {_WEIGHTED_K}
"""


@register(
    "sample_weighted_reservoir",
    oracle=_weighted_sample_sql(duck_hash28, "VARCHAR"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional k-per-language sample (A-ES)."""
    return _docs_sql(spark, sf_dir, _weighted_sample_sql(spark_hash28, "STRING"))


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------
# Document-level holdout before any training run: the split must be
# (a) deterministic across engines, runs, and reshuffles — a doc NEVER
# migrates between splits when the corpus grows, or val contaminates
# train; (b) assigned by content-independent hash, so no correlation
# with quality/length/source. The portable SHA bucket gives both: each
# doc_id maps to a stable bucket in [0,100); 80/10/10 by range. The
# report aggregates per (split, lang) doc and token counts — the sanity
# table checked before every run. Map-only + one small agg.

_SPLIT_ARMS = "WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test'"


def _split_sql(hash28, str_t: str, tok_len: str, modfn: str = "pmod") -> str:
    # hash28 is nonnegative, so DuckDB's mod == Spark's pmod here
    bucket = f"{modfn}({hash28(f'''concat('split:', CAST(doc_id AS {str_t}))''')}, 100)"
    return f"""
WITH assigned AS (
    SELECT doc_id, lang,
           {tok_len} AS n_tokens,
           CASE {_SPLIT_ARMS} END AS split
    FROM (SELECT doc_id, lang, text, {bucket} AS bucket FROM documents)
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split, lang
"""


@register(
    "sample_train_val_test",
    oracle=_split_sql(
        duck_hash28,
        "VARCHAR",
        f"len({DUCK_TOKENS.format(col='text')})",
        modfn="mod",
    ),
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic doc-level split report (per split × lang)."""
    return _docs_sql(
        spark,
        sf_dir,
        _split_sql(
            spark_hash28,
            "STRING",
            f"size({SPARK_TOKENS.format(col='text')})",
        ),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (multilingual τ-sampling)
# ---------------------------------------------------------------------------
# The practical successor to uniform-target resampling above: sampling
# probabilities ∝ share^τ, the multilingual-LM convention (τ→1 keeps
# the natural mix, τ→0 approaches uniform; 0.3/0.7 are the standard
# settings). Float discipline: shares snap to the 1e6 grid FIRST so
# pow() runs on identical doubles in both engines; each share^τ term
# snaps to the 1e9 grid before the cross-language normalizing sum
# (snapped integers sum order-independently); the final probability
# snaps once more.

from automated_data_pipeline_python_spark.functions.numeric import (  # noqa: E402
    sql_exact_sum as _mx_exact_sum,
)

_TEMP_TAUS = ("0.3e0", "0.7e0")


def _temp_mix_sql(tok_len: str) -> str:
    arms = []
    for tau in _TEMP_TAUS:
        arms.append(f"""
SELECT '{tau[:3]}' AS tau, lang, token_share,
       floor((pw / norm) * 1e6 + 0.5) / 1e6 AS temp_weight
FROM (
    SELECT lang, token_share,
           floor(power(token_share, {tau}) * 1e9 + 0.5) / 1e9 AS pw
    FROM shares
) a
CROSS JOIN (
    SELECT {_mx_exact_sum(f"power(token_share, {tau})", 9)} AS norm
    FROM shares
) n""")
    arms_sql = "\nUNION ALL\n".join(arms)
    return f"""
WITH per AS (
    SELECT lang, CAST(sum({tok_len}) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per),
shares AS (
    SELECT lang,
           floor((CAST(n_tokens AS DOUBLE) / total_tokens) * 1e6 + 0.5)
               / 1e6 AS token_share
    FROM per CROSS JOIN tot
)
{arms_sql}
"""


@register(
    "mixture_temperature_weights",
    oracle=_temp_mix_sql(f"len({_D_TOK})"),
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling weights ∝ token_share^τ for τ ∈ {0.3, 0.7} per
    language — the multilingual temperature-sampling table, with
    snapped-pow + exact-sum normalization."""
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_temp_mix_sql(f"size({_S_TOK})"))


# ---------------------------------------------------------------------------
# Class-balanced mixture weights (effective number of samples)
# ---------------------------------------------------------------------------
# Cui et al. 2019: reweighting by raw inverse frequency over-corrects
# because marginal samples overlap — the effective number of samples
# in a class of size n is E_n = (1 - beta^n)/(1 - beta), and the
# class-balanced weight is proportional to 1/E_n. The third member of
# the mixture family: domain weights re-balance by token share,
# temperature weights flatten by alpha-power, class-balanced weights
# saturate by beta-geometric overlap.
#
# Float discipline: beta^n = exp(n*ln(beta)) snaps to the 1e-9 grid
# the moment it is computed (libm exp/ln can differ by an ulp
# cross-engine and n amplifies it); E_n and 1/E_n are then single
# divisions of identical doubles; the normalizer is an exact sum of
# 1e-9-snapped inverse weights over the bounded source relation.
#
# Scale: one corpus-sized source count, then everything runs on the
# bounded source list.

_CB_BETA = "0.999e0"


def _cb_weights_sql() -> str:
    bn = f"floor(exp(n * ln({_CB_BETA})) * 1e9 + 0.5) / 1e9"
    inv = "floor((1e0 / eff_n) * 1e9 + 0.5) / 1e9"
    wsum = _mx_exact_sum("invw", 9)
    return f"""
WITH src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY source
),
eff AS (
    SELECT source, n,
           floor(((1e0 - {bn}) / (1e0 - {_CB_BETA})) * 1e6 + 0.5) / 1e6
               AS eff_n
    FROM src
),
iw AS (SELECT source, n, eff_n, {inv} AS invw FROM eff),
tot AS (SELECT {wsum} AS tw FROM iw)
SELECT i.source, i.n AS n_docs, i.eff_n,
       floor((i.invw / t.tw) * 1e6 + 0.5) / 1e6 AS cb_weight
FROM iw i CROSS JOIN tot t
ORDER BY i.source
"""


@register("mixture_class_balanced_weights", oracle=_cb_weights_sql())
def mixture_class_balanced_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source class-balanced weights via the effective number of
    samples E_n = (1-beta^n)/(1-beta), beta = 0.999 — saturating
    re-balancing that neither over-corrects tiny sources (raw inverse
    frequency) nor ignores them (proportional)."""
    load_scaled(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_cb_weights_sql())


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (leakage-controlled categorical features)
# ---------------------------------------------------------------------------
# The feature-engineering staple the naive version silently breaks: a
# per-category target mean computed over ALL rows leaks each row's own
# label into its feature (training metrics inflate, deployment drops).
# The K-fold fix encodes every row with the mean of the OTHER folds:
# oof_mean(brand, fold) = (sum_brand - sum_fold) / (n_brand - n_fold) —
# total-minus-fold moment subtraction, the same exact-arithmetic trick
# as mlstats_cv_ols_r2, so the whole encoding costs ONE group-by at any
# scale (never a per-fold rescan). Folds are hash-seeded on the order
# key (deterministic, engine-portable); the target is the lineitem
# extended price in exact cents.

_TE_FOLDS = 5


def _te_sql(hash28, str_t: str, modfn: str) -> str:
    key = hash28(f"concat('te', CAST(l_orderkey AS {str_t}))")
    return f"""
WITH rows_f AS (
    SELECT p.p_brand AS brand,
           {modfn}({key}, {_TE_FOLDS}) AS fold,
           CAST(floor(l.l_extendedprice * 1e2 + 0.5) AS BIGINT) AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_fold AS (
    SELECT brand, fold,
           CAST(count(*) AS BIGINT) AS n_f,
           CAST(sum(cents) AS BIGINT) AS s_f
    FROM rows_f GROUP BY brand, fold
),
per_brand AS (
    SELECT brand,
           CAST(sum(n_f) AS BIGINT) AS n,
           CAST(sum(s_f) AS BIGINT) AS s
    FROM per_fold GROUP BY brand
)
SELECT f.brand, CAST(f.fold AS INT) AS fold, f.n_f AS n_fold,
       floor((CAST(b.s - f.s_f AS DOUBLE) / (b.n - f.n_f) / 1e2)
             * 1e4 + 0.5) / 1e4 AS oof_mean,
       floor((CAST(b.s AS DOUBLE) / b.n / 1e2) * 1e4 + 0.5) / 1e4
           AS naive_mean
FROM per_fold f JOIN per_brand b ON b.brand = f.brand
ORDER BY f.brand, f.fold
"""


@register(
    "feature_target_encode_oof",
    oracle=_te_sql(duck_hash28, "VARCHAR", "mod"),
)
def feature_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold out-of-fold target encoding of brand against lineitem
    price: per (brand, fold) the leakage-free encoding value from
    total-minus-fold exact moment subtraction, next to the naive
    (leaky) all-rows mean."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_te_sql(spark_hash28, "STRING", "pmod"))


# ---------------------------------------------------------------------------
# Weight-of-Evidence / Information Value feature screen
# ---------------------------------------------------------------------------
# The credit-scoring standard for "does this feature separate the
# classes, and monotonically?": bucket the feature, and per bucket b
# report WOE_b = ln(share of positives in b / share of negatives in b)
# and the IV term (p_b − q_b)·WOE_b; IV > 0.3 = strong predictor,
# < 0.02 = useless. Here: user activity (event count) quintiles vs
# conversion (any purchase). Complements feature_target_encode_oof —
# target encoding FITS a feature, WOE/IV decides whether to keep it.
#
# Buckets read off the DISTINCT-VALUE CDF with integer ceil-division
# (the repo's ntile replacement — no corpus-sized window). Zero-cell
# buckets (no positives or no negatives) get NULL WOE and drop from
# the IV sum (the standard convention; a Laplace prior would bias the
# screen). Shares are ratios of exact integers; ln is the single float
# per row, snapped; the IV total exact-sums the snapped terms over the
# bounded bucket relation. Scale: one user_id aggregation; everything
# after runs on ≤5 bucket rows.


def _woe_sql(idiv: str) -> str:
    div = idiv.format(a="5 * c.cum + t.n - 1", b="t.n")
    return f"""
WITH per_user AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS INT) AS converted
    FROM events GROUP BY user_id
),
cdf AS (
    SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
    FROM (SELECT n_events AS v, CAST(count(*) AS BIGINT) AS c
          FROM per_user GROUP BY n_events)
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_user),
bucketed AS (
    SELECT u.user_id, u.converted,
           CAST({div} AS INT) AS bucket
    FROM per_user u
    JOIN cdf c ON c.v = u.n_events
    CROSS JOIN tot t
),
cells AS (
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_good,
           CAST(sum(1 - converted) AS BIGINT) AS n_bad
    FROM bucketed GROUP BY bucket
),
totals AS (
    SELECT CAST(sum(n_good) AS BIGINT) AS g_tot,
           CAST(sum(n_bad) AS BIGINT) AS b_tot
    FROM cells
),
woe AS (
    SELECT c.bucket, c.n_users, c.n_good, c.n_bad,
           CASE WHEN c.n_good > 0 AND c.n_bad > 0
                THEN floor(ln((CAST(c.n_good AS DOUBLE) / t.g_tot)
                              / (CAST(c.n_bad AS DOUBLE) / t.b_tot))
                           * 1e6 + 0.5) / 1e6
           END AS woe
    FROM cells c CROSS JOIN totals t
),
terms AS (
    SELECT w.bucket, w.n_users, w.n_good, w.n_bad, w.woe,
           CASE WHEN w.woe IS NOT NULL
                THEN floor((CAST(w.n_good AS DOUBLE) / t.g_tot
                            - CAST(w.n_bad AS DOUBLE) / t.b_tot) * w.woe
                           * 1e6 + 0.5) / 1e6
           END AS iv_term
    FROM woe w CROSS JOIN totals t
)
SELECT bucket, n_users, n_good, n_bad, woe, iv_term,
       CAST(sum(CAST(floor(coalesce(iv_term, 0e0) * 1e6 + 0.5) AS BIGINT))
                OVER () AS DOUBLE) / 1e6 AS iv_total
FROM terms
ORDER BY bucket
"""


@register("feature_woe_iv", oracle=_woe_sql("({a}) // ({b})"))
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence per activity quintile + the Information Value
    of user activity as a conversion predictor — the keep/drop feature
    screen; quintiles off the distinct-value CDF, zero-cell buckets
    excluded from IV by the standard convention."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_woe_sql("({a}) DIV ({b})"))


# ---------------------------------------------------------------------------
# Feature-hashing collision audit (the hashing trick's QA gate)
# ---------------------------------------------------------------------------
# Before shipping hashed features (the standard vocabulary-free
# featurization at 100 TB: bucket = hash(term) % B), the pipeline
# should measure what the chosen width B costs: how many buckets are
# actually used vs the birthday-expected count, the worst bucket's
# pile-up, and — the number that matters for model quality — the
# share of token OCCURRENCES that share a bucket with a different
# term (weighted collision mass). All from one vocabulary-sized
# aggregation over the shared sha hash, so the oracle checks the
# exact same assignment a production featurizer would use.

_HASH_B = 4096


def _feat_hash_sql(hash60: str, mod: str) -> str:
    return f"""
WITH terms AS (
    SELECT w AS term, CAST(count(*) AS BIGINT) AS occ
    FROM (SELECT {{extract}} AS ws FROM documents){{unnest}}
    GROUP BY w
),
hashed AS (
    SELECT term, occ, {mod.format(x=hash60, b=_HASH_B)} AS bucket
    FROM terms
),
per_bucket AS (
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(occ) AS BIGINT) AS occ
    FROM hashed GROUP BY bucket
),
agg AS (
    SELECT CAST(sum(n_terms) AS BIGINT) AS vocab,
           CAST(count(*) AS BIGINT) AS used,
           CAST(max(n_terms) AS BIGINT) AS max_terms,
           CAST(sum(occ) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN n_terms >= 2 THEN occ ELSE 0 END)
                AS BIGINT) AS colliding_occ,
           CAST(sum(CASE WHEN n_terms >= 2 THEN n_terms ELSE 0 END)
                AS BIGINT) AS colliding_terms
    FROM per_bucket
)
SELECT vocab, CAST({_HASH_B} AS BIGINT) AS n_buckets, used AS buckets_used,
       floor({_HASH_B} * (1e0 - power(1e0 - 1e0 / {_HASH_B},
                                      CAST(vocab AS DOUBLE)))
             * 1e2 + 0.5) / 1e2 AS expected_buckets_used,
       max_terms AS max_terms_per_bucket,
       colliding_terms,
       floor(CAST(colliding_terms AS DOUBLE) / vocab * 1e6 + 0.5) / 1e6
           AS colliding_term_share,
       floor(CAST(colliding_occ AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6
           AS colliding_occurrence_share
FROM agg
"""


_FEAT_HASH_SPARK = _feat_hash_sql(
    spark_hash60("concat('fh', term)"), "pmod({x}, {b})"
).format(
    extract="regexp_extract_all(text, '[a-z]+', 0)",
    unnest=" LATERAL VIEW explode(ws) t AS w",
)

_FEAT_HASH_DUCK = _feat_hash_sql(
    duck_hash60("concat('fh', term)"), "({x}) % {b}"
).format(
    extract="regexp_extract_all(text, '[a-z]+')",
    unnest=", UNNEST(ws) AS t(w)",
)


@register("feature_hashing_collisions", oracle=_FEAT_HASH_DUCK)
def feature_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision audit of 4096-bucket feature hashing over the corpus
    vocabulary: used vs birthday-expected buckets, worst pile-up, and
    the occurrence-weighted collision mass — from the shared sha
    assignment a production featurizer would reuse."""
    return _docs_sql(spark, sf_dir, _FEAT_HASH_SPARK, scaled=True)


# ---------------------------------------------------------------------------
# Neyman optimal stratified allocation
# ---------------------------------------------------------------------------
# sample_stratified_deterministic draws PROPORTIONALLY; the optimal
# design for estimating a mean allocates n_h proportional to N_h*S_h
# (Neyman 1934) — high-variance strata get oversampled. Computes the
# allocation of a 10,000-row budget across event-type strata from
# exact cents moments, with the integer split by largest-remainder
# rounding (floor everyone, hand the leftover units to the largest
# fractional parts — deterministic tie-break on stratum name), and
# reports the design-effect gain over proportional allocation.
#
# Shape: one corpus pass for per-stratum moments; the allocation
# algebra (shares, remainders, rank) runs on the 5-row stratum
# relation via a bounded self-join rank, never a window.

_NEYMAN_BUDGET = 10_000


def _neyman_sql() -> str:
    return f"""
WITH mom AS (
    SELECT event_type AS stratum,
           CAST(count(*) AS BIGINT) AS nh,
           CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))
                AS BIGINT) AS s,
           CAST(sum(CAST(CAST(floor(value * 1e2 + 0.5) AS BIGINT)
                         AS DECIMAL(38,0))
                    * CAST(floor(value * 1e2 + 0.5) AS BIGINT))
                AS DECIMAL(38,0)) AS ss
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
),
sd AS (
    SELECT stratum, nh,
           sqrt((CAST(nh AS DOUBLE) * CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(nh AS DOUBLE) * (nh - 1))) / 1e2 AS sh
    FROM mom WHERE nh >= 2
),
wt AS (
    -- w = N_h*S_h snapped to exact integer micro-units BEFORE summing:
    -- wsum is then an order-independent BIGINT sum and every share /
    -- floor downstream divides the SAME two integers on both engines
    -- (the snap-before-threshold invariant; an unsnapped float wsum is
    -- partial-aggregation-order dependent).
    SELECT stratum, nh, sh,
           CAST(floor(CAST(nh AS DOUBLE) * sh * 1e6 + 0.5) AS BIGINT)
               AS w6
    FROM sd
),
tot AS (
    SELECT CAST(sum(w6) AS BIGINT) AS wsum6,
           CAST(sum(nh) AS BIGINT) AS n_total
    FROM wt
),
frac AS (
    SELECT w.stratum, w.nh, w.sh,
           floor(CAST(w.w6 AS DOUBLE) / t.wsum6 * 1e6 + 0.5) / 1e6
               AS neyman_share,
           CAST(floor({_NEYMAN_BUDGET} * CAST(w.w6 AS DOUBLE) / t.wsum6)
                AS BIGINT) AS alloc_floor,
           floor(({_NEYMAN_BUDGET} * CAST(w.w6 AS DOUBLE) / t.wsum6
                  - floor({_NEYMAN_BUDGET} * CAST(w.w6 AS DOUBLE)
                          / t.wsum6))
                 * 1e6 + 0.5) / 1e6 AS rem,
           floor(CAST(w.nh AS DOUBLE) / t.n_total * 1e6 + 0.5) / 1e6
               AS prop_share
    FROM wt w CROSS JOIN tot t
),
leftover AS (
    SELECT CAST({_NEYMAN_BUDGET} - sum(alloc_floor) AS BIGINT) AS extra
    FROM frac
),
ranked AS (
    SELECT a.stratum,
           CAST(count(*) AS BIGINT) AS rem_rank
    FROM frac a JOIN frac b
      ON b.rem > a.rem OR (b.rem = a.rem AND b.stratum <= a.stratum)
    GROUP BY a.stratum
)
SELECT f.stratum, f.nh AS n_population,
       floor(f.sh * 1e6 + 0.5) / 1e6 AS stratum_sd,
       f.neyman_share, f.prop_share,
       f.alloc_floor + CASE WHEN r.rem_rank <= l.extra THEN 1 ELSE 0 END
           AS n_allocated,
       CAST(CASE WHEN f.neyman_share > f.prop_share
                 THEN 1 ELSE 0 END AS BIGINT) AS oversampled
FROM frac f
JOIN ranked r ON r.stratum = f.stratum
CROSS JOIN leftover l
ORDER BY f.stratum
"""


@register("sample_neyman_allocation", oracle=_neyman_sql())
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 10k sample budget across
    event-type strata (n_h proportional to N_h*S_h from exact cents
    moments), integer-split by largest-remainder rounding with
    deterministic tie-breaks, vs the proportional design."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_neyman_sql())


# ---------------------------------------------------------------------------
# Length-bucketed dynamic-batching padding waste (round 11)
# ---------------------------------------------------------------------------
# pack_sequences_chunked is the PRE-TRAINING loader (concat-and-chunk,
# zero padding); fine-tuning loaders keep document boundaries and pay
# PADDING instead — the standard mitigation is length-bucketed batching
# with dynamic padding to the batch max. This query builds that batch
# plan and reports the padding bill per length bucket: docs sort into
# 64-token-granular buckets, batches of 8 form within (bucket,
# id-sub-bucket) by descending length (near-homogeneous batches), and
# each batch pads to ITS OWN max. The waste ratio per bucket is the
# number a loader review reads before choosing bucket granularity.
#
# Scale: one corpus pass to token counts; the row_number window is
# partitioned by (len_bucket, doc_id DIV 4096) — every partition is
# ≤ 4096 rows no matter the corpus size (the shard-packing idiom;
# batching a real export runs per file anyway). Output is bounded by
# the number of length buckets. All arithmetic is exact integers until
# the single snapped waste division.

_BATCH_SIZE = 8
_BUCKET_GRAN = 64
_BATCH_SUB = 4_096


def _padding_waste_sql(n_tok: str, idiv) -> str:
    return f"""
WITH base AS (
    SELECT doc_id, n_tok FROM (
        SELECT doc_id, CAST({n_tok} AS BIGINT) AS n_tok FROM documents
    ) b WHERE n_tok > 0
),
bucketed AS (
    SELECT doc_id, n_tok,
           CAST({idiv(f'n_tok + {_BUCKET_GRAN - 1}', _BUCKET_GRAN)}
                * {_BUCKET_GRAN} AS BIGINT) AS len_bucket,
           CAST({idiv('doc_id', _BATCH_SUB)} AS BIGINT) AS sub
    FROM base
),
seqd AS (
    SELECT len_bucket, sub, n_tok,
           CAST({idiv('''row_number() OVER (
                   PARTITION BY len_bucket, sub
                   ORDER BY n_tok DESC, doc_id) - 1''', _BATCH_SIZE)}
                AS BIGINT) AS batch_id
    FROM bucketed
),
batches AS (
    SELECT len_bucket, sub, batch_id,
           CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(max(n_tok) AS BIGINT) AS pad_to,
           CAST(sum(n_tok) AS BIGINT) AS real_tok
    FROM seqd GROUP BY len_bucket, sub, batch_id
)
SELECT len_bucket,
       CAST(sum(n_seqs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(n_seqs * pad_to) AS BIGINT) AS padded_tokens,
       CAST(sum(real_tok) AS BIGINT) AS real_tokens,
       floor((1e0 - CAST(sum(real_tok) AS DOUBLE)
              / CAST(sum(n_seqs * pad_to) AS DOUBLE)) * 1e6 + 0.5) / 1e6
           AS padding_waste
FROM batches
GROUP BY len_bucket
ORDER BY len_bucket
"""


@register(
    "training_batch_padding_waste",
    oracle=_padding_waste_sql(
        f"len({_D_TOK})", lambda a, b: f"(({a}) // ({b}))"
    ),
)
def training_batch_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic-batching plan + per-bucket padding bill:
    batches of 8 within 64-token buckets (descending length), each
    padded to its own max — the fine-tuning loader's waste report
    beside pack_sequences_chunked's zero-padding pre-training path.

    Windows are (bucket, id-sub-bucket)-partitioned (≤ 4096 rows each);
    output is bucket-count-bounded."""
    return _docs_sql(
        spark,
        sf_dir,
        _padding_waste_sql(
            f"size({_S_TOK})", lambda a, b: f"(({a}) div ({b}))"
        ),
    )
