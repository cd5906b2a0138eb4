"""MLlib parity for the fuzzy-dedup LSH (SURVEY §2.8, VERDICT r7 task 8).

SURVEY §2.8 names ``pyspark.ml.feature.MinHashLSH`` as Spark's built-in
primitive for MinHash dedup. The engine instead ships a pure-SQL banded
MinHash (queries/dedup.py): 16 permutations in 4 bands × 4 rows, bucket
GROUPing instead of a hash-table self-join, and exact array_intersect
verification. This test documents WHY by measuring both against exact
Jaccard ground truth on the same corpus:

- recall: both schemes must recover the high-similarity pairs. MLlib's
  ``approxSimilarityJoin`` OR-amplifies over single-hash tables (band
  size 1), so any one colliding minhash makes a candidate — near-1
  recall but candidate volume grows with EVERY pair sharing one hash
  (the full inverse-CDF of the similarity distribution). The banded SQL
  scheme trades boundary-zone recall (P(detect) = 1-(1-J^4)^4, ~23 % AT
  the 0.5 threshold, >97 % at J≥0.9) for bucket-local candidate
  explosion that the default bucket cap bounds (dedup_minhash_lsh,
  capped by default since round 9) — the shape that survives 100 TB
  (BENCH_DEDUP_SCALING.json measures the capped plan flat to 100×
  data; the uncapped diagnostic twin is 37× there).
- precision: the SQL pairs are exact-verified in-plan, so every emitted
  pair must genuinely clear the Jaccard threshold; MLlib verifies too
  (keyDistance on the join output).
- oracle-checkability: the SQL form hashes with the portable
  SHA-derived hash, so DuckDB can replay it bit-for-bit — MLlib's
  JVM-internal hash families cannot be oracle-checked, which is the
  catalog's correctness gate.

Skippable: pyspark.ml needs numpy at import time; guarded like the
other environment-gated tests.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

pytest.importorskip("numpy")
pytest.importorskip("pyspark.ml.feature")


@pytest.fixture(scope="module")
def lsh_corpus(spark):
    """Exact ground truth + both schemes' pairs on sf0.001 documents."""
    from pyspark.sql import functions as F

    from automated_data_pipeline_python_spark.queries import QUERIES
    from automated_data_pipeline_python_spark.queries.dedup import (
        _JACCARD_THRESHOLD,
        _MINHASH_SH_SPARK,
    )
    from automated_data_pipeline_python_spark.tables import load_scaled

    load_scaled(spark, SF_SMOKE, "documents").createOrReplaceTempView(
        "documents"
    )
    sh = spark.sql(_MINHASH_SH_SPARK).localCheckpoint(eager=True)
    sh.createOrReplaceTempView("parity_sh")

    # Exact Jaccard over the shingle inverted index (pairs sharing >=1
    # shingle; disjoint pairs have J=0 and cannot clear the threshold).
    truth_df = spark.sql(f"""
        WITH sizes AS (
            SELECT doc_id, count(*) AS n FROM parity_sh GROUP BY doc_id
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*) AS isect
            FROM parity_sh a
            JOIN parity_sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.doc_a, i.doc_b,
               CAST(i.isect AS DOUBLE) / (na.n + nb.n - i.isect) AS j
        FROM inter i
        JOIN sizes na ON i.doc_a = na.doc_id
        JOIN sizes nb ON i.doc_b = nb.doc_id
        WHERE CAST(i.isect AS DOUBLE) / (na.n + nb.n - i.isect)
              >= {_JACCARD_THRESHOLD}
    """)
    truth = {(r.doc_a, r.doc_b): r.j for r in truth_df.collect()}

    # Headline name = CAPPED plan (round-9 default); uncapped twin kept
    # to measure the cap's recall delta on the same ground truth.
    sql_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
    }
    sql_uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_minhash_lsh_uncapped"]
        .fn(spark, SF_SMOKE)
        .collect()
    }

    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    arrs = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shs"))
    cv = CountVectorizer(
        inputCol="shs", outputCol="features", binary=True, vocabSize=1 << 20
    )
    feats = cv.fit(arrs).transform(arrs).select("doc_id", "features")
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - _JACCARD_THRESHOLD, distCol="dist"
    ).where("datasetA.doc_id < datasetB.doc_id")
    mllib_pairs = {
        (r.a, r.b): 1.0 - r.dist
        for r in joined.select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
            "dist",
        ).collect()
    }
    spark.catalog.dropTempView("parity_sh")
    spark.catalog.dropTempView("documents")
    return truth, sql_pairs, mllib_pairs, sql_uncapped


def test_ground_truth_not_vacuous(lsh_corpus):
    truth, _, _, _ = lsh_corpus
    high = [p for p, j in truth.items() if j >= 0.9]
    assert len(truth) >= 10 and len(high) >= 5


def test_sql_lsh_precision_is_exact(lsh_corpus):
    """Every SQL-emitted pair is exact-verified in-plan: the pair set
    must be a subset of ground truth with matching (snapped) Jaccard."""
    truth, sql_pairs, _, sql_uncapped = lsh_corpus
    assert set(sql_pairs) <= set(truth)
    for p, j in sql_pairs.items():
        assert abs(j - truth[p]) < 1e-6, p
    assert set(sql_uncapped) <= set(truth)


def test_sql_lsh_recall_on_high_similarity(lsh_corpus):
    """The banded scheme's design point: near-total recall where it
    matters (J>=0.9 — actual duplicates), by-construction-lossy at the
    threshold boundary (1-(1-J^4)^4)."""
    truth, sql_pairs, _, _ = lsh_corpus
    high = {p for p, j in truth.items() if j >= 0.9}
    assert len(set(sql_pairs) & high) / len(high) >= 0.9


def test_cap_recall_delta_documented(lsh_corpus):
    """The round-9 cap default's measured cost (VERDICT r8 task 2): on a
    natural (non-adversarial) corpus the capped plan gives up at most a
    small fraction of the uncapped pair set, and NOTHING at J>=0.9 —
    giant buckets hold boilerplate-identical clusters that exact dedup
    owns, not borderline near-dups. On the sf0.001 fixture the two sets
    are identical (no band bucket exceeds the cap of 8)."""
    truth, sql_pairs, _, sql_uncapped = lsh_corpus
    assert set(sql_pairs) <= set(sql_uncapped)  # cap only removes pairs
    high = {p for p, j in truth.items() if j >= 0.9}
    capped_high = set(sql_pairs) & high
    uncapped_high = set(sql_uncapped) & high
    assert capped_high == uncapped_high  # zero recall delta at J>=0.9
    # overall delta bound: the cap may drop at most 10% of pairs here
    if sql_uncapped:
        delta = 1.0 - len(sql_pairs) / len(sql_uncapped)
        assert delta <= 0.10, f"cap recall delta {delta:.3f}"


def test_mllib_recall_comparable_and_design_note(lsh_corpus):
    """MLlib's OR-amplified scheme recalls (near-)everything above the
    threshold — confirming the SQL form gives up only boundary-zone
    candidates, not true duplicates: on J>=0.9 pairs both schemes must
    clear 90 % recall, and MLlib may not beat SQL there by more than a
    single pair per ten (they find the same duplicates; the schemes
    differ in candidate volume and oracle-checkability, not outcome)."""
    truth, sql_pairs, mllib_pairs, _ = lsh_corpus
    high = {p for p, j in truth.items() if j >= 0.9}
    mllib_recall = len(set(mllib_pairs) & high) / len(high)
    sql_recall = len(set(sql_pairs) & high) / len(high)
    assert mllib_recall >= 0.9
    assert sql_recall >= mllib_recall - 0.1
