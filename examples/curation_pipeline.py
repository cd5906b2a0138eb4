"""End-to-end LLM training-data curation: the engine's operators composed.

The pipeline a 100 TB pre-training corpus actually runs, at test scale:

1. GATE      model-scored quality filtering (logistic gate, map-only)
2. DEDUP     exact (normalized content hash) then fuzzy (MinHash+LSH)
3. DECONTAM  n-gram overlap against a held-out benchmark slice
4. MIX       per-source token budgets (deterministic hash walk)
5. EXPORT    reproducible shuffle into training shards

Every stage is a catalog operator with a DuckDB oracle; this script
chains their building blocks over the same testdata tables and prints
the funnel. Run: ``python examples/curation_pipeline.py [sf_dir]``.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from automated_data_pipeline_python_spark.queries import QUERIES
from automated_data_pipeline_python_spark.queries.curation2 import quality_gate
from automated_data_pipeline_python_spark.session import get_spark
from automated_data_pipeline_python_spark.tables import load_scaled


def run(spark, sf_dir: str) -> dict:
    docs = load_scaled(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. GATE — keep docs the quality model accepts
    kept = quality_gate(docs).filter("kept").select("doc_id")
    gated = docs.join(kept, "doc_id")
    n_gated = gated.count()

    # 2. DEDUP — drop exact dups (keep canonical), then fuzzy pairs
    exact = QUERIES["dedup_exact_documents"].fn(spark, sf_dir)
    canonical = exact.select(F.col("canonical_id").alias("doc_id"))
    deduped = gated.join(canonical, "doc_id")
    n_exact = deduped.count()

    fuzzy_pairs = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir)
    fuzzy_drop = fuzzy_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    deduped = deduped.join(fuzzy_drop, "doc_id", "left_anti")
    n_fuzzy = deduped.count()

    # 3. DECONTAM — drop docs overlapping the benchmark slice
    contam = QUERIES["contamination_ngram_overlap"].fn(spark, sf_dir)
    dirty = contam.filter("contamination_ratio >= 0.5").select("doc_id")
    clean = deduped.join(dirty, "doc_id", "left_anti")
    n_clean = clean.count()

    # 4. MIX — enforce per-source token budgets
    budget = QUERIES["sample_token_budget"].fn(spark, sf_dir).select("doc_id")
    mixed = clean.join(budget, "doc_id")
    n_mixed = mixed.count()

    # 5. EXPORT — reproducible shuffle into shards
    shards = QUERIES["corpus_shuffle_shards"].fn(spark, sf_dir)
    final = mixed.join(shards, "doc_id").select("doc_id", "shard", "pos")
    per_shard = final.groupBy("shard").count().orderBy("shard").collect()

    return {
        "raw": n_raw,
        "after_gate": n_gated,
        "after_exact_dedup": n_exact,
        "after_fuzzy_dedup": n_fuzzy,
        "after_decontam": n_clean,
        "after_token_budget": n_mixed,
        "shards": {r["shard"]: r["count"] for r in per_shard},
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-pipeline")
    funnel = run(spark, sf_dir)
    shards = funnel.pop("shards")
    for stage, n in funnel.items():
        print(f"  {stage:>20}: {n}")
    print(f"  {'shard sizes':>20}: {shards}")
    spark.stop()
