"""End-to-end training-corpus curation pipeline over the testdata.

The workflow an LLM data team runs as a job DAG, composed from the
engine's catalog operators — bronze (raw) → silver (gated + deduped) →
gold (decontaminated, sampled, packed), each stage a parquet layer:

1. quality + language gates (text.py features, one scan)
2. exact dedup (canonical SHA keep, dedup.py discipline)
3. near-dup removal (MinHash-LSH pairs → connected components → keep
   the cluster canonical)
4. benchmark decontamination (3-gram overlap vs a held-out slice)
5. deterministic stratified sampling (hash-bucket quotas)
6. sequence packing (concat-and-chunk token spans into fixed budgets)

Stage results are written as parquet layers; the run report prints
per-stage document counts (the funnel a pipeline dashboard shows).

Run: ``python examples/corpus_pipeline.py [output_dir] [sf_dir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from automated_data_pipeline_python_spark.operators.clusters import (
    connected_components,
)
from automated_data_pipeline_python_spark.queries.dedup import (
    dedup_minhash_lsh,
)
from automated_data_pipeline_python_spark.queries.training import (
    contamination_ngram_overlap,
    pack_sequences_chunked,
    sample_stratified_deterministic,
)
from automated_data_pipeline_python_spark.session import get_spark
from automated_data_pipeline_python_spark.tables import load

_NORM = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
_MIN_TOKENS = 20
_CONTAM_MAX = 0.5


def run_pipeline(spark, output_dir: str, sf_dir: str) -> dict:
    report: dict[str, int] = {}

    # bronze: raw corpus
    docs = load(spark, sf_dir, "documents")
    report["bronze"] = docs.count()

    # 1) quality gate: min length + non-degenerate token mix
    toks = F.split(F.trim("text"), r"\s+")
    gated = docs.withColumn("n_tokens", F.size(toks)).filter(
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.size(F.array_distinct(toks)) / F.size(toks) >= 0.2)
    )
    report["quality_gate"] = gated.count()

    # 2) exact dedup: keep the lowest doc_id per normalized content hash
    hashed = gated.withColumn("content_hash", F.expr(f"sha2({_NORM}, 256)"))
    canonical = hashed.withColumn(
        "keep",
        F.row_number().over(
            Window.partitionBy("content_hash").orderBy("doc_id")
        )
        == 1,
    ).filter("keep")
    report["exact_dedup"] = canonical.count()

    # 3) near-dup removal: LSH pairs -> components -> keep component root
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    dupes = (
        connected_components(pairs, src="doc_a", dst="doc_b")
        .filter(F.col("component") != F.col("node"))
        .select(F.col("node").alias("doc_id"))
    )
    near_deduped = canonical.join(dupes, "doc_id", "left_anti")
    report["near_dedup"] = near_deduped.count()

    # 4) decontamination: drop docs overlapping the held-out slice
    contaminated = (
        contamination_ngram_overlap(spark, sf_dir)
        .filter(F.col("contamination_ratio") > _CONTAM_MAX)
        .select("doc_id")
    )
    clean = near_deduped.join(contaminated, "doc_id", "left_anti")
    report["decontaminated"] = clean.count()

    # silver layer
    silver = clean.select("doc_id", "lang", "source", "text")
    silver.write.mode("overwrite").parquet(f"{output_dir}/silver_documents")

    # 5) stratified sample (deterministic hash quotas per language)
    sampled = sample_stratified_deterministic(spark, sf_dir).select("doc_id")
    gold_docs = silver.join(sampled, "doc_id", "left_semi")
    report["sampled"] = gold_docs.count()

    # 6) sequence packing over the surviving corpus
    packed = pack_sequences_chunked(spark, sf_dir)
    report["packed_sequences"] = packed.count()
    packed.write.mode("overwrite").parquet(f"{output_dir}/gold_packed")
    gold_docs.write.mode("overwrite").parquet(f"{output_dir}/gold_documents")

    return report


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_pipeline_demo"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-pipeline-demo")
    report = run_pipeline(spark, out, sf)
    for stage, n in report.items():
        print(f"  {stage}: {n}")
    spark.stop()
