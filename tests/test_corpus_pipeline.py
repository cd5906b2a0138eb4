"""End-to-end corpus curation pipeline example (bronze→silver→gold)."""

from __future__ import annotations

from examples.corpus_pipeline import run_pipeline

from tests.conftest import SF_SMOKE


def test_corpus_pipeline_funnel(spark, tmp_path):
    report = run_pipeline(spark, str(tmp_path), SF_SMOKE)
    # Funnel is monotone through the document-dropping stages.
    assert report["bronze"] >= report["quality_gate"] >= report["exact_dedup"]
    assert report["exact_dedup"] >= report["near_dedup"] >= report["decontaminated"]
    assert report["decontaminated"] >= report["sampled"] > 0
    assert report["packed_sequences"] > 0
    # Layers landed.
    silver = spark.read.parquet(str(tmp_path / "silver_documents"))
    assert silver.count() == report["decontaminated"]
    gold = spark.read.parquet(str(tmp_path / "gold_documents"))
    assert gold.count() == report["sampled"]
    assert set(gold.columns) == {"doc_id", "lang", "source", "text"}
