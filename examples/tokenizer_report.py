"""Tokenizer/LM pre-training corpus report.

The statistics an LM team reviews before committing a corpus to
tokenizer training, composed from the catalog's LM-construction
operators (``queries/lm.py``) in one session:

1. Zipf power-law fit — is the term distribution natural-language-like?
2. Bigram conditional entropy — which prefixes are boilerplate?
3. BPE merge candidates — the first tokenizer-training iteration.
4. Substring-window duplication — verbatim cross-document overlap that
   inflates any of the above.
5. PMI collocations — multi-word units a tokenizer may want intact.

Each section prints a compact table; the return value maps section →
DataFrame so a job DAG can persist them as parquet instead.

Run: ``python examples/tokenizer_report.py [sf_dir]``
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from automated_data_pipeline_python_spark.queries.lm import (  # noqa: E402
    bpe_pair_merge_counts,
    dedup_substring_windows,
    lm_bigram_entropy,
    text_token_pmi,
    text_zipf_slope,
)

SECTIONS = {
    "zipf_fit": text_zipf_slope,
    "bigram_entropy": lm_bigram_entropy,
    "bpe_merge_candidates": bpe_pair_merge_counts,
    "substring_duplication": dedup_substring_windows,
    "pmi_collocations": text_token_pmi,
}


def run_report(spark, sf_dir: str) -> dict:
    """Build every section; cheap to fan out — all five scan the same
    documents table and are pure Catalyst plans."""
    out = {}
    for name, fn in SECTIONS.items():
        out[name] = fn(spark, sf_dir)
    return out


def main() -> None:
    from automated_data_pipeline_python_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="tokenizer-report")
    spark.sparkContext.setLogLevel("ERROR")

    report = run_report(spark, sf_dir)
    slope = report["zipf_fit"].collect()[0]
    print(f"\n== Zipf fit: slope={slope.zipf_slope} over {slope.n_ranks} ranks "
          "(natural text ~ -1)")
    print("\n== Top bigram prefixes (low entropy == boilerplate):")
    report["bigram_entropy"].show(10, truncate=False)
    print("== First BPE merge candidates:")
    report["bpe_merge_candidates"].show(10, truncate=False)
    print("== Most-duplicated documents (window overlap):")
    report["substring_duplication"].orderBy(
        "dup_fraction", ascending=False
    ).show(10, truncate=False)
    print("== Strongest collocations (PMI):")
    report["pmi_collocations"].show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
