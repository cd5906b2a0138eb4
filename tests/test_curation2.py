"""Model-scored curation invariants (quality gate + surprisal buckets).

Cross-engine value equality is the driver/oracle's job; these pin the
semantic properties a pipeline depends on: the gate actually splits the
corpus, scores are probabilities, buckets are balanced quartiles.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_quality_gate_splits_corpus(spark):
    rows = QUERIES["quality_logistic_filter"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    kept = [r for r in rows if r.kept]
    dropped = [r for r in rows if not r.kept]
    assert kept and dropped, "gate must produce both classes"
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        assert (r.score >= 0.5) == r.kept
        assert 0.0 < r.uniq_ratio <= 1.0
        assert 0.0 <= r.stop_ratio < 1.0


def test_surprisal_buckets_are_balanced_quartiles(spark):
    rows = QUERIES["doc_unigram_surprisal"].fn(spark, SF_SMOKE).collect()
    n = len(rows)
    assert n > 0
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.ppl_bucket, []).append(r.mean_surprisal)
    assert set(by_bucket) == {1, 2, 3, 4}
    sizes = [len(v) for _, v in sorted(by_bucket.items())]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    # buckets are ordered by surprisal: every bucket-k value <= bucket-k+1 max
    for k in (1, 2, 3):
        assert max(by_bucket[k]) <= min(by_bucket[k + 1]) + 1e-9
    for r in rows:
        assert r.mean_surprisal > 0  # -ln p of a non-trivial vocab
