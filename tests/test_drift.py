"""Information-theoretic invariants of the drift/dependency monitors.

The DuckDB oracles prove cross-engine value parity; these pin the
MATH — properties that hold for any corpus, so a regression that
breaks both engines identically (and therefore slips the oracle
gate) still fails here.
"""

from __future__ import annotations

from automated_data_pipeline_python_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_kl_divergence_is_nonnegative(spark):
    """KL(P‖Q) ≥ 0 (Gibbs), for every source."""
    rows = QUERIES["corpus_source_kl_divergence"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.kl_nats >= 0, r
        assert r.vocab <= r.n_tokens, r


def test_psi_terms_are_nonnegative(spark):
    """(p−q)·ln(p/q) ≥ 0 for every bucket — both factors share sign."""
    rows = QUERIES["events_psi_value_drift"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.psi_term >= 0, r
        assert 0 < r.p_early < 1 and 0 < r.p_late < 1, r


def test_mutual_information_bounds(spark):
    """0 ≤ MI ≤ min(H(X), H(Y)); NMI within [0, 1] up to snap grain."""
    rows = QUERIES["dq_mutual_information"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.mi_nats >= -1e-6, r
        assert r.mi_nats <= min(r.h_x, r.h_y) + 1e-6, r
        assert -1e-6 <= r.nmi <= 1 + 1e-6, r


def test_lang_confusion_recall_shares_sum_to_one(spark):
    """Per actual language, recall shares across predictions sum to 1."""
    rows = QUERIES["lang_id_confusion"].fn(spark, SF_SMOKE).collect()
    by_actual: dict[str, float] = {}
    for r in rows:
        by_actual[r.actual_lang] = by_actual.get(r.actual_lang, 0.0) + r.recall_share
    assert by_actual
    for lang, total in by_actual.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)


def test_benford_shares_sum_to_one(spark):
    rows = QUERIES["dq_benford_first_digit"].fn(spark, SF_SMOKE).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-3
