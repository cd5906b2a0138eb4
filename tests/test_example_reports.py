"""Composed-report regression pins (VERDICT r8 task 8).

The five example reports chain oracle-green catalog operators; pinning
their section values at sf0.01 turns them into integration canaries: a
change to any shared SQL constant (thresholds, snap grids, hash
parameters) that shifts results shows up here as a concrete number
moving, even if both engines shift together (which oracle parity cannot
see).

The pins are corpus-dependent, and the driver regenerates the testdata
parquet between rounds — so every pinned test is gated on a cheap
corpus fingerprint. Fingerprint mismatch = the corpus changed, not the
code: the test skips with a re-pin instruction instead of failing.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_CORRECT

# Fingerprint of the sf0.01 corpus these pins were computed against
# (round 9). Recompute via the expression in _fingerprint() and re-pin
# the section values below whenever the driver regenerates testdata.
def _fingerprint() -> tuple:
    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT (SELECT count(*) FROM '{SF_CORRECT}/documents.parquet'),
               (SELECT count(*) FROM '{SF_CORRECT}/events.parquet'),
               (SELECT CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))
                       AS BIGINT) FROM '{SF_CORRECT}/events.parquet'
                WHERE value IS NOT NULL),
               (SELECT count(*) FROM '{SF_CORRECT}/orders.parquet')
        """
    ).fetchone()
    con.close()
    return row


_EXPECTED_FINGERPRINT = (500, 10000, 49630657, 15000)


def _require_pinned_corpus():
    got = _fingerprint()
    if got != _EXPECTED_FINGERPRINT:
        pytest.skip(
            f"sf0.01 corpus regenerated (fingerprint {got} != pinned "
            f"{_EXPECTED_FINGERPRINT}) — recompute the section pins in "
            f"tests/test_example_reports.py"
        )


def test_corpus_pipeline_funnel_pinned(spark, tmp_path):
    _require_pinned_corpus()
    from examples.corpus_pipeline import run_pipeline

    report = run_pipeline(spark, str(tmp_path), SF_CORRECT)
    assert report == {
        "bronze": 500,
        "quality_gate": 457,
        "exact_dedup": 457,
        "near_dedup": 434,
        "decontaminated": 433,
        "sampled": 122,
        "packed_sequences": 541,
    }


def test_drift_monitor_sections_pinned(spark):
    _require_pinned_corpus()
    from examples.drift_monitor import run

    report = run(spark, SF_CORRECT)
    got = {k: (v["rows"], v["alarms"]) for k, v in report.items()}
    assert got == {
        "vocab_drift": (20, 0),
        "value_drift": (10, 0),
        "shape_drift": (1, 0),
        "shape_drift_w1": (1, 1),
        "mean_drift": (150, 1),
        "vector_drift": (10, 10),
        "outliers": (150, 0),
        "changepoint": (1, 0),
        "error_budget": (30, 0),
        "integrity": (9, 4),
        "dependency": (3, 0),
        "filter_health": (4, 0),
    }


def test_tokenizer_report_sections_pinned(spark):
    _require_pinned_corpus()
    from examples.tokenizer_report import run_report

    report = run_report(spark, SF_CORRECT)
    zipf = report["zipf_fit"].collect()[0]
    assert (zipf.n_ranks, zipf.zipf_slope) == (31, -0.182505)
    assert report["bigram_entropy"].count() == 31
    bpe = report["bpe_merge_candidates"].collect()
    assert len(bpe) == 20
    assert (bpe[0].pair, bpe[0].pair_count) == ("er", 4568)
    assert report["substring_duplication"].count() == 500
    pmi = report["pmi_collocations"].collect()
    assert len(pmi) == 50
    assert (pmi[0].t1, pmi[0].t2, pmi[0].co_docs, pmi[0].pmi) == (
        "column", "dup", 21, 0.089612,
    )


def test_experiment_report_sections_pinned(spark):
    _require_pinned_corpus()
    from examples.experiment_report import run

    report = run(spark, SF_CORRECT)
    assert report["lift"] == {"lift_abs": 0.015478, "z": 0.1901}
    assert report["power"][0.02] == 46070
    assert report["power"][0.1] == 1843
    assert report["sprt"] == {"n_days": 30, "final_decision": "accept_h0"}
    assert report["fdr"] == {"n_tests": 24, "n_rejected": 0}
    assert report["ipw"] == {
        "naive_diff": -0.219017,
        "ipw_ate": -0.227735,
        "strata": (4, 5),
    }
    assert report["did"] == {"did": -2.856184, "placebo": -4.535621}
    assert report["qini"] == {"n_deciles": 10, "final_qini": 4.634146}
    assert report["effect"] == {"cohens_d": 0.091549, "hedges_g": 0.091514}
    assert report["its"] == {"level_change": 778.411524,
                             "slope_change": -60.22375}


def test_multimodal_pipeline_sections_pinned(spark):
    _require_pinned_corpus()
    from examples.multimodal_pipeline import run

    report = run(spark, SF_CORRECT)
    assert report["card"] == {
        "audio": (125, 36586),
        "image": (125, 39239),
        "text": (125, 35735),
        "video": (125, 37614),
    }
    assert report["dq"] == {"groups": 3, "outliers": 43, "clips": 500}
    assert report["plan"] == {
        "frame_rows": 4000,
        "audio_rows": 2110,
        "resize_rows": 1500,
    }
    assert report["dedup"] == {
        "corpus_frames": 4000,
        "corpus_distinct": 3884,
        "dup_rate": 0.029,
    }
    assert report["segment"] == {
        "clips": 500,
        "scenes": 3856,
        "utterances": 684,
        "voiced_ms": 56272,
    }
    assert report["export"] == {
        "text": 1, "video": 1, "audio": 1, "image": 1,
    }


# ---------------------------------------------------------------------------
# sf0.1 scale pins (VERDICT r9 task 6): the sf0.01 pins above catch
# constant drift; these catch SCALE-dependent breakage in the composed
# reports (SF-sensitive thresholds, overflow at 10x row counts, plans
# that only work on small inputs). One pinned run per example at
# /root/testdata/sf0.1, gated on its own corpus fingerprint.
# ---------------------------------------------------------------------------

SF_SCALE = "/root/testdata/sf0.1"


def _fingerprint_sf01() -> tuple:
    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT (SELECT count(*) FROM '{SF_SCALE}/documents.parquet'),
               (SELECT count(*) FROM '{SF_SCALE}/events.parquet'),
               (SELECT CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))
                       AS BIGINT) FROM '{SF_SCALE}/events.parquet'
                WHERE value IS NOT NULL),
               (SELECT count(*) FROM '{SF_SCALE}/orders.parquet')
        """
    ).fetchone()
    con.close()
    return row


_EXPECTED_FINGERPRINT_SF01 = (5000, 100000, 498683083, 150000)


def _require_pinned_corpus_sf01():
    got = _fingerprint_sf01()
    if got != _EXPECTED_FINGERPRINT_SF01:
        pytest.skip(
            f"sf0.1 corpus regenerated (fingerprint {got} != pinned "
            f"{_EXPECTED_FINGERPRINT_SF01}) — recompute the sf0.1 pins "
            f"in tests/test_example_reports.py"
        )


def test_curation_pipeline_funnel_pinned_sf01(spark):
    _require_pinned_corpus_sf01()
    from examples.curation_pipeline import run

    report = run(spark, SF_SCALE)
    shards = report.pop("shards")
    assert report == {
        "raw": 5000,
        "after_gate": 1005,
        "after_exact_dedup": 1004,
        "after_fuzzy_dedup": 948,
        "after_decontam": 747,
        "after_token_budget": 112,
    }
    assert sum(shards.values()) == 112 and len(shards) == 8


def test_drift_monitor_sections_pinned_sf01(spark):
    _require_pinned_corpus_sf01()
    from examples.drift_monitor import run

    report = run(spark, SF_SCALE)
    got = {k: (v["rows"], v["alarms"]) for k, v in report.items()}
    assert got == {
        "vocab_drift": (20, 0),
        "value_drift": (10, 0),
        "shape_drift": (1, 0),
        "shape_drift_w1": (1, 0),
        "mean_drift": (150, 0),
        "vector_drift": (10, 10),
        "outliers": (150, 2),
        "changepoint": (1, 0),
        "error_budget": (30, 0),
        "integrity": (9, 4),
        "dependency": (3, 0),
        "filter_health": (4, 0),
    }


def test_experiment_report_sections_pinned_sf01(spark):
    _require_pinned_corpus_sf01()
    from examples.experiment_report import run

    report = run(spark, SF_SCALE)
    assert report["lift"] == {"lift_abs": -0.048958, "z": -1.9009}
    assert report["power"] == {0.02: 45213, 0.05: 7235, 0.1: 1809}
    assert report["sprt"] == {"n_days": 30, "final_decision": "accept_h1"}
    assert report["fdr"] == {"n_tests": 24, "n_rejected": 1}
    assert report["ipw"] == {
        "naive_diff": 0.011669,
        "ipw_ate": 0.011018,
        "strata": (6, 6),
    }
    assert report["did"] == {"did": 2.127535, "placebo": -3.617045}
    assert report["qini"] == {"n_deciles": 10, "final_qini": 29.269076}
    assert report["effect"] == {"cohens_d": -0.003145,
                                "hedges_g": -0.003145}
    assert report["its"] == {"level_change": -6012.604107,
                             "slope_change": 78.57525}


def test_multimodal_pipeline_sections_pinned_sf01(spark):
    _require_pinned_corpus_sf01()
    from examples.multimodal_pipeline import run

    report = run(spark, SF_SCALE)
    assert report["card"] == {
        "audio": (1250, 366832),
        "image": (1250, 378961),
        "text": (1250, 378036),
        "video": (1250, 361747),
    }
    assert report["dq"] == {"groups": 3, "outliers": 524, "clips": 5000}
    assert report["plan"] == {
        "frame_rows": 40000,
        "audio_rows": 21002,
        "resize_rows": 15000,
    }
    assert report["dedup"] == {
        "corpus_frames": 40000,
        "corpus_distinct": 38735,
        "dup_rate": 0.031625,
    }
    assert report["segment"] == {
        "clips": 5000,
        "scenes": 38192,
        "utterances": 6861,
        "voiced_ms": 577627,
    }
    # at 10x items the 4096-id pack buckets split and shards multiply —
    # the two-level layout engaging is exactly the scale behavior to pin
    assert report["export"] == {
        "text": 7, "video": 6, "audio": 6, "image": 7,
    }
