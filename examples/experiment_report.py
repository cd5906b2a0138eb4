"""Experiment-analysis review: the engine's causal/testing family
composed the way a growth team reads an A/B program.

1. RANDOMIZED LIFT   hash-arm conversion lift + two-proportion z
2. POWER             per-arm sample size needed at 2/5/10 % MDE
3. SEQUENTIAL        SPRT accept/continue trajectory (early stopping)
4. MULTIPLICITY      Benjamini-Hochberg screen over hourly tests
5. OBSERVATIONAL     IPW ATE vs the naive diff (confounding measured)
6. PANEL             difference-in-differences + parallel-trends placebo
7. TARGETING         Qini uplift curve over score deciles
8. EFFECT SIZE       Cohen's d / Hedges' g (how big, in portable units)
9. SINGLE SERIES     interrupted time series (no-control-group design)

Every section is a catalog operator with a DuckDB oracle; this script
chains them over the same testdata and prints a one-line verdict per
section. Run: ``python examples/experiment_report.py [sf_dir]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from automated_data_pipeline_python_spark.queries import QUERIES
from automated_data_pipeline_python_spark.session import get_spark


def run(spark, sf_dir: str) -> dict:
    """Run every section and return {section: headline numbers} — the
    same dict tests/test_example_reports.py pins at sf0.01, so this
    composed report doubles as an integration canary when shared SQL
    constants change."""
    report: dict[str, dict] = {}

    def rows(name: str):
        return QUERIES[name].fn(spark, sf_dir).collect()

    lift = rows("events_ab_test_lift")[0].asDict()
    report["lift"] = {"lift_abs": lift["lift_abs"], "z": lift["z_score"]}
    print(f"[lift     ] abs lift {lift.get('lift_abs')} "
          f"(z = {lift.get('z_score')})")

    power = [r.asDict() for r in rows("events_power_analysis")]
    report["power"] = {
        d["rel_mde"]: d["n_per_arm"] for d in power
    }
    for d in power:
        print(f"[power    ] {d}")

    sprt = rows("events_sprt_ab_trajectory")
    last = sprt[-1].asDict() if sprt else {}
    report["sprt"] = {"n_days": len(sprt),
                      "final_decision": last.get("decision")}
    print(f"[sprt     ] {len(sprt)} trajectory rows; final state {last}")

    fdr = rows("events_bh_fdr_screen")
    sig = [r for r in fdr if r.asDict().get("rejected") in (1, True)]
    report["fdr"] = {"n_tests": len(fdr), "n_rejected": len(sig)}
    print(f"[fdr      ] {len(sig)}/{len(fdr)} hourly tests survive BH")

    ipw = rows("events_ipw_ate")[0].asDict()
    report["ipw"] = {"naive_diff": ipw["naive_diff"],
                     "ipw_ate": ipw["ipw_ate"],
                     "strata": (ipw["n_strata_used"], ipw["n_strata"])}
    print(f"[ipw      ] naive {ipw['naive_diff']} vs ATE {ipw['ipw_ate']} "
          f"({ipw['n_strata_used']}/{ipw['n_strata']} strata pass "
          f"positivity) — the gap is the confounding")

    did = rows("events_did_estimator")[0].asDict()
    report["did"] = {"did": did["did"], "placebo": did["placebo_did"]}
    print(f"[did      ] DiD {did['did']}; placebo {did['placebo_did']} "
          f"(should be ~0 if trends are parallel)")

    qini = rows("events_qini_uplift_curve")
    final = qini[-1].asDict() if qini else {}
    report["qini"] = {"n_deciles": len(qini),
                      "final_qini": final.get("qini")}
    print(f"[qini     ] {len(qini)} deciles; cumulative Qini at 100% "
          f"targeting = {final.get('qini')}")

    fx = rows("events_effect_sizes")[0].asDict()
    report["effect"] = {"cohens_d": fx["cohens_d"],
                        "hedges_g": fx["hedges_g"]}
    print(f"[effect   ] d = {fx['cohens_d']}, g = {fx['hedges_g']} "
          f"(variance ratio {fx['variance_ratio']})")

    its = rows("events_interrupted_time_series")[0].asDict()
    report["its"] = {"level_change": its["level_change"],
                     "slope_change": its["slope_change"]}
    print(f"[its      ] level change {its['level_change']}, slope change "
          f"{its['slope_change']} at day {its['cutoff_day']}")
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    session = get_spark(app_name="experiment-report")
    try:
        run(session, sf)
    finally:
        session.stop()
