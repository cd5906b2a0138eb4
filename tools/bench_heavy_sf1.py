"""Scaling datapoints for the round-5 heavy additions (VERDICT r5 #7).

Times lm_unigram_em_round, bpe_train_merge_rounds,
events_kleinberg_bursts, reco_item_item_cosine at sf0.1 and at the
10x density-honest derived corpus (gen_benchdata.py --fresh-docs),
printing one JSON line with both timing sets and the ratio — the
evidence that each query's scaling is sublinear or bounded-relation-
dominated.

Round 11 (VERDICT r10 task 5): the heaviest round-10 shapes also get a
100x point (HEAVY_100X below) — reco_slope_one_eval (brand-dimension-
bounded deviation grid: users grow, brands don't), events_theta_forecast
and events_hurst_rescaled_range (day-bounded tails: the corpus pass to
daily aggregates is the only scaling term). Each SF point runs in its
own SUBPROCESS — a fresh python process and hence a genuinely fresh
JVM (r12; same-process session recreation reuses the py4j gateway JVM)
— with the scaling harness's discipline (untimed warm-up, min-of-3
re-permuted round-robin, GC between queries).

Usage: python tools/bench_heavy_sf1.py [sf01_dir] [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from automated_data_pipeline_python_spark.session import get_spark  # noqa: E402

HEAVY = [
    "lm_unigram_em_round",
    "bpe_train_merge_rounds",
    "events_kleinberg_bursts",
    "reco_item_item_cosine",
    # round-6/7 heavy additions (VERDICT r6 task 5):
    "er_em_mu_round",
    "mixture_doremi_round",
    "graph_closeness_centrality",
    "events_stl_decomposition",
    # round-8 additions with a full corpus tokenize/join pass:
    "text_burrows_delta",
    "text_gini_token_concentration",
    "mixture_unimax_budget",
    "text_ql_dirichlet_ranking",
    "text_readability_flesch",
    "lineitem_abc_xyz_matrix",
    # round-9 additions with a full corpus pass (featurize/explode/
    # window): the rest of the round-9 ops run on calendar- or
    # dimension-bounded relations and have nothing to measure here.
    "quality_spiegelhalter_z",
    "embedding_mahalanobis_outliers",
    "orders_weibull_interpurchase",
    "events_effect_sizes",
    "clustering_davies_bouldin",
    # VERDICT r9 task 4: the heaviest remaining round-9 shapes —
    # placement moments off the score histogram, DFT/STL heads, and
    # the Erlang-C staffing fold off the peak-hour scan.
    "quality_auc_delong_ci",
    "events_spectral_entropy",
    "events_seasonal_strength",
    "events_erlang_staffing",
    # round-10 additions with a full corpus pass (featurize, k-way
    # embedding join, shared-vocab pair join, ratings join): the rest
    # of the round-10 ops run on calendar-bounded relations.
    "quality_log_loss",
    "clustering_silhouette_simplified",
    "corpus_source_hellinger_tv",
    "reco_slope_one_eval",
    # round-11 additions with a full corpus pass (frame-hash explode +
    # global distinct; window/hop explode + island windows): the rest
    # of the multimodal curation family is map-only or bounded.
    "multimodal_frame_dedup_rate",
    "multimodal_vad_utterances",
]

# The heaviest round-10 shapes get a dedicated 100x ladder (VERDICT r10
# task 5), each with a bounded-relation argument to verify:
#   reco_slope_one_eval — dev grid is brand x brand (25 brands, fixed);
#     the corpus-scaling term is the ratings build + the per-user
#     bounded prediction fan-out, both linear in users.
#   events_theta_forecast — the SES/trend/MASE tail runs on the
#     day-bounded daily relation; only the daily-aggregate corpus pass
#     scales.
#   events_hurst_rescaled_range — block ladder over <= 32-row daily
#     blocks; same single corpus pass to daily counts.
# r12 adds the two queries with the highest 10x ratios in the heavy
# set (2.3-2.4x), so their boundedness argument gets a 100x row too:
#   mixture_unimax_budget — one corpus pass to per-source token
#     counts; the UniMax water-fill runs on the source-count-bounded
#     relation.
#   quality_log_loss — map-only scoring pass (clamped-ln, per-row
#     snap) into one global exact-integer aggregate.
HEAVY_100X = [
    "reco_slope_one_eval",
    "events_theta_forecast",
    "events_hurst_rescaled_range",
    "mixture_unimax_budget",
    "quality_log_loss",
]


def time_point(sf_dir: str, cpus: int, names: list[str]) -> dict[str, float]:
    """One (SF, query-set) point with the scaling harness's full
    discipline: untimed warm-up cycle, min-of-3 re-permuted round-robin
    cycles, temp-view drop + driver GC between queries. True JVM
    isolation comes from main() running each point via a `--point`
    SUBPROCESS (fresh python -> fresh JVM) — calling get_spark() after
    spark.stop() in one process reuses the py4j gateway JVM, so only
    the SparkContext would be fresh (ADVICE r11). Round 12 applies the
    SAME discipline to the 10x section that the 100x ladder already
    had: its old shared-session 2-repeat loop (no GC, one JVM across
    both SFs, ~30 queries of checkpoint debt by the second SF) measured
    graph_closeness_centrality at 31.5 s on the 10x corpus where the
    subprocess-isolated min-of-5 scaling bench measured 3.975 s the
    same day — shared-session levels were heap-pressure artifacts, not
    query cost."""
    import hashlib

    from automated_data_pipeline_python_spark.queries import QUERIES

    spark = get_spark(
        app_name="bench-heavy-point",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def drop_and_gc() -> None:
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.sparkContext._jvm.System.gc()

    for name in names:  # untimed warm-up
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        drop_and_gc()
    best = {name: float("inf") for name in names}
    for r in range(3):
        order = sorted(
            names,
            key=lambda n: hashlib.md5(f"{r}:{n}".encode()).hexdigest(),
        )
        for name in order:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(best[name], time.perf_counter() - t0)
            drop_and_gc()
    spark.stop()
    return {name: round(v, 3) for name, v in best.items()}


SETS = {"heavy": HEAVY, "ladder": HEAVY_100X}


def _subprocess_point(sf_dir: str, set_name: str) -> dict[str, float]:
    """`set_name` is a SETS key, or `query:<name>` for a set of one —
    the ladder uses the latter: r12 measured the SAME (query, SF,
    corpus, solo machine) at 16.6 s vs 39.0 s when the only change was
    ladder co-residents (3 -> 5 queries), so cross-round-comparable
    ladder numbers require per-query JVM isolation (marginal query
    cost); with a set of one, round-robin degenerates to back-to-back
    min-of-3, which is symmetric across SFs and therefore still the
    right estimator for cross-SF ratios."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--point", sf_dir,
         set_name],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".benchdata", "sf1_fresh"
    )
    sf10 = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, ".benchdata", "sf10_fresh"
    )

    t01 = _subprocess_point(sf01, "heavy")
    t1 = _subprocess_point(sf1, "heavy")

    # 100x ladder — fresh subprocess per (query, SF): marginal cost,
    # independent of ladder composition (see _subprocess_point).
    ladder = {}
    if os.path.isdir(sf10):
        for key, d in (
            ("sf0.1", sf01),
            ("sf1_fresh_10x", sf1),
            ("sf10_fresh_100x", sf10),
        ):
            ladder[key] = {}
            for name in HEAVY_100X:
                ladder[key].update(_subprocess_point(d, f"query:{name}"))
    print(
        json.dumps(
            {
                "metric": "heavy_additions_scaling",
                "unit": "sec",
                "sf0.1": t01,
                "sf1_fresh": t1,
                "ratio_10x_data": {
                    k: round(t1[k] / t01[k], 2) if t01[k] else None for k in HEAVY
                },
                "heavy_100x_ladder": ladder,
                "heavy_100x_ratio_100x_over_1x": {
                    k: round(
                        ladder["sf10_fresh_100x"][k] / ladder["sf0.1"][k], 2
                    )
                    for k in HEAVY_100X
                } if ladder else {},
                "note": (
                    "10x sections: min-of-3 re-permuted round-robin "
                    "over the 29-query set after one untimed warm-up "
                    "cycle, one SUBPROCESS (fresh python -> fresh "
                    "JVM) per SF, temp-view drop + driver GC between "
                    "queries — a production-schedule-shaped estimate "
                    "whose levels depend on the co-resident set; "
                    "orderings and cross-SF ratios are the claim, not "
                    "levels (r12: the old shared-across-SFs session "
                    "measured closeness at 31.5 s where an isolated "
                    "point measured 3.975 s, and closeness stays "
                    "state-dominated even isolated — same-day solo "
                    "runs of THIS harness measured it at 16.8 s and "
                    "4.3 s inside the 29-query 10x point, vs "
                    "4.4-8.4 s solo fresh-JVM probes — it is many "
                    "tiny stages over a complete 25-node graph, so "
                    "its wall is scheduler/heap state, not data; "
                    "BENCH_DEDUP_SCALING.json's closeness_edge_build/"
                    "closeness_bfs_tail decomposition is the "
                    "authoritative scaling evidence for it). "
                    "100x ladder: one subprocess per (QUERY, SF) — "
                    "back-to-back min-of-3 after one untimed warm-up, "
                    "symmetric across SFs — because ladder levels "
                    "moved 16.6 -> 39.0 s for the same (query, SF, "
                    "corpus) when the co-resident ladder set grew "
                    "from 3 to 5 queries; per-query isolation makes "
                    "the rows marginal query cost, comparable across "
                    "rounds regardless of ladder composition. "
                    "Boundedness arguments: reco_slope_one_eval's "
                    "dev grid is brand x brand (fixed 25 brands — "
                    "users grow, brands don't); events_theta_forecast "
                    "and events_hurst_rescaled_range are day-bounded "
                    "tails over one daily-aggregate corpus pass; "
                    "mixture_unimax_budget water-fills the "
                    "source-count-bounded relation after one corpus "
                    "pass; quality_log_loss is a map-only scoring "
                    "pass into one global exact-integer aggregate"
                ),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--point":
        _cpus = int(
            os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
        )
        os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
        _set = sys.argv[3]
        _names = (
            [_set.removeprefix("query:")]
            if _set.startswith("query:")
            else SETS[_set]
        )
        print(json.dumps(time_point(sys.argv[2], _cpus, _names)))
    else:
        main()
