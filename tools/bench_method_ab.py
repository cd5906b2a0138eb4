"""Harness-method A/B: back-to-back min-of-3 (the pre-r11 bench.py
method) vs re-permuted round-robin warm min-of-3 (the r11+ method) for
five representative headline queries, in one solo JVM.

Round 12 (VERDICT r11 task 3): the r11 artifact concluded "back-to-back
on the r11 corpus reproduces the BENCH_r10 levels, so the corpus
regeneration is not the shift" — true for 3 of its 5 probes but NOT
for events_sessionization (0.786 s back-to-back vs 0.532 s in
BENCH_r10, +48 % before any method change). This script adds the
events-corpus structure stats (session count / events-per-session /
ts dtype) that determine that query's output cardinality, so per-query
residuals can be attributed to corpus shape rather than blanket-blamed
on the harness.

Prints one JSON line; committed as BENCH_METHOD_AB_r12.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from automated_data_pipeline_python_spark.session import get_spark  # noqa: E402

PROBES = [
    "events_sessionization",
    "ann_lsh_topk",
    "dedup_minhash_lsh",
    "text_tfidf_top_terms",
    "q21_sole_late_shipper",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    spark = get_spark(
        app_name="bench-method-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from automated_data_pipeline_python_spark.queries import QUERIES
    from automated_data_pipeline_python_spark.tables import load

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.sparkContext._jvm.System.gc()
        return dt

    # corpus-shape evidence for the sessionization probe: the session
    # count IS the query's output cardinality, so a regeneration that
    # changes events-per-session moves the query's wall independently
    # of any harness change.
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ab_events")
    n_events, n_sessions = spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN pts IS NULL
                             OR ts - pts > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     AS pts FROM ab_events) t
        """
    ).collect()[0]
    ts_dtype = dict(ev.dtypes)["ts"]
    spark.catalog.dropTempView("ab_events")

    for name in PROBES:  # untimed warm-up (both methods measure warm)
        run(name)

    # Method A: back-to-back min-of-3 (pre-r11 bench.py)
    btb = {
        name: round(min(run(name) for _ in range(3)), 3) for name in PROBES
    }
    # Method B: re-permuted round-robin min-of-3 warm (r11+ bench.py)
    best = {name: float("inf") for name in PROBES}
    for r in range(3):
        order = sorted(
            PROBES, key=lambda n: hashlib.md5(f"{r}:{n}".encode()).hexdigest()
        )
        for name in order:
            best[name] = min(best[name], run(name))
    rr = {name: round(v, 3) for name, v in best.items()}
    spark.stop()

    print(json.dumps({
        "metric": "bench_harness_method_ab",
        "unit": "sec",
        "sf_dir": sf_dir,
        "what": ("same commit, same corpus, solo JVM: min-of-3 "
                 "BACK-TO-BACK repeats (pre-r11 bench.py) vs min-of-3 "
                 "RE-PERMUTED ROUND-ROBIN warm cycles (r11+ method) "
                 "for five representative headline queries, after one "
                 "untimed warm-up pass"),
        "back_to_back_min3": btb,
        "round_robin_min3_warm": rr,
        "level_ratio_rr_over_btb": {
            n: round(rr[n] / btb[n], 2) for n in PROBES
        },
        "events_corpus_shape": {
            "n_events": n_events,
            "n_sessions_30min_gap": n_sessions,
            "events_per_session": round(n_events / n_sessions, 3),
            "ts_dtype": ts_dtype,
        },
    }))


if __name__ == "__main__":
    main()
