"""Textbook-reference cross-checks for the round-8 operators.

The oracle-parity suite proves Spark == DuckDB; these tests close the
remaining gap by proving the DuckDB oracle == an independent pure-Python
reimplementation of the textbook algorithm (greedy water-filling, greedy
MMR, the Gini definition over raw token counts, the W1 integral over
step eCDFs, the newsvendor fractile, EB shrinkage direction). Any shared
SQL bug on both engine sides would surface here. DuckDB-only — no Spark
session, so the whole module runs in seconds.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_SMOKE

TABLES = ["events", "documents", "embeddings", "lineitem", "part", "orders"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return c


def _tokens(con):
    from automated_data_pipeline_python_spark.queries.text import _D_TOK

    return [
        r[0]
        for r in con.execute(
            f"SELECT unnest({_D_TOK}) FROM documents"
        ).fetchall()
    ]


def test_unimax_matches_greedy_water_filling(con):
    """The closed-form fill level must equal the textbook loop: walk
    sources ascending by cap, give each min(cap, remaining/left)."""
    from automated_data_pipeline_python_spark.queries.curation3 import (
        _UNIMAX_DUCK_SQL,
        _UNIMAX_EPOCHS,
    )
    from automated_data_pipeline_python_spark.queries.text import _D_TOK

    counts = dict(
        con.execute(
            f"SELECT source, count(*) FROM (SELECT source, unnest({_D_TOK})"
            f" FROM documents) GROUP BY source"
        ).fetchall()
    )
    total = sum(counts.values())
    budget = math.floor(29.0 * total / 10)
    caps = sorted(
        ((_UNIMAX_EPOCHS * n, src) for src, n in counts.items())
    )
    remaining, left, alloc = budget, len(caps), {}
    for cap, src in caps:
        share = remaining / left
        take = cap if cap <= share else math.floor(share)
        # the SQL gives every uncapped source the SAME final fill level,
        # so recompute the level once the first uncapped source is hit
        alloc[src] = take
        remaining -= take
        left -= 1
    rows = con.execute(_UNIMAX_DUCK_SQL).fetchall()
    got = {r[0]: (r[3], r[4]) for r in rows}  # capped, alloc
    for src, (capped, a) in got.items():
        cap = _UNIMAX_EPOCHS * counts[src]
        if capped:
            assert a == cap, src
        else:
            # uncapped sources all share one floor(fill level)
            assert a == alloc[src] or abs(a - alloc[src]) <= 1, (
                src, a, alloc[src],
            )
    assert sum(a for _, a in got.values()) <= budget


def test_gini_matches_definition_on_raw_counts(con):
    """Tied-block arithmetic over the distinct-count histogram must
    equal the plain sorted-vector Gini definition."""
    from collections import Counter

    from automated_data_pipeline_python_spark.queries.text import (
        _GINI_DUCK_SQL,
    )

    cnt = sorted(Counter(_tokens(con)).values())
    n, t = len(cnt), sum(cnt)
    s1 = sum((i + 1) * x for i, x in enumerate(cnt))
    gini = 2 * s1 / (n * t) - (n + 1) / n
    desc = sorted(cnt, reverse=True)
    k1, k10 = -(-n // 100), -(-n // 10)
    row = con.execute(_GINI_DUCK_SQL).fetchone()
    assert row[0] == n and row[1] == t
    assert abs(row[2] - gini) < 2e-6
    assert abs(row[3] - sum(desc[:k1]) / t) < 2e-6
    assert abs(row[4] - sum(desc[:k10]) / t) < 2e-6


def test_wasserstein_matches_cdf_integral(con):
    """The exact-integer transport mass must equal the literal
    sum |F1 - F2| * segment-width over the merged grid."""
    import bisect

    from automated_data_pipeline_python_spark.queries.drift import (
        _WASSERSTEIN_SQL,
    )

    rows = con.execute(
        "SELECT value, event_type FROM events WHERE event_type IN "
        "('click','purchase') AND value IS NOT NULL"
    ).fetchall()
    x = sorted(math.floor(v * 100 + 0.5) for v, t in rows if t == "click")
    y = sorted(math.floor(v * 100 + 0.5) for v, t in rows if t == "purchase")
    grid = sorted(set(x) | set(y))
    w1 = 0.0
    for i in range(len(grid) - 1):
        fx = bisect.bisect_right(x, grid[i]) / len(x)
        fy = bisect.bisect_right(y, grid[i]) / len(y)
        w1 += abs(fx - fy) * (grid[i + 1] - grid[i])
    got = con.execute(_WASSERSTEIN_SQL).fetchone()
    assert got[0] == len(x) and got[1] == len(y)
    assert abs(got[2] - w1 / 100) < 2e-6


def test_mmr_matches_greedy_reference(con):
    """The unrolled SQL steps must pick exactly the greedy argmax
    sequence a plain-Python MMR computes on the same candidate set."""
    from automated_data_pipeline_python_spark.queries.rag import (
        _MMR_DUCK_SQL,
        _MMR_K,
        _MMR_PICK,
    )

    vecs = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT vec_id, embedding::DOUBLE[] FROM embeddings"
        ).fetchall()
    }

    def cos(a, b):
        d = sum(p * q for p, q in zip(a, b))
        na = math.sqrt(sum(p * p for p in a))
        nb = math.sqrt(sum(q * q for q in b))
        return math.floor(d / (na * nb) * 1e6 + 0.5) / 1e6

    q = vecs[0]
    rel = {v: cos(q, e) for v, e in vecs.items() if v != 0}
    cands = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_K]
    lam, sel = 0.7, []
    for _ in range(_MMR_PICK):
        best = None
        for c in cands:
            if c in sel:
                continue
            red = max((cos(vecs[c], vecs[s]) for s in sel), default=0.0)
            score = math.floor((lam * rel[c] - (1 - lam) * red) * 1e6 + 0.5) / 1e6
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c)
        sel.append(best[1])
    got = [r[1] for r in con.execute(_MMR_DUCK_SQL).fetchall()]
    assert got == sel


def test_newsvendor_is_the_smallest_qualifying_level(con):
    """stock_p80 must be the smallest demand level whose CDF >= 0.8,
    recomputed from the raw daily grid."""
    from collections import defaultdict

    from automated_data_pipeline_python_spark.queries.warehouse import (
        _NEWSVENDOR_SQL,
    )

    daily = defaultdict(list)
    for b, q in con.execute(
        "SELECT p.p_brand, CAST(sum(l.l_quantity) AS BIGINT) FROM lineitem l"
        " JOIN part p ON p.p_partkey = l.l_partkey"
        " GROUP BY p.p_brand, l.l_shipdate"
    ).fetchall():
        daily[b].append(q)
    for brand, nd, _, stock, service in con.execute(
        _NEWSVENDOR_SQL
    ).fetchall():
        qs = sorted(daily[brand])
        assert nd == len(qs)
        want = next(
            q for i, q in enumerate(qs) if 5 * (i + 1) >= 4 * len(qs)
        )
        assert stock == want, brand
        assert service >= 0.8 - 1e-9


def test_eb_shrinkage_moves_toward_prior_mean(con):
    """Posterior means must lie between the raw rate and the prior
    mean, and shrink more for smaller n."""
    from automated_data_pipeline_python_spark.queries.mlstats import (
        _EB_SHRINK_SQL,
    )

    rows = con.execute(_EB_SHRINK_SQL).fetchall()
    m = sum(r[3] for r in rows) / len(rows)
    for brand, n, k, raw, shrunk in rows:
        lo, hi = sorted((raw, m))
        assert lo - 1e-6 <= shrunk <= hi + 1e-6, brand


def test_page_hinkley_matches_sequential_recursion(con):
    """The window-algebra PH must equal the literal sequential loop:
    m_t = sum(x_i - mean_i - delta), PH_t = m_t - min m."""
    from collections import defaultdict

    from automated_data_pipeline_python_spark.queries.timeseries import (
        _ph_sql,
    )

    daily = defaultdict(list)
    for et, d, n in con.execute(
        "SELECT event_type, CAST(ts AS DATE) AS d, count(*) FROM events"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall():
        daily[et].append(n)
    got = {
        (r[0], r[1]): (r[3], r[4])
        for r in con.execute(_ph_sql("strftime(d, '%Y-%m-%d')")).fetchall()
    }
    for et, xs in daily.items():
        nd, tot = len(xs), sum(xs)
        mean = tot / nd
        var = sum((x - mean) ** 2 for x in xs) / max(nd - 1, 1)
        delta_u = math.floor(mean * 0.05 * 1e6 + 0.5)
        lambda_u = math.floor(3 * math.sqrt(max(var, 0.0)) * 1e6 + 0.5)
        m_u, min_m, pre = 0, 0, 0
        phs = []
        for i, x in enumerate(xs, start=1):
            pre += x
            m_u += math.floor((x - pre / i) * 1e6 + 0.5) - delta_u
            min_m = min(min_m, m_u)
            phs.append((m_u - min_m, (m_u - min_m) > lambda_u))
        days = con.execute(
            "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') FROM events"
            " WHERE event_type = ? GROUP BY 1 ORDER BY 1",
            [et],
        ).fetchall()
        for (day,), (ph_u, alarm) in zip(days, phs):
            g_stat, g_alarm = got[(et, day)]
            assert abs(g_stat - ph_u / 1e6) < 1e-9, (et, day)
            assert g_alarm == (1 if alarm else 0), (et, day)


def test_entropy_rate_matches_definition(con):
    """Per-state conditional entropies must equal -sum p ln p over the
    snapped transition rows, weighted by the round-3 pi."""
    from collections import defaultdict

    from automated_data_pipeline_python_spark.queries.events import (
        _MKV_MAT_SQL,
    )
    from automated_data_pipeline_python_spark.queries import QUERIES, oracle_sql

    mat = con.execute(_MKV_MAT_SQL).fetchall()
    rows_p = defaultdict(list)
    for f, _t2, p in mat:
        rows_p[f].append(p)
    want_h = {
        f: math.floor(
            -sum(math.floor(p * math.log(p) * 1e12 + 0.5) / 1e12
                 for p in ps) * 1e6 + 0.5) / 1e6
        for f, ps in rows_p.items()
    }
    got = con.execute(oracle_sql()["events_markov_entropy_rate"]).fetchall()
    for et, pi, h_row, contrib in got:
        assert abs(h_row - want_h[et]) < 2e-6, et
        assert abs(contrib - math.floor(pi * h_row * 1e6 + 0.5) / 1e6) < 1e-9


def test_qini_matches_python_accumulation(con):
    """Decile bucketing + cumulative Qini must equal the plain-Python
    computation over the same (hash-armed) per-user rows."""
    from automated_data_pipeline_python_spark.queries.experiments2 import (
        _QINI_DUCK_SQL,
    )
    from automated_data_pipeline_python_spark.functions.text import (
        duck_hash28,
    )

    arm = duck_hash28("concat('qini', CAST(user_id AS VARCHAR))")
    rows = con.execute(f"""
        SELECT count(*) AS score,
               CASE WHEN {arm} % 2 = 1 THEN 1 ELSE 0 END AS treated,
               CASE WHEN sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                         > sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS y
        FROM events GROUP BY user_id
    """).fetchall()
    n = len(rows)
    # decile by distinct-score CDF, descending
    by_score = sorted(rows, key=lambda r: -r[0])
    # cum position of each distinct score value
    from collections import Counter, defaultdict

    cnt = Counter(r[0] for r in rows)
    cum, decile_of = 0, {}
    for s in sorted(cnt, reverse=True):
        cum += cnt[s]
        decile_of[s] = (10 * cum + n - 1) // n
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for s, t, y in rows:
        c = cells[decile_of[s]]
        c[0] += t
        c[1] += 1 - t
        c[2] += y if t else 0
        c[3] += y if not t else 0
    got = con.execute(_QINI_DUCK_SQL).fetchall()
    cnt_t = cnt_c = cyt = cyc = 0
    for row in got:
        d, n_t, n_c, y_t, y_c, qini = row
        assert [n_t, n_c, y_t, y_c] == cells[d], d
        cnt_t += n_t; cnt_c += n_c; cyt += y_t; cyc += y_c
        want = (
            None if cnt_c == 0
            else math.floor((cyt - cyc * (cnt_t / cnt_c)) * 1e6 + 0.5) / 1e6
        )
        assert (qini is None and want is None) or abs(qini - want) < 1e-9, d


def test_abc_xyz_classes_match_python_boundaries(con):
    """Class letters must equal plain-Python cumulative-share and CV
    cuts on the raw daily grid."""
    from collections import defaultdict

    from automated_data_pipeline_python_spark.queries.warehouse import (
        _ABC_XYZ_SQL,
    )

    daily = defaultdict(list)
    revs = defaultdict(int)
    for b, q, cents in con.execute(
        "SELECT p.p_brand, CAST(sum(l.l_quantity) AS BIGINT),"
        " CAST(sum(CAST(floor(l.l_extendedprice * 1e2 + 0.5) AS BIGINT))"
        "      AS BIGINT)"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " GROUP BY p.p_brand, l.l_shipdate"
    ).fetchall():
        daily[b].append(q)
        revs[b] += cents
    tot = sum(revs.values())
    cum, abc = 0, {}
    for b in sorted(revs, key=lambda b: (-revs[b], b)):
        cum += revs[b]
        abc[b] = "A" if 10 * cum <= 7 * tot else (
            "B" if 10 * cum <= 9 * tot else "C")
    for b, _rs, _crs, a_cls, cv, x_cls, cell in con.execute(
        _ABC_XYZ_SQL
    ).fetchall():
        qs = daily[b]
        nd, s1 = len(qs), sum(qs)
        s2 = sum(q * q for q in qs)
        lhs = nd * (nd * s2 - s1 * s1)
        rhs = (nd - 1) * s1 * s1
        want_x = "X" if 4 * lhs <= rhs else ("Y" if lhs <= rhs else "Z")
        assert a_cls == abc[b], b
        assert x_cls == want_x, b
        assert cell == a_cls + x_cls
