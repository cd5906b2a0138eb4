"""Textbook-reference cross-checks for the legacy high-math families
(VERDICT r8 task 4 — the backward extension of the round-8 pattern).

The oracle-parity suite proves Spark == DuckDB; these tests close the
remaining blind spot by proving the DuckDB oracle == an independent
pure-Python reimplementation of the textbook algorithm, for the oldest,
most intricate folds: STL's moving-average decomposition (Cleveland et
al. 1990), the Holt-Winters additive recursion, Kleinberg's 2-state
burst Viterbi (Kleinberg 2002), damped PageRank and personalized
PageRank iterations (Brin & Page 1998), the Kaplan-Meier product-limit
estimator (Kaplan & Meier 1958), and CUPED's regression adjustment
(Deng et al. 2013). Any shared SQL bug mirrored on both engine sides
would surface here. DuckDB-only — no Spark session, so the whole module
runs in seconds.

Snapping discipline: where the SQL snaps intermediates to a fixed grid
(floor(x * 1eD + 0.5) / 1eD), the Python reference replicates the snap
so recursions stay bit-comparable; where the SQL computes one final
float through transcendentals (exp/ln), comparisons use the 2e-6
tolerance (one snap-grid step) like the round-8 module.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from tests.conftest import SF_SMOKE

TABLES = ["events", "orders", "lineitem", "part"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return c


def _snap(x: float, d: int = 6) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _oracle(name: str) -> str:
    from automated_data_pipeline_python_spark.queries import QUERIES

    return QUERIES[name].oracle


# ---------------------------------------------------------------------------
# STL decomposition (Cleveland et al. 1990, moving-average core)
# ---------------------------------------------------------------------------


def test_stl_matches_moving_average_decomposition(con):
    """trend = centered 7-day MA (complete calendar windows only),
    seasonal = day-of-week mean of the detrended series, remainder =
    the rest — recomputed from raw daily revenue cents."""
    daily = {
        d: c
        for d, c in con.execute(
            "SELECT CAST(ts AS DATE), CAST(sum(CAST(floor(value * 1e2"
            " + 0.5) AS BIGINT)) AS BIGINT) FROM events"
            " WHERE value IS NOT NULL GROUP BY 1"
        ).fetchall()
    }
    days = sorted(daily)
    epoch = {d: d.toordinal() for d in days}
    present = {epoch[d]: d for d in days}
    trend, detr = {}, {}
    for d in days:
        window = [
            daily[present[dn]]
            for dn in range(epoch[d] - 3, epoch[d] + 4)
            if dn in present
        ]
        if len(window) == 7:
            trend[d] = _snap(sum(window) / 7e2)
            detr[d] = _snap(daily[d] / 1e2 - trend[d])
    by_dow = defaultdict(list)
    for d, v in detr.items():
        by_dow[d.weekday()].append(v)  # Monday=0, both engines remapped
    seasonal = {
        dow: _snap(sum(math.floor(v * 1e6 + 0.5) for v in vs) / 1e6 / len(vs))
        for dow, vs in by_dow.items()
    }
    got = {
        r[0]: r[1:]
        for r in con.execute(_oracle("events_stl_decomposition")).fetchall()
    }
    assert len(got) == len(days) and len(got) >= 28
    for d in days:
        obs, tr, se, rem = got[d.strftime("%Y-%m-%d")]
        assert obs == daily[d] / 1e2
        assert se == seasonal[d.weekday()], d
        if d in trend:
            assert abs(tr - trend[d]) < 1e-9, d
            assert abs(rem - _snap(detr[d] - seasonal[d.weekday()])) < 1e-9
            # the additive identity holds on the snapped grid
            assert abs(obs - (tr + se + rem)) < 3e-6
        else:
            assert tr is None and rem is None


# ---------------------------------------------------------------------------
# Holt-Winters additive recursion (weekly season)
# ---------------------------------------------------------------------------


def test_holt_winters_matches_sequential_recursion(con):
    """The fold/recursive SQL must equal the literal sequential HW
    update (alpha=.2, beta=.1, gamma=.1, l0 = first-week mean,
    s_i = x_i - l0), replicating the per-step 1e-6 snap."""
    daily = defaultdict(list)
    for et, d, n in con.execute(
        "SELECT event_type, CAST(ts AS DATE), count(*) FROM events"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall():
        daily[et].append((d.strftime("%Y-%m-%d"), float(n)))
    got = {
        (r[0], r[1]): r[3:]
        for r in con.execute(_oracle("events_holt_winters_weekly")).fetchall()
    }
    assert len(got) > 50
    checked = 0
    for et, series in daily.items():
        if len(series) < 7:
            continue
        xs = [x for _, x in series]
        l0 = sum(xs[:7]) / 7e0
        level, b = _snap(l0), 0.0
        s = [_snap(x - l0) for x in xs[:7]]  # s[0] == s1 .. s[6] == s7
        # the i = 7 row: init state + first forecast
        day7 = series[6][0]
        f = _snap(level + b + s[0])
        assert got[(et, day7)] == (level, b, s[6], f), (et, day7)
        checked += 1
        for i in range(7, len(xs)):
            v = xs[i]
            raw_l = 2e-1 * (v - s[0]) + 8e-1 * (level + b)
            new_l = _snap(raw_l)
            new_b = _snap(1e-1 * (raw_l - level) + 9e-1 * b)
            new_s7 = _snap(1e-1 * (v - raw_l) + 9e-1 * s[0])
            f = _snap(new_l + new_b + s[1])  # s1' = old s2
            level, b = new_l, new_b
            s = s[1:] + [new_s7]
            day = series[i][0]
            g_l, g_b, g_s7, g_f = got[(et, day)]
            assert abs(g_l - level) < 1e-9, (et, day)
            assert abs(g_b - b) < 1e-9, (et, day)
            assert abs(g_s7 - new_s7) < 1e-9, (et, day)
            assert abs(g_f - f) < 1e-9, (et, day)
            checked += 1
    assert checked == len(got)


# ---------------------------------------------------------------------------
# Kleinberg burst detection (2-state min-cost Viterbi)
# ---------------------------------------------------------------------------


def test_kleinberg_matches_viterbi_backtrack(con):
    """The backpointer-string recursion must label exactly the states a
    plain 2-state Viterbi (Poisson costs, gamma=1 on 0->1, ties to the
    lower state) picks on the same daily series."""
    xs = [
        n
        for (n,) in con.execute(
            "SELECT count(*) FROM events WHERE event_type = 'purchase'"
            " GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    l0 = sum(xs) / len(xs)
    l1 = 11e-1 * l0
    c0 = _snap(l0 - xs[0] * math.log(l0))
    c1 = _snap(l1 - xs[0] * math.log(l1) + 1e0)
    p0, p1 = "0", "1"
    for x in xs[1:]:
        pre0 = c0 if c0 <= c1 else c1
        np0 = (p0 if c0 <= c1 else p1) + "0"
        pre1 = c0 + 1e0 if c0 + 1e0 <= c1 else c1
        np1 = (p0 if c0 + 1e0 <= c1 else p1) + "1"
        c0 = _snap(l0 - x * math.log(l0) + pre0)
        c1 = _snap(l1 - x * math.log(l1) + pre1)
        p0, p1 = np0, np1
    path = p0 if c0 <= c1 else p1
    got = con.execute(_oracle("events_kleinberg_bursts")).fetchall()
    assert len(got) == len(xs)
    assert any(r[2] == "burst" for r in got)  # not vacuous
    assert any(r[2] == "normal" for r in got)
    for (day, n, state), x, want in zip(got, xs, path):
        assert n == x
        assert state == ("burst" if want == "1" else "normal"), day


# ---------------------------------------------------------------------------
# PageRank + personalized PageRank (2 damped iterations)
# ---------------------------------------------------------------------------


def _copurchase_edges(con):
    from automated_data_pipeline_python_spark.queries.graph import _EDGES_SQL

    edges = con.execute(_EDGES_SQL).fetchall()
    out_w = defaultdict(int)
    for s, _, w in edges:
        out_w[s] += w
    return edges, dict(out_w)


def _damped_round(edges, out_w, r, n, restart):
    """One r' = restart + 0.85 * M r round with the per-edge 1e-9 snap
    and the 1e-9 result snap (sql_exact_sum / sql_stable_round)."""
    acc = defaultdict(int)
    for s, d, w in edges:
        if r[s] > 0e0:
            acc[d] += math.floor(r[s] * (w / out_w[s]) * 1e9 + 0.5)
    return {
        v: _snap(restart(v) + 85e-2 * (acc[v] / 1e9), 9) for v in out_w
    }


def test_pagerank_matches_iteration(con):
    edges, out_w = _copurchase_edges(con)
    n = len(out_w)
    r = {v: 1e0 / n for v in out_w}
    for _ in range(2):
        r = _damped_round(edges, out_w, r, n, lambda v: 15e-2 / n)
    deg = defaultdict(lambda: [0, 0])
    for s, _, w in edges:
        deg[s][0] += 1
        deg[s][1] += w
    got = con.execute(_oracle("graph_brand_pagerank")).fetchall()
    assert len(got) == n > 10
    total = 0.0
    for brand, pr, n_nb, w_tot in got:
        assert abs(pr - _snap(r[brand])) < 1e-9, brand
        assert (n_nb, w_tot) == tuple(deg[brand])
        total += pr
    assert abs(total - 1.0) < 1e-3  # rank mass conserved (no dangling)


def test_personalized_pagerank_matches_iteration(con):
    edges, out_w = _copurchase_edges(con)
    seed = min(out_w, key=lambda v: (-out_w[v], v))
    r = {v: (1e0 if v == seed else 0e0) for v in out_w}
    for _ in range(2):
        r = _damped_round(
            edges, out_w, r, len(out_w),
            lambda v: 15e-2 if v == seed else 0e0,
        )
    want = sorted(
        ((_snap(r[v]), v) for v in out_w), key=lambda t: (-t[0], t[1])
    )[:20]
    got = con.execute(_oracle("graph_personalized_pagerank")).fetchall()
    assert len(got) == 20
    for (sb, brand, ppr), (w_ppr, w_brand) in zip(got, want):
        assert sb == seed
        assert brand == w_brand
        assert abs(ppr - w_ppr) < 1e-9, brand


# ---------------------------------------------------------------------------
# Kaplan-Meier product-limit estimator
# ---------------------------------------------------------------------------


def test_kaplan_meier_matches_product_limit(con):
    """S(t) = prod_{t_i <= t} (1 - d_i / n_i) with censored tails in
    the risk set only — recomputed from raw per-customer gaps."""
    rows = con.execute(
        "WITH per AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d"
        " FROM orders),"
        " seq AS (SELECT o_custkey, d, lag(d) OVER (PARTITION BY"
        " o_custkey ORDER BY d) AS prev_d FROM per)"
        " SELECT o_custkey, d, prev_d FROM seq ORDER BY o_custkey, d"
    ).fetchall()
    horizon = max(d for _, d, _ in rows)
    obs = []  # (duration, is_event)
    last = {}
    for cust, d, prev in rows:
        if prev is not None:
            obs.append(((d - prev).days, 1))
        last[cust] = d
    for d in last.values():
        obs.append(((horizon - d).days, 0))
    hist = defaultdict(lambda: [0, 0])  # dur -> [d_t, c_t]
    for dur, ev in obs:
        hist[dur][0] += ev
        hist[dur][1] += 1
    n_risk, s, dead = len(obs), 1.0, False
    got = con.execute(_oracle("orders_interpurchase_survival")).fetchall()
    gi = 0
    for dur in sorted(hist):
        d_t, c_t = hist[dur]
        if d_t > 0:
            if d_t >= n_risk:
                dead = True
            if not dead:
                s *= 1e0 - d_t / n_risk
            gap, n_rep, n_at, surv = got[gi]
            assert (gap, n_rep, n_at) == (dur, d_t, n_risk)
            assert abs(surv - _snap(0.0 if dead else s)) < 2e-6, dur
            gi += 1
        n_risk -= c_t
    assert gi == len(got) > 10
    assert got[0][3] < 1.0 and got[-1][3] <= got[0][3]  # monotone down


# ---------------------------------------------------------------------------
# CUPED regression adjustment (Deng et al. 2013)
# ---------------------------------------------------------------------------


def test_cuped_matches_covariance_adjustment(con):
    """theta = cov(X,Y)/var(X) and the corr^2 variance reduction,
    recomputed with plain centered sums (not the SQL's raw moments);
    the CUPED lift must equal the theta-adjusted arm contrast."""
    from automated_data_pipeline_python_spark.functions.text import (
        duck_hash28,
    )

    h = duck_hash28("CAST(user_id AS VARCHAR)")
    rows = con.execute(
        f"""
        WITH bounds AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events)
        SELECT CASE WHEN {h} % 2 = 0 THEN 'control' ELSE 'treatment' END,
               sum(CASE WHEN 2 * date_diff('microsecond', b.t0, ts)
                         < date_diff('microsecond', b.t0, b.t1)
                         AND event_type = 'purchase' THEN 1 ELSE 0 END),
               sum(CASE WHEN 2 * date_diff('microsecond', b.t0, ts)
                         >= date_diff('microsecond', b.t0, b.t1)
                         AND event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM events CROSS JOIN bounds b
        GROUP BY user_id, CASE WHEN {h} % 2 = 0 THEN 'control'
                               ELSE 'treatment' END
        """
    ).fetchall()
    xs = [float(x) for _, x, _ in rows]
    ys = [float(y) for _, _, y in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    var_x = sum((x - mx) ** 2 for x in xs) / n
    var_y = sum((y - my) ** 2 for y in ys) / n
    theta = cov / var_x
    corr2 = cov * cov / (var_x * var_y)
    arms = defaultdict(lambda: [0, 0.0, 0.0])
    for arm, x, y in rows:
        a = arms[arm]
        a[0] += 1
        a[1] += x
        a[2] += y
    (n_c, sx_c, sy_c), (n_t, sx_t, sy_t) = arms["control"], arms["treatment"]
    raw = sy_t / n_t - sy_c / n_c
    cuped = (sy_t / n_t - theta * sx_t / n_t) - (
        sy_c / n_c - theta * sx_c / n_c
    )
    got = con.execute(_oracle("events_cuped_adjustment")).fetchone()
    assert got[0] == n_c and got[1] == n_t
    assert abs(got[2] - theta) < 2e-6
    assert abs(got[3] - corr2) < 2e-6
    assert 0.0 <= got[3] <= 1.0
    assert abs(got[4] - raw) < 2e-6
    assert abs(got[5] - cuped) < 2e-6
    # the point of CUPED: the adjustment must not invent lift when
    # theta = 0 would; both estimates stay finite and comparable
    assert abs(cuped - raw) <= abs(theta) * (
        abs(sx_t / n_t) + abs(sx_c / n_c)
    )
