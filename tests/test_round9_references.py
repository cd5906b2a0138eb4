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

TABLES = ["events", "orders", "lineitem", "part", "documents", "embeddings"]


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


# ---------------------------------------------------------------------------
# Round-9 new operators: same textbook-reference discipline
# ---------------------------------------------------------------------------


def test_sbc_classes_match_python_boundaries(con):
    """ADI/CV2 and the quadrant labels recomputed from raw daily
    brand demand with the plain Syntetos-Boylan definitions."""
    daily = defaultdict(list)
    for b, d, q in con.execute(
        "SELECT p.p_brand, CAST(l.l_shipdate AS DATE),"
        " CAST(floor(sum(l.l_quantity) + 0.5) AS BIGINT)"
        " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall():
        daily[b].append((d, q))
    got = {
        r[0]: r[1:]
        for r in con.execute(
            _oracle("lineitem_sbc_demand_classes")
        ).fetchall()
    }
    assert len(got) == len(daily) >= 20
    for b, rows in daily.items():
        n = len(rows)
        span = (rows[-1][0] - rows[0][0]).days
        qs = [q for _, q in rows]
        adi = _snap(span / (n - 1))
        mean = sum(qs) / n
        var = sum((q - mean) ** 2 for q in qs) / n
        cv2 = _snap(var / mean**2)
        if adi < 1.32 and cv2 < 0.49:
            cls, meth = "smooth", "ses"
        elif adi >= 1.32 and cv2 < 0.49:
            cls, meth = "intermittent", "croston"
        elif adi < 1.32:
            cls, meth = "erratic", "sba"
        else:
            cls, meth = "lumpy", "sba"
        g_n, g_span, g_adi, g_cv2, g_cls, g_meth = got[b]
        assert (g_n, g_span) == (n, span)
        assert abs(g_adi - adi) < 1e-9 and abs(g_cv2 - cv2) < 2e-6, b
        assert (g_cls, g_meth) == (cls, meth), b


def test_gumbel_matches_moment_fit(con):
    """mu/beta and the return levels recomputed from the raw daily
    maxima with the textbook method-of-moments formulas."""
    mx = [
        m / 1e2
        for (m,) in con.execute(
            "SELECT max(CAST(floor(value * 1e2 + 0.5) AS BIGINT))"
            " FROM events WHERE value IS NOT NULL"
            " GROUP BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    n = len(mx)
    mean = sum(mx) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in mx) / (n - 1))
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    got = con.execute(_oracle("events_gumbel_block_maxima")).fetchall()
    assert [r[0] for r in got] == [7, 30, 365]
    prev = None
    for t, n_blocks, g_mu, g_beta, g_rl in got:
        assert n_blocks == n
        assert abs(g_mu - mu) < 2e-6 and abs(g_beta - beta) < 2e-6
        rl = mu - beta * math.log(-math.log(1 - 1 / t))
        assert abs(g_rl - rl) < 2e-6, t
        if prev is not None:
            assert g_rl > prev  # return levels grow with the horizon
        prev = g_rl
    # the 7-day return level should sit in the right tail of the maxima
    assert got[0][4] > sorted(mx)[n // 2]


def test_woe_iv_matches_definition(con):
    """Bucket WOE and the IV total recomputed from raw per-user
    activity/conversion with the credit-scoring definitions."""
    rows = con.execute(
        "SELECT count(*),"
        " max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " FROM events GROUP BY user_id"
    ).fetchall()
    n = len(rows)
    dist = sorted({c for c, _ in rows})
    cum, cdf = 0, {}
    counts = defaultdict(int)
    for c, _ in rows:
        counts[c] += 1
    for v in dist:
        cum += counts[v]
        cdf[v] = cum
    buckets = defaultdict(lambda: [0, 0, 0])
    for c, conv in rows:
        b = (5 * cdf[c] + n - 1) // n
        buckets[b][0] += 1
        buckets[b][1] += conv
        buckets[b][2] += 1 - conv
    g_tot = sum(v[1] for v in buckets.values())
    b_tot = sum(v[2] for v in buckets.values())
    iv_u = 0
    woes = {}
    for b, (nu, ng, nb) in buckets.items():
        if ng > 0 and nb > 0:
            w = _snap(math.log((ng / g_tot) / (nb / b_tot)))
            woes[b] = (nu, ng, nb, w)
            iv_u += math.floor((ng / g_tot - nb / b_tot) * w * 1e6 + 0.5)
        else:
            woes[b] = (nu, ng, nb, None)
    got = con.execute(_oracle("feature_woe_iv")).fetchall()
    assert len(got) == len(buckets)
    for b, nu, ng, nb, woe, iv_term, iv_total in got:
        w_nu, w_ng, w_nb, w_w = woes[b]
        assert (nu, ng, nb) == (w_nu, w_ng, w_nb), b
        if w_w is None:
            assert woe is None
        else:
            assert abs(woe - w_w) < 1e-9, b
        assert abs(iv_total - iv_u / 1e6) < 1e-9


def test_hll_matches_python_registers(con):
    """The SQL registers and estimate recomputed with hashlib + the
    standard alpha_m correction formulas."""
    import hashlib

    users = {
        et: [u for (u,) in con.execute(
            "SELECT DISTINCT user_id FROM events WHERE event_type = ?",
            [et],
        ).fetchall()]
        for (et,) in con.execute(
            "SELECT DISTINCT event_type FROM events"
        ).fetchall()
    }
    got = {
        r[0]: r[1:]
        for r in con.execute(_oracle("sketch_hll_portable")).fetchall()
    }
    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    for et, uids in users.items():
        regs = {}
        for u in uids:
            h = int(hashlib.sha256(str(u).encode()).hexdigest()[:15], 16)
            j, w = h % m, h // m
            rho = 1
            while w and not (w & 1):
                rho += 1
                w >>= 1
            if w == 0:
                rho = 53 + 1  # unreachable for a 52-bit suffix; guard
            regs[j] = max(regs.get(j, 0), rho)
        s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
        e_raw = alpha * m * m / s
        v = m - len(regs)
        est = m * math.log(m / v) if (e_raw <= 2.5 * m and v > 0) else e_raw
        n_used, raw, hll, exact, rel = got[et]
        assert n_used == len(regs), et
        assert abs(raw - e_raw) < 2e-6, et
        assert abs(hll - est) < 2e-6, et
        assert exact == len(uids)
        assert abs(rel - abs(est - exact) / exact) < 2e-6
        # accuracy sanity: HLL-with-linear-counting at m=256 should be
        # well within 15% on these cardinalities
        assert abs(est - exact) / exact < 0.15, et


def test_delong_matches_per_row_placements(con):
    """AUC/SE/CI recomputed from per-document placement values (the
    literal DeLong construction, O(n log n) over rows — no histogram)."""
    import bisect

    from automated_data_pipeline_python_spark.queries.curation2 import (
        _DELONG_DUCK_SQL,
    )

    head = _DELONG_DUCK_SQL[: _DELONG_DUCK_SQL.index("hist AS (")]
    pairs = con.execute(
        head + "fin AS (SELECT 1) SELECT score, pos FROM scored"
    ).fetchall()
    pos = sorted(s for s, p in pairs if p == 1)
    neg = sorted(s for s, p in pairs if p == 0)
    m, n = len(pos), len(neg)

    def place(x, arr):
        lo = bisect.bisect_left(arr, x)
        hi = bisect.bisect_right(arr, x)
        return (lo + 0.5 * (hi - lo)) / len(arr)

    v10 = [place(s, neg) for s in pos]
    v01 = [1.0 - place(s, pos) for s in neg]
    auc = sum(v10) / m
    assert abs(sum(v01) / n - auc) < 1e-12  # the DeLong identity
    s10 = sum((v - auc) ** 2 for v in v10) / (m - 1)
    s01 = sum((v - auc) ** 2 for v in v01) / (n - 1)
    se = math.sqrt(s10 / m + s01 / n)
    got = con.execute(_oracle("quality_auc_delong_ci")).fetchone()
    assert got[0] == m and got[1] == n
    assert abs(got[2] - auc) < 2e-6
    assert abs(got[3] - se) < 2e-6
    assert abs(got[4] - (auc - 1.96 * se)) < 4e-6
    assert abs(got[5] - (auc + 1.96 * se)) < 4e-6
    assert abs(got[6] - (auc - 0.5) / se) < 2e-4  # z: ratio amplifies ulps
    # the CI must contain the exact rank AUC and exclude vacuity
    assert got[4] < auc < got[5] and se > 0


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau (Box & Pierce 1970; Ljung & Box 1978)
# ---------------------------------------------------------------------------


def test_ljung_box_matches_sequential_acf(con):
    """Full-mean ACF and Q(m) recomputed with the plain Box-Jenkins
    definitions over the raw daily-count series."""
    xs = [
        float(x)
        for (x,) in con.execute(
            "SELECT count(*) FROM events GROUP BY CAST(ts AS DATE)"
            " ORDER BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs)
    r = {
        k: _snap(
            sum((xs[i] - m) * (xs[i + k] - m) for i in range(n - k)) / c0
        )
        for k in range(1, 8)
    }
    crits = [3.841459, 5.991465, 7.814728, 9.487729, 11.070498,
             12.591587, 14.067140]
    got = con.execute(_oracle("events_ljung_box_acf")).fetchall()
    assert [row[0] for row in got] == list(range(1, 8))
    for row, crit in zip(got, crits):
        lag, n_days, acf, q, g_crit, reject = row
        assert n_days == n
        assert abs(acf - r[lag]) < 2e-6, lag
        q_ref = n * (n + 2) * sum(r[k] ** 2 / (n - k)
                                  for k in range(1, lag + 1))
        assert abs(q - q_ref) < 2e-4, lag
        assert g_crit == _snap(crit)
        assert reject == (1 if q > g_crit else 0)


# ---------------------------------------------------------------------------
# Pettitt changepoint (Pettitt 1979)
# ---------------------------------------------------------------------------


def test_pettitt_matches_brute_force_u(con):
    """U_t recomputed by the O(n^2) double loop straight from the
    definition (no antisymmetry shortcut), argmax with earliest-date
    ties, and the standard significance approximation."""
    rows = con.execute(
        "SELECT CAST(ts AS DATE),"
        " sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))"
        " FROM events WHERE value IS NOT NULL"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in rows]
    xs = [int(c) for _, c in rows]
    n = len(xs)

    def sgn(a: int, b: int) -> int:
        return (a > b) - (a < b)

    best_k, best_d, best_u = -1, None, 0
    for t in range(n - 1):  # split AFTER index t; last day excluded
        u = sum(
            sgn(xs[i], xs[j])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        if abs(u) > best_k:
            best_k, best_d, best_u = abs(u), days[t], u
    p = _snap(2 * math.exp(-6 * best_k**2 / (n**3 + n**2)))
    (change_date, k_stat, u_at_k, n_days, p_approx, sig) = con.execute(
        _oracle("events_pettitt_changepoint")
    ).fetchone()
    assert n_days == n
    assert (k_stat, u_at_k) == (best_k, best_u)
    assert change_date == str(best_d)
    assert abs(p_approx - p) < 2e-6
    assert sig == (1 if p < 0.05 else 0)


# ---------------------------------------------------------------------------
# Historical-simulation VaR / CVaR (Jorion, Value at Risk)
# ---------------------------------------------------------------------------


def test_var_cvar_matches_order_statistics(con):
    """VaR as the ceil(alpha*n)-th order statistic and CVaR as the
    exact tail mean, recomputed from the sorted daily totals."""
    cents = sorted(
        int(c)
        for (c,) in con.execute(
            "SELECT sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))"
            " FROM events WHERE value IS NOT NULL"
            " GROUP BY CAST(ts AS DATE)"
        ).fetchall()
    )
    n = len(cents)
    got = con.execute(_oracle("events_var_cvar_daily")).fetchall()
    assert [row[0] for row in got] == [5, 10, 25]
    for alpha_pct, n_days, k_tail, var_rev, cvar_rev in got:
        k = -(-n * alpha_pct // 100)  # ceil division
        assert (n_days, k_tail) == (n, k)
        tail = cents[:k]
        assert var_rev == _snap(tail[-1] / 1e2)
        assert abs(cvar_rev - _snap(sum(tail) / k / 1e2)) < 2e-6
        assert cvar_rev <= var_rev  # shortfall is at most the quantile


# ---------------------------------------------------------------------------
# Weibull median-rank regression (Abernethy, The New Weibull Handbook)
# ---------------------------------------------------------------------------


def test_weibull_matches_median_rank_regression(con):
    """Shape/scale recomputed from the raw gap list: Bernard ranks
    with tied blocks at their mean order number, weighted OLS on the
    linearized ln(-ln(1-F)) vs ln(t), terms snapped like the SQL."""
    gaps = [
        int(g)
        for (g,) in con.execute(
            "WITH seq AS (SELECT o_custkey,"
            " date_diff('day', lag(o_orderdate) OVER ("
            "   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),"
            " o_orderdate) AS g FROM orders)"
            " SELECT g FROM seq WHERE g >= 1"
        ).fetchall()
    ]
    n = len(gaps)
    hist = defaultdict(int)
    for g in gaps:
        hist[g] += 1
    cum = 0
    sx = sy = sxx = syy = sxy = 0.0
    for v in sorted(hist):
        cnt = hist[v]
        mr = cum + (cnt + 1) / 2  # mean order number of the tied block
        f = (mr - 0.3) / (n + 0.4)
        x = math.log(v)
        y = math.log(-math.log(1 - f))
        sx += _snap(cnt * x)
        sy += _snap(cnt * y)
        sxx += _snap(cnt * x * x)
        syy += _snap(cnt * y * y)
        sxy += _snap(cnt * x * y)
        cum += cnt
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = (sy - slope * sx) / n
    scale = math.exp(-icept / slope)
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    (g_n, g_nv, g_shape, g_scale, g_r2, g_med) = con.execute(
        _oracle("orders_weibull_interpurchase")
    ).fetchone()
    assert (g_n, g_nv) == (n, len(hist))
    assert abs(g_shape - slope) < 2e-6
    assert abs(g_scale - scale) < 1e-4 * max(1.0, scale)
    assert abs(g_r2 - r2) < 2e-6
    med = scale * math.log(2) ** (1 / slope)
    assert abs(g_med - med) < 1e-4 * max(1.0, med)
    assert 0 < g_shape and 0 < g_r2 <= 1


# ---------------------------------------------------------------------------
# Interrupted time series (segmented regression; Wagner et al. 2002)
# ---------------------------------------------------------------------------


def test_its_matches_segmented_ols(con):
    """Pre/post OLS recomputed from the raw daily series with plain
    least-squares formulas and the midpoint cutoff."""
    rows = con.execute(
        "SELECT CAST(ts AS DATE),"
        " sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))"
        " FROM events WHERE value IS NOT NULL"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    d0 = rows[0][0]
    pts = [((d - d0).days, int(c) / 1e2) for d, c in rows]
    tc = math.floor((max(t for t, _ in pts) + 1) / 2)

    def ols(seg):
        m = len(seg)
        st = sum(t for t, _ in seg)
        stt = sum(t * t for t, _ in seg)
        sy = sum(y for _, y in seg)
        sty = sum(t * y for t, y in seg)
        b = (m * sty - st * sy) / (m * stt - st * st)
        return b, (sy - b * st) / m, m

    b_pre, a_pre, n_pre = ols([(t, y) for t, y in pts if t < tc])
    b_post, a_post, n_post = ols(
        [(t - tc, y) for t, y in pts if t >= tc]
    )
    (g_npre, g_npost, g_tc, g_bpre, g_bpost, g_dslope,
     g_trend, g_level, g_dlevel) = con.execute(
        _oracle("events_interrupted_time_series")
    ).fetchone()
    assert (g_npre, g_npost, g_tc) == (n_pre, n_post, tc)
    assert abs(g_bpre - b_pre) < 2e-6
    assert abs(g_bpost - b_post) < 2e-6
    assert abs(g_dslope - (b_post - b_pre)) < 4e-6
    assert abs(g_trend - (a_pre + b_pre * tc)) < 2e-4
    assert abs(g_level - a_post) < 2e-4
    assert abs(g_dlevel - (a_post - (a_pre + b_pre * tc))) < 4e-4


# ---------------------------------------------------------------------------
# Davies-Bouldin index (Davies & Bouldin 1979)
# ---------------------------------------------------------------------------


def test_davies_bouldin_matches_definition(con):
    """One Lloyd step + the DB formula recomputed in pure Python with
    the SQL's snapping discipline (snapped squared distances, id
    tie-breaks, snapped centroid components)."""
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in con.execute(
            "SELECT vec_id, embedding FROM embeddings"
        ).fetchall()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm2 = {i: dot(v, v) for i, v in vecs.items()}
    cells = {i: vecs[i] for i in sorted(vecs) if i < 8}
    cnrm2 = {i: nrm2[i] for i in cells}
    assign = {}
    for i, v in vecs.items():
        best = min(
            (_snap(nrm2[i] - 2 * dot(v, c) + cnrm2[j]), j)
            for j, c in cells.items()
        )
        assign[i] = best[1]
    dims = len(next(iter(vecs.values())))
    cent, members = {}, defaultdict(list)
    for i, c in assign.items():
        members[c].append(i)
    for c, ids in members.items():
        cent[c] = [
            _snap(sum(vecs[i][d] for i in ids) / len(ids))
            for d in range(dims)
        ]
    ccn = {c: dot(v, v) for c, v in cent.items()}
    s_intra = {
        c: sum(
            _snap(
                math.sqrt(
                    max(_snap(nrm2[i] - 2 * dot(vecs[i], cent[c]) + ccn[c]),
                        0)
                )
            )
            for i in ids
        )
        / len(ids)
        for c, ids in members.items()
    }
    r_max = {
        c: max(
            _snap(
                (s_intra[c] + s_intra[o])
                / _snap(math.sqrt(max(_snap(ccn[c] - 2 * dot(cent[c], cent[o])
                                            + ccn[o]), 0)))
            )
            for o in cent
            if o != c
        )
        for c in cent
    }
    db = _snap(sum(r_max.values()) / len(r_max))
    got = con.execute(_oracle("clustering_davies_bouldin")).fetchall()
    assert [r[0] for r in got] == sorted(members)
    for cell, n_members, g_s, g_r, g_db in got:
        assert n_members == len(members[cell])
        assert abs(g_s - s_intra[cell]) < 2e-6, cell
        assert abs(g_r - r_max[cell]) < 2e-4, cell
        assert g_db == db


# ---------------------------------------------------------------------------
# Spiegelhalter's Z (Spiegelhalter 1986)
# ---------------------------------------------------------------------------


def test_spiegelhalter_matches_per_row_sums(con):
    """Z recomputed from per-document (score, label) pairs with the
    plain definition sum((y-p)(1-2p)) / sqrt(sum((1-2p)^2 p (1-p)))."""
    from automated_data_pipeline_python_spark.queries.curation2 import (
        _FEATS_DUCK_HEADER,
        _SCORE_EXPR,
    )

    rows = con.execute(f"""{_FEATS_DUCK_HEADER},
ratios AS (
    SELECT doc_id,
           CAST(n_uniq AS DOUBLE) / n_tok AS uniq_ratio,
           CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
           CAST(sum_len AS DOUBLE) / n_tok AS mean_len
    FROM feats
)
SELECT {_SCORE_EXPR},
       CASE WHEN f.n_tok >= 20 AND f.n_tok <= 100000
             AND floor((CAST(f.sum_len AS DOUBLE) / f.n_tok) * 1e6 + 0.5)
                 / 1e6 BETWEEN 3e0 AND 10e0
             AND floor((CAST(f.n_stop AS DOUBLE) / f.n_tok) * 1e6 + 0.5)
                 / 1e6 >= 5e-2
             AND floor((CAST(f.n_uniq AS DOUBLE) / f.n_tok) * 1e6 + 0.5)
                 / 1e6 > 2e-1
            THEN 1 ELSE 0 END AS pos
FROM ratios r JOIN feats f ON f.doc_id = r.doc_id
""").fetchall()
    num = sum((y - p) * (1 - 2 * p) for p, y in rows)
    den = sum((1 - 2 * p) ** 2 * p * (1 - p) for p, _ in rows)
    z = num / math.sqrt(den)
    (n_docs, n_pos, g_num, g_z, p_value, flag) = con.execute(
        _oracle("quality_spiegelhalter_z")
    ).fetchone()
    assert n_docs == len(rows) and n_pos == sum(y for _, y in rows)
    assert abs(g_num - num) < 1e-3  # per-cell 1e-6 snaps accumulate
    assert abs(g_z - z) < 1e-4
    # p-value consistent with the normal tail of the reported z
    p_ref = 2 * (1 - 0.5 * math.erfc(-abs(g_z) / math.sqrt(2)))
    assert abs(p_value - p_ref) < 1e-5
    assert flag == (1 if p_value < 0.05 else 0)


# ---------------------------------------------------------------------------
# Standardized effect sizes (Cohen 1988; Hedges 1981)
# ---------------------------------------------------------------------------


def test_effect_sizes_match_definitions(con):
    """d, g, Glass's delta recomputed from the raw per-arm cents with
    the plain pooled/control-SD formulas."""
    import hashlib

    vals = defaultdict(list)
    for uid, v in con.execute(
        "SELECT user_id, CAST(floor(value * 1e2 + 0.5) AS BIGINT)"
        " FROM events WHERE event_type = 'purchase'"
        " AND value IS NOT NULL"
    ).fetchall():
        h = int(hashlib.sha256(f"fx{uid}".encode()).hexdigest()[:7], 16)
        vals[h % 2].append(int(v) / 1e2)

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    n_c, m_c, v_c = stats(vals[0])
    n_t, m_t, v_t = stats(vals[1])
    pooled = math.sqrt(((n_c - 1) * v_c + (n_t - 1) * v_t)
                       / (n_c + n_t - 2))
    d = (m_t - m_c) / pooled
    g = d * (1 - 3 / (4 * (n_c + n_t) - 9))
    (g_nc, g_nt, g_mc, g_mt, g_sdc, g_sdt,
     g_d, g_g, g_glass, g_vr) = con.execute(
        _oracle("events_effect_sizes")
    ).fetchone()
    assert (g_nc, g_nt) == (n_c, n_t)
    assert abs(g_mc - m_c) < 2e-6 and abs(g_mt - m_t) < 2e-6
    assert abs(g_sdc - math.sqrt(v_c)) < 2e-6
    assert abs(g_d - d) < 2e-6
    assert abs(g_g - g) < 2e-6
    assert abs(g_glass - (m_t - m_c) / math.sqrt(v_c)) < 2e-6
    assert abs(g_vr - v_t / v_c) < 2e-6
    assert abs(g_g) <= abs(g_d)  # the correction always shrinks


# ---------------------------------------------------------------------------
# Multiwindow SLO burn rate (Beyer et al., The Site Reliability
# Workbook ch. 5)
# ---------------------------------------------------------------------------


def test_slo_burn_matches_trailing_windows(con):
    """Trailing 1/7/28-day error rates and the two-window alert
    conjunctions recomputed from the raw daily counts."""
    rows = con.execute(
        "SELECT CAST(ts AS DATE), count(*),"
        " sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [(d, int(n), int(e)) for d, n, e in rows]
    got = con.execute(_oracle("events_slo_burn_rate")).fetchall()
    assert len(got) == len(days)
    for row, (d, n, e) in zip(got, days):
        (day, n_events, r1, r7, r28, b1, b7, b28, page, ticket) = row
        assert day == str(d) and n_events == n
        w7 = [(nn, ee) for dd, nn, ee in days if 0 <= (d - dd).days <= 6]
        w28 = [(nn, ee) for dd, nn, ee in days if 0 <= (d - dd).days <= 27]
        assert r1 == _snap(e / n)
        assert r7 == _snap(sum(ee for _, ee in w7) / sum(nn for nn, _ in w7))
        assert r28 == _snap(
            sum(ee for _, ee in w28) / sum(nn for nn, _ in w28)
        )
        assert b1 == _snap(r1 / 0.25) and b7 == _snap(r7 / 0.25)
        assert page == (1 if b1 > 1.4 and b7 > 1.4 else 0)
        assert ticket == (1 if b7 > 1.0 and b28 > 1.0 else 0)


# ---------------------------------------------------------------------------
# Mahalanobis outliers (diagonal covariance)
# ---------------------------------------------------------------------------


def test_mahalanobis_matches_definition(con):
    """Per-label diagonal Mahalanobis D^2 recomputed from the raw
    vectors with the population-variance definition, replicating the
    component snap and per-dim term snap."""
    data = defaultdict(list)
    for vid, emb, lab in con.execute(
        "SELECT vec_id, embedding, label FROM embeddings"
    ).fetchall():
        data[lab].append((int(vid), [math.floor(x * 1e6 + 0.5)
                                     for x in emb]))
    got = con.execute(_oracle("embedding_mahalanobis_outliers")).fetchall()
    by_label = defaultdict(list)
    for lab, vid, d2, rnk in got:
        by_label[lab].append((rnk, vid, d2))
    for lab, rows in data.items():
        n = len(rows)
        dims = len(rows[0][1])
        d2s = []
        for vid, xs in rows:
            tot = 0
            for d in range(dims):
                s = sum(r[1][d] for r in rows)
                ss = sum(r[1][d] ** 2 for r in rows)
                den = n * ss - s * s
                if den > 0:
                    tot += math.floor(
                        float(n * xs[d] - s) ** 2 / float(den) * 1e6 + 0.5
                    )
            d2s.append((-tot, vid))
        d2s.sort()
        want = [(i + 1, vid, _snap(-t / 1e6)) for i, (t, vid)
                in enumerate(d2s[:5])]
        assert by_label[lab] == want, lab


# ---------------------------------------------------------------------------
# Erlang C (Erlang 1917; standard M/M/c queueing formulas)
# ---------------------------------------------------------------------------


def test_erlang_staffing_matches_queueing_formulas(con):
    """P_wait / Lq / Wq recomputed with the plain Erlang-C formula
    from the peak-hour count."""
    (n_peak,) = con.execute(
        "SELECT max(n) FROM (SELECT count(*) AS n FROM events"
        " GROUP BY date_trunc('hour', ts))"
    ).fetchone()
    lam = n_peak / 3600
    a = n_peak / 1800  # mu = 0.5/s
    c_lo = (n_peak + 1800) // 1800
    got = con.execute(_oracle("events_erlang_staffing")).fetchall()
    assert [r[0] for r in got] == list(range(c_lo, c_lo + 10))
    prev_wq = float("inf")
    for c, g_peak, g_a, g_rho, g_pw, g_lq, g_wq, ok in got:
        assert g_peak == n_peak
        rho = a / c
        head = sum(a**k / math.factorial(k) for k in range(c))
        tail = a**c / math.factorial(c)
        pw = tail / ((1 - rho) * head + tail)
        lq = pw * rho / (1 - rho)
        wq = lq / lam
        assert abs(g_a - a) < 2e-6 and abs(g_rho - rho) < 2e-6
        assert abs(g_pw - pw) < 1e-5, c
        assert abs(g_lq - lq) < 1e-4, c
        assert abs(g_wq - wq) < 1e-3, c
        assert ok == (1 if g_wq < 1.0 else 0)
        assert g_wq <= prev_wq  # more servers never wait longer
        prev_wq = g_wq


# ---------------------------------------------------------------------------
# Spectral entropy / flatness (Shannon entropy of the power spectrum)
# ---------------------------------------------------------------------------


def test_spectral_entropy_matches_definition(con):
    """Entropy and flatness recomputed from the oracle-checked
    periodogram's own power column — the two queries must agree on
    the spectrum, and the scalars must match the plain formulas."""
    pgram = con.execute(_oracle("events_periodogram_periods")).fetchall()
    powers = {k: p for k, p, _ in pgram}
    tot = sum(math.floor(p * 1e6 + 0.5) for p in powers.values()) / 1e6
    shares = [_snap(p / tot) for p in powers.values()]
    h = sum(math.floor(-p * math.log(p) * 1e6 + 0.5)
            for p in shares if p > 0) / 1e6
    lsum = sum(math.floor(math.log(p) * 1e6 + 0.5)
               for p in shares if p > 0) / 1e6
    psum = sum(math.floor(p * 1e6 + 0.5) for p in shares if p > 0) / 1e6
    npos = sum(1 for p in shares if p > 0)
    (n_periods, dom, g_h, g_hn, g_flat) = con.execute(
        _oracle("events_spectral_entropy")
    ).fetchone()
    assert n_periods == len(pgram) == 13
    assert dom == max(powers, key=lambda k: (powers[k], -k))
    assert abs(g_h - h) < 2e-6
    assert abs(g_hn - h / math.log(13)) < 2e-6
    assert abs(g_flat - math.exp(lsum / npos) / (psum / npos)) < 2e-5
    assert 0 < g_hn <= 1 and 0 < g_flat <= 1


# ---------------------------------------------------------------------------
# Bass diffusion (Bass 1969, discrete-form OLS)
# ---------------------------------------------------------------------------


def test_bass_matches_two_regressor_ols(con):
    """The Cramer solution and the p/q/M inversion recomputed from the
    raw daily first-order counts with plain normal equations."""
    rows = con.execute(
        "WITH f AS (SELECT min(o_orderdate) AS fd FROM orders"
        " GROUP BY o_custkey)"
        " SELECT CAST(fd AS DATE), count(*) FROM f GROUP BY 1 ORDER BY 1"
    ).fetchall()
    pts, cum = [], 0
    for _, n in rows:
        pts.append((float(cum), float(cum) ** 2, float(n)))
        cum += int(n)
    n = len(pts)
    s1 = sum(x1 for x1, _, _ in pts)
    s2 = sum(x2 for _, x2, _ in pts)
    sy = sum(y for _, _, y in pts)
    s11 = sum(x1 * x1 for x1, _, _ in pts)
    s12 = sum(x1 * x2 for x1, x2, _ in pts)
    s22 = sum(x2 * x2 for _, x2, _ in pts)
    s1y = sum(x1 * y for x1, _, y in pts)
    s2y = sum(x2 * y for _, x2, y in pts)
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    ca = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y)) / det
    cb = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2)) / det
    cc = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2)) / det
    (n_days, g_a, g_b, g_c, g_m, g_p, g_q, g_peak, regime, r2) = \
        con.execute(_oracle("orders_bass_diffusion")).fetchone()
    assert n_days == n
    assert abs(g_a - ca) < 1e-4 * max(1.0, abs(ca))
    assert abs(g_b - cb) < 1e-5
    assert abs(g_c - cc) < 1e-8
    if cc < 0 and cb * cb - 4 * cc * ca >= 0:
        m = (-cb - math.sqrt(cb * cb - 4 * cc * ca)) / (2 * cc)
        assert abs(g_m - m) < 1e-2 * max(1.0, abs(m))
        p, q = _snap(ca / m), _snap(-cc * m)
        assert abs(g_p - p) < 2e-6 and abs(g_q - q) < 2e-6
        if p > 0 and q > 0:
            assert abs(g_peak - math.log(q / p) / (p + q)) < 1e-3
        else:
            assert g_peak is None
        assert regime == (1 if q > p > 0 else 0)
    else:
        assert g_m is None and g_peak is None
    assert 0 <= r2 <= 1


# ---------------------------------------------------------------------------
# Yule's K / Herdan's C (Yule 1944; Herdan 1960)
# ---------------------------------------------------------------------------


def test_yule_herdan_match_frequency_spectrum(con):
    """K and C recomputed from the raw term-frequency list."""
    counts = [
        int(c)
        for (c,) in con.execute(
            "SELECT count(*) FROM (SELECT unnest("
            "regexp_extract_all(text, '[a-z]+')) AS w FROM documents)"
            " GROUP BY w"
        ).fetchall()
    ]
    n = sum(counts)
    v = len(counts)
    m2 = sum(c * c for c in counts)
    (g_n, g_v, g_k, g_c, g_rr) = con.execute(
        _oracle("text_yule_k_herdan")
    ).fetchone()
    assert (g_n, g_v) == (n, v)
    assert abs(g_k - 1e4 * (m2 - n) / n**2) < 2e-6
    assert abs(g_c - math.log(v) / math.log(n)) < 2e-6
    assert abs(g_rr - m2 / n**2) < 2e-6
    assert 0 < g_c < 1  # vocabulary grows sublinearly in tokens


# ---------------------------------------------------------------------------
# Feature-hashing collision audit (Weinberger et al. 2009)
# ---------------------------------------------------------------------------


def test_feature_hashing_matches_direct_assignment(con):
    """Bucket stats recomputed by hashing every term in Python with
    the same sha-derived assignment."""
    import hashlib

    terms = con.execute(
        "SELECT w, count(*) FROM (SELECT unnest("
        "regexp_extract_all(text, '[a-z]+')) AS w FROM documents)"
        " GROUP BY w"
    ).fetchall()
    buckets = defaultdict(lambda: [0, 0])
    for w, occ in terms:
        b = int(hashlib.sha256(f"fh{w}".encode()).hexdigest()[:15],
                16) % 4096
        buckets[b][0] += 1
        buckets[b][1] += int(occ)
    vocab = len(terms)
    n_tokens = sum(int(o) for _, o in terms)
    used = len(buckets)
    max_terms = max(k for k, _ in buckets.values())
    coll_terms = sum(k for k, _ in buckets.values() if k >= 2)
    coll_occ = sum(o for k, o in buckets.values() if k >= 2)
    (g_v, g_b, g_used, g_exp, g_max, g_ct, g_cts, g_cos) = con.execute(
        _oracle("feature_hashing_collisions")
    ).fetchone()
    assert (g_v, g_b, g_used, g_max, g_ct) == (
        vocab, 4096, used, max_terms, coll_terms
    )
    exp_used = 4096 * (1 - (1 - 1 / 4096) ** vocab)
    assert abs(g_exp - exp_used) < 1e-2 * max(1.0, exp_used)
    assert g_cts == _snap(coll_terms / vocab)
    assert g_cos == _snap(coll_occ / n_tokens)
    assert used <= min(vocab, 4096)


# ---------------------------------------------------------------------------
# Fairness audit (disparate impact / 80% rule; equalized odds)
# ---------------------------------------------------------------------------


def test_fairness_matches_per_source_rates(con):
    """Keep rates, DI ratio, and TPR/FPR recomputed per source from
    the per-document (score, label, source) triples."""
    from automated_data_pipeline_python_spark.queries.curation2 import (
        _FEATS_DUCK_HEADER,
        _SCORE_EXPR,
    )

    rows = con.execute(f"""{_FEATS_DUCK_HEADER},
ratios AS (
    SELECT doc_id,
           CAST(n_uniq AS DOUBLE) / n_tok AS uniq_ratio,
           CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
           CAST(sum_len AS DOUBLE) / n_tok AS mean_len
    FROM feats
),
scored AS (
    SELECT r.doc_id, {_SCORE_EXPR},
           CASE WHEN f.n_tok >= 20 AND f.n_tok <= 100000
                 AND floor((CAST(f.sum_len AS DOUBLE) / f.n_tok) * 1e6 + 0.5)
                     / 1e6 BETWEEN 3e0 AND 10e0
                 AND floor((CAST(f.n_stop AS DOUBLE) / f.n_tok) * 1e6 + 0.5)
                     / 1e6 >= 5e-2
                 AND floor((CAST(f.n_uniq AS DOUBLE) / f.n_tok) * 1e6 + 0.5)
                     / 1e6 > 2e-1
                THEN 1 ELSE 0 END AS pos
    FROM ratios r JOIN feats f ON f.doc_id = r.doc_id
)
SELECT d.source, s.score, s.pos
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
""").fetchall()
    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, kept, pos, tp, fp
    for src, score, pos in rows:
        st = per[src]
        kept = score >= 0.5
        st[0] += 1
        st[1] += kept
        st[2] += pos
        st[3] += kept and pos
        st[4] += kept and not pos
    top = max(_snap(s[1] / s[0]) for s in per.values())
    got = con.execute(_oracle("quality_fairness_by_source")).fetchall()
    assert len(got) == len(per) == 20
    for src, n, kept, kr, tpr, fpr, di, ok in got:
        st = per[src]
        assert (n, kept) == (st[0], st[1])
        assert kr == _snap(st[1] / st[0])
        if st[2]:
            assert tpr == _snap(st[3] / st[2])
        if st[0] - st[2]:
            assert fpr == _snap(st[4] / (st[0] - st[2]))
        assert di == _snap(kr / top)
        assert ok == (1 if di >= 0.8 else 0)


# ---------------------------------------------------------------------------
# Price elasticity (log-log OLS)
# ---------------------------------------------------------------------------


def test_elasticity_matches_loglog_ols(con):
    """Per-brand slope recomputed from the raw (ln p, ln q) pairs with
    the SQL's term-snapping discipline."""
    data = defaultdict(list)
    for b, p, q in con.execute(
        "SELECT pt.p_brand, l.l_extendedprice / l.l_quantity,"
        " l.l_quantity FROM lineitem l"
        " JOIN part pt ON l.l_partkey = pt.p_partkey"
        " WHERE l.l_quantity > 0 AND l.l_extendedprice > 0"
    ).fetchall():
        data[b].append((math.log(p), math.log(q)))
    got = {r[0]: r[1:] for r in con.execute(
        _oracle("lineitem_price_elasticity")
    ).fetchall()}
    assert len(got) == len(data) >= 20
    for b, pts in data.items():
        n = len(pts)
        sx = sum(math.floor(x * 1e6 + 0.5) for x, _ in pts) / 1e6
        sy = sum(math.floor(y * 1e6 + 0.5) for _, y in pts) / 1e6
        sxx = sum(math.floor(x * x * 1e6 + 0.5) for x, _ in pts) / 1e6
        syy = sum(math.floor(y * y * 1e6 + 0.5) for _, y in pts) / 1e6
        sxy = sum(math.floor(x * y * 1e6 + 0.5) for x, y in pts) / 1e6
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        g_n, g_e, g_r2, g_cls = got[b]
        assert g_n == n
        assert abs(g_e - slope) < 2e-6, b
        assert abs(g_r2 - r2) < 2e-6, b
        assert g_cls == ("elastic" if abs(_snap(slope)) > 1 else
                         "inelastic"), b


# ---------------------------------------------------------------------------
# Neyman allocation (Neyman 1934; largest-remainder rounding)
# ---------------------------------------------------------------------------


def test_neyman_matches_optimal_allocation(con):
    """Shares and the integer split recomputed from raw cents."""
    strata = defaultdict(list)
    for et, c in con.execute(
        "SELECT event_type, CAST(floor(value * 1e2 + 0.5) AS BIGINT)"
        " FROM events WHERE value IS NOT NULL"
    ).fetchall():
        strata[et].append(int(c))
    w = {}
    for et, xs in strata.items():
        n = len(xs)
        m = sum(xs) / n
        sd = math.sqrt(sum((x - m) ** 2 for x in xs) / (n - 1)) / 1e2
        w[et] = (n, sd, n * sd)
    wsum = sum(v[2] for v in w.values())
    raw = {et: 10_000 * v[2] / wsum for et, v in w.items()}
    floors = {et: math.floor(r) for et, r in raw.items()}
    extra = 10_000 - sum(floors.values())
    order = sorted(raw, key=lambda et: (-_snap(raw[et] - floors[et]), et))
    alloc = {et: floors[et] + (1 if i < extra else 0)
             for i, et in enumerate(order)}
    got = con.execute(_oracle("sample_neyman_allocation")).fetchall()
    assert len(got) == len(w)
    n_total = sum(v[0] for v in w.values())
    for et, nh, g_sd, g_share, g_prop, g_alloc, over in got:
        assert nh == w[et][0]
        assert abs(g_sd - w[et][1]) < 2e-6
        assert g_share == _snap(w[et][2] / wsum)
        assert g_prop == _snap(w[et][0] / n_total)
        assert g_alloc == alloc[et], et
        assert over == (1 if g_share > g_prop else 0)
    assert sum(r[5] for r in got) == 10_000  # budget exactly spent


# ---------------------------------------------------------------------------
# Burstiness / memory (Goh & Barabasi 2008)
# ---------------------------------------------------------------------------


def test_burstiness_memory_match_definitions(con):
    """B and M recomputed from the raw same-user gap sequences."""
    seqs = defaultdict(list)
    for et, uid, g in con.execute(
        "WITH o AS (SELECT user_id, event_type, ts, event_id,"
        " date_diff('microsecond', lag(ts) OVER ("
        "   PARTITION BY user_id, event_type ORDER BY ts, event_id),"
        " ts) AS g FROM events)"
        " SELECT event_type, user_id, g FROM o WHERE g IS NOT NULL"
        " ORDER BY event_type, user_id, ts, event_id"
    ).fetchall():
        seqs[et, uid].append(int(g))
    by_type = defaultdict(lambda: ([], []))
    for (et, _), gs in seqs.items():
        by_type[et][0].extend(gs)
        by_type[et][1].extend(zip(gs, gs[1:]))
    got = con.execute(_oracle("events_burstiness_memory")).fetchall()
    assert len(got) == len(by_type) == 5
    for et, n, np_, mean_s, b, m in got:
        gaps, pairs = by_type[et]
        assert (n, np_) == (len(gaps), len(pairs))
        mu = sum(gaps) / len(gaps)
        sd = math.sqrt(sum((g - mu) ** 2 for g in gaps)
                       / (len(gaps) - 1))
        assert abs(mean_s - mu / 1e6) < 2e-6
        assert abs(b - (sd - mu) / (sd + mu)) < 2e-6, et
        k = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        m_ref = (k * sxy - sx * sy) / (
            math.sqrt(k * sxx - sx * sx) * math.sqrt(k * syy - sy * sy)
        )
        assert abs(m - m_ref) < 2e-6, et
        assert -1 <= b <= 1 and -1 <= m <= 1


# ---------------------------------------------------------------------------
# Switchback analysis (block-randomized Welch t)
# ---------------------------------------------------------------------------


def test_switchback_matches_block_welch(con):
    """Block means, effect, t, and df recomputed from raw hourly
    block revenues with the same sha assignment."""
    import hashlib

    blocks = con.execute(
        "SELECT CAST(date_trunc('hour', ts) AS STRING),"
        " sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))"
        " FROM events WHERE event_type = 'purchase'"
        " AND value IS NOT NULL GROUP BY 1"
    ).fetchall()
    arms = defaultdict(list)
    for blk, cents in blocks:
        h = int(hashlib.sha256(f"sb{blk}".encode()).hexdigest()[:7], 16)
        arms[h % 2].append(int(cents) / 1e2)

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    n_c, m_c, v_c = stats(arms[0])
    n_t, m_t, v_t = stats(arms[1])
    se2 = v_c / n_c + v_t / n_t
    t = (m_t - m_c) / math.sqrt(se2)
    df = se2**2 / ((v_c / n_c) ** 2 / (n_c - 1)
                   + (v_t / n_t) ** 2 / (n_t - 1))
    (g_nc, g_nt, g_mc, g_mt, g_eff, g_t, g_df, p) = con.execute(
        _oracle("events_switchback_lift")
    ).fetchone()
    assert (g_nc, g_nt) == (n_c, n_t)
    assert abs(g_mc - m_c) < 2e-6 and abs(g_mt - m_t) < 2e-6
    assert abs(g_eff - (m_t - m_c)) < 2e-6
    assert abs(g_t - t) < 2e-6
    assert abs(g_df - df) < 2e-2
    p_ref = 2 * (1 - 0.5 * math.erfc(-abs(g_t) / math.sqrt(2)))
    assert abs(p - p_ref) < 1e-5
    assert g_df <= n_c + n_t - 2  # Welch df never exceeds pooled df


# ---------------------------------------------------------------------------
# MASE ladder (Hyndman & Koehler 2006)
# ---------------------------------------------------------------------------


def test_mase_ladder_matches_walk_forward(con):
    """MAE/sMAPE/MASE for both baselines recomputed from the raw
    daily series."""
    daily = defaultdict(dict)
    for et, d, n in con.execute(
        "SELECT event_type, CAST(ts AS DATE), count(*) FROM events"
        " GROUP BY 1, 2"
    ).fetchall():
        daily[et][d] = int(n)
    got = {(r[0], r[1]): r[2:] for r in con.execute(
        _oracle("events_forecast_mase_ladder")
    ).fetchall()}
    from datetime import timedelta

    for et, series in daily.items():
        naive_mae = None
        for base, lag in (("naive", 1), ("seasonal_naive", 7)):
            errs, smapes = [], []
            for d, y in series.items():
                prev = series.get(d - timedelta(days=lag))
                if prev is not None:
                    errs.append(abs(y - prev))
                    smapes.append(
                        math.floor(2 * abs(y - prev) / (y + prev)
                                   * 1e6 + 0.5) / 1e6
                        if y + prev > 0 else 0.0
                    )
            mae = sum(errs) / len(errs)
            if base == "naive":
                naive_mae = mae
            n_f, g_mae, g_smape, g_mase = got[(et, base)]
            assert n_f == len(errs), (et, base)
            assert abs(g_mae - mae) < 2e-6
            assert abs(g_smape - sum(smapes) / len(smapes)) < 2e-6
            assert abs(g_mase - mae / naive_mae) < 2e-6, (et, base)
        # naive's own MASE is 1 by construction
        assert got[(et, "naive")][3] == 1.0


# ---------------------------------------------------------------------------
# Cluster-label purity (external validity index)
# ---------------------------------------------------------------------------


def test_label_purity_matches_assignment(con):
    """Purity/entropy recomputed from the same snapped Lloyd
    assignment the Davies-Bouldin reference test replicates."""
    vecs = {}
    labels = {}
    for vid, emb, lab in con.execute(
        "SELECT vec_id, embedding, label FROM embeddings"
    ).fetchall():
        vecs[int(vid)] = [float(x) for x in emb]
        labels[int(vid)] = int(lab)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm2 = {i: dot(v, v) for i, v in vecs.items()}
    cells = {i: vecs[i] for i in sorted(vecs) if i < 8}
    cnrm2 = {i: nrm2[i] for i in cells}
    members = defaultdict(list)
    for i, v in vecs.items():
        best = min(
            (_snap(nrm2[i] - 2 * dot(v, c) + cnrm2[j]), j)
            for j, c in cells.items()
        )
        members[best[1]].append(labels[i])
    got = con.execute(_oracle("clustering_label_purity")).fetchall()
    assert [r[0] for r in got] == sorted(members)
    tot_maj = sum(
        max(sum(1 for x in labs if x == l) for l in set(labs))
        for labs in members.values()
    )
    overall = _snap(tot_maj / sum(len(v) for v in members.values()))
    for cell, n, maj, purity, ent, g_overall in got:
        labs = members[cell]
        counts = defaultdict(int)
        for x in labs:
            counts[x] += 1
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        assert n == len(labs)
        assert maj == best[0]
        assert purity == _snap(best[1] / n)
        h = sum(math.floor(-(c / n) * math.log(c / n) * 1e6 + 0.5)
                for c in counts.values()) / 1e6
        assert abs(ent - h) < 1e-9, cell
        assert g_overall == overall


# ---------------------------------------------------------------------------
# Seasonal / trend strength (Hyndman tsfeatures)
# ---------------------------------------------------------------------------


def test_seasonal_strength_matches_stl_rows(con):
    """F_s / F_t recomputed from the oracle-checked STL query's own
    rows with the plain variance-ratio formulas."""
    rows = con.execute(_oracle("events_stl_decomposition")).fetchall()
    full = [(t, s, r) for _, _, t, s, r in rows if r is not None]

    def var(xs):
        n = len(xs)
        # replicate the SQL's snapped-term exact sums
        sx = sum(math.floor(x * 1e6 + 0.5) for x in xs) / 1e6
        sxx = sum(math.floor(x * x * 1e6 + 0.5) for x in xs) / 1e6
        return (n * sxx - sx * sx) / (n * n)

    v_r = var([r for _, _, r in full])
    v_sr = var([s + r for _, s, r in full])
    v_tr = var([t + r for t, _, r in full])
    (n_days, f_s, f_t, rem_sd) = con.execute(
        _oracle("events_seasonal_strength")
    ).fetchone()
    assert n_days == len(full)
    assert abs(f_s - max(0.0, 1 - v_r / v_sr)) < 2e-6
    assert abs(f_t - max(0.0, 1 - v_r / v_tr)) < 2e-6
    assert abs(rem_sd - math.sqrt(v_r)) < 2e-6
    assert 0 <= f_s <= 1 and 0 <= f_t <= 1


# ---------------------------------------------------------------------------
# Kendall tau-b (Kendall 1945, tie-corrected)
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_pairwise_definition(con):
    """tau-b recomputed by brute-force O(cells^2) concordance over the
    (decile, verdict) counts, and cross-checked against the
    calibration query's own decile populations."""
    calib = con.execute(_oracle("quality_calibration_bins")).fetchall()
    # joint cells from the calibration rollup: per decile, pass/fail
    cells = []
    for decile, n_docs, _, n_pass, _ in calib:
        if n_pass:
            cells.append((decile, 1, int(n_pass)))
        if n_docs - n_pass:
            cells.append((decile, 0, int(n_docs - n_pass)))
    c = d = 0
    for x1, y1, n1 in cells:
        for x2, y2, n2 in cells:
            if x2 > x1 and y2 > y1:
                c += n1 * n2
            elif x2 > x1 and y2 < y1:
                d += n1 * n2
    n = sum(nn for _, _, nn in cells)
    n0 = n * (n - 1) // 2
    tx = defaultdict(int)
    ty = defaultdict(int)
    for x, y, nn in cells:
        tx[x] += nn
        ty[y] += nn
    n1_ = sum(t * (t - 1) // 2 for t in tx.values())
    n2_ = sum(t * (t - 1) // 2 for t in ty.values())
    tau = (c - d) / math.sqrt((n0 - n1_) * (n0 - n2_))
    (n_docs, g_c, g_d, g_tau, g_gamma) = con.execute(
        _oracle("quality_raters_kendall_tau")
    ).fetchone()
    assert n_docs == n
    assert (g_c, g_d) == (c, d)
    assert abs(g_tau - tau) < 2e-6
    assert abs(g_gamma - (c - d) / (c + d)) < 2e-6
    assert abs(g_gamma) >= abs(g_tau)  # gamma ignores ties


# ---------------------------------------------------------------------------
# Tukey fences (Tukey 1977, Exploratory Data Analysis)
# ---------------------------------------------------------------------------


def test_tukey_fences_match_quartiles(con):
    """Fences and outlier counts recomputed from raw totals with
    linear-interpolated quartiles."""
    vals = defaultdict(list)
    for pr, v in con.execute(
        "SELECT o_orderpriority, o_totalprice FROM orders"
    ).fetchall():
        vals[pr].append(float(v))

    def quantile(xs, q):
        s = sorted(xs)
        pos = (len(s) - 1) * q
        lo = math.floor(pos)
        frac = pos - lo
        return s[lo] if frac == 0 else s[lo] * (1 - frac) + s[lo + 1] * frac

    got = con.execute(_oracle("dq_tukey_fences")).fetchall()
    assert len(got) == len(vals) == 5
    for pr, n, q1, q3, iqr, lo, hi, n_out, share, worst in got:
        xs = vals[pr]
        assert n == len(xs)
        rq1, rq3 = _snap(quantile(xs, 0.25)), _snap(quantile(xs, 0.75))
        assert abs(q1 - rq1) < 2e-6 and abs(q3 - rq3) < 2e-6
        assert iqr == _snap(q3 - q1)
        assert lo == _snap(q1 - 1.5 * (q3 - q1))
        assert hi == _snap(q3 + 1.5 * (q3 - q1))
        out = [x for x in xs if x < lo or x > hi]
        assert n_out == len(out)
        assert share == _snap(len(out) / len(xs))
        highs = [x for x in out if x > hi]
        assert worst == (max(highs) if highs else None)
