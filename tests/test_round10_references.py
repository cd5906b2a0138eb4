"""Textbook-reference cross-checks for the round-9 stats tail
(VERDICT r9 task 7 — the forward extension of the r8/r9 pattern).

The oracle-parity suite proves Spark == DuckDB; these tests close the
remaining blind spot by proving the DuckDB oracle == an independent
pure-Python reimplementation of the textbook algorithm, for the most
intricate round-9 folds: the DeLong placement-variance AUC CI (DeLong
et al. 1988), the Ljung-Box portmanteau Q (Ljung & Box 1978), the
Pettitt rank changepoint (Pettitt 1979), the Gumbel block-maxima
method-of-moments fit (Gumbel 1958), the Erlang-B stable recursion
inside the Erlang-C staffing table (Erlang 1917), and Kendall's tau-b
with the full tie correction (Kendall 1945). Any shared SQL bug
mirrored on both engine sides would surface here. DuckDB-only — no
Spark session, so the whole module runs in seconds.

The Python paths are deliberately NAIVE — per-row placements instead
of the histogram-moment fold, O(n²) sign sums instead of the V_s
collapse, a literal loop instead of the SQL fold — so they share no
algebra with the SQL they check.

Snapping discipline: where the SQL snaps intermediates to a fixed grid
(floor(x * 1eD + 0.5) / 1eD), the Python reference replicates the snap
so recursions stay bit-comparable; where the SQL computes one final
float through transcendentals (exp/ln/sqrt), comparisons use the 2e-6
tolerance (one snap-grid step) like the round-8/9 modules.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from tests.conftest import SF_SMOKE

TABLES = ["events", "documents", "embeddings"]


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


def _daily_counts(con) -> list[int]:
    return [
        r[1]
        for r in con.execute(
            "SELECT CAST(ts AS DATE) AS d, count(*) FROM events"
            " GROUP BY 1 ORDER BY 1"
        ).fetchall()
    ]


def _daily_cents(con) -> list[tuple]:
    return con.execute(
        "SELECT CAST(ts AS DATE) AS d,"
        " CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)"
        " FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1"
    ).fetchall()


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau Q (Ljung & Box 1978)
# ---------------------------------------------------------------------------


def test_ljung_box_matches_textbook_acf(con):
    """r_k = sum_{t<=n-k}(x_t - m)(x_{t+k} - m) / sum(x_t - m)^2 with
    the FULL-series mean, Q(m) = n(n+2) sum_{k<=m} r_k^2/(n-k) —
    recomputed literally from the daily counts."""
    x = _daily_counts(con)
    n = len(x)
    m = sum(x) / n
    c0 = sum((v - m) ** 2 for v in x)
    r = {
        k: _snap(sum((x[t] - m) * (x[t + k] - m)
                     for t in range(n - k)) / c0)
        for k in range(1, 8)
    }
    crit = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
            5: 11.070498, 6: 12.591587, 7: 14.067140}
    rows = con.execute(_oracle("events_ljung_box_acf")).fetchall()
    assert len(rows) == 7
    for max_lag, n_days, acf, q_stat, chi_crit, reject in rows:
        assert n_days == n
        assert abs(acf - r[max_lag]) < 2e-6, max_lag
        q = _snap(n * (n + 2)
                  * sum(r[k] ** 2 / (n - k) for k in range(1, max_lag + 1)))
        assert abs(q_stat - q) < 2e-6, max_lag
        assert chi_crit == crit[max_lag]
        assert reject == (1 if q > crit[max_lag] else 0)


# ---------------------------------------------------------------------------
# Pettitt rank changepoint (Pettitt 1979)
# ---------------------------------------------------------------------------


def test_pettitt_matches_quadratic_sign_sum(con):
    """U_t = sum_{i<=t, j>t} sgn(x_i - x_j) recomputed as the literal
    O(n^2) double loop (the SQL uses the V_s antisymmetry collapse —
    different algebra, same statistic)."""
    daily = _daily_cents(con)
    days = [d for d, _ in daily]
    x = [c for _, c in daily]
    n = len(x)

    def sgn(a, b):
        return (a > b) - (a < b)

    best_k, best_u, best_d = -1, None, None
    for t in range(n - 1):  # split AFTER index t; excludes the last day
        u = sum(sgn(x[i], x[j])
                for i in range(t + 1) for j in range(t + 1, n))
        if u is not None and (abs(u) > best_k
                              or (abs(u) == best_k and days[t] < best_d)):
            best_k, best_u, best_d = abs(u), u, days[t]
    p = _snap(2.0 * math.exp(-6.0 * best_k * best_k
                             / (float(n) * n * n + float(n) * n)))
    rows = con.execute(_oracle("events_pettitt_changepoint")).fetchall()
    assert len(rows) == 1
    change_date, k_stat, u_at_k, n_days, p_approx, significant = rows[0]
    assert n_days == n
    assert k_stat == best_k
    assert u_at_k == best_u
    assert change_date == best_d.strftime("%Y-%m-%d")
    assert abs(p_approx - p) < 2e-6
    assert significant == (1 if p < 0.05 else 0)


# ---------------------------------------------------------------------------
# Gumbel block-maxima fit (Gumbel 1958, method of moments)
# ---------------------------------------------------------------------------


def test_gumbel_matches_method_of_moments(con):
    """beta = sd*sqrt(6)/pi, mu = mean - gamma*beta, return level
    z_T = mu - beta*ln(-ln(1 - 1/T)) — from the daily cents maxima."""
    maxima = [
        r[1]
        for r in con.execute(
            "SELECT CAST(ts AS DATE),"
            " CAST(max(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)"
            " FROM events WHERE value IS NOT NULL GROUP BY 1"
        ).fetchall()
    ]
    n = len(maxima)
    mean = sum(maxima) / n / 1e2
    var = (n * sum(v * v for v in maxima) - sum(maxima) ** 2) / (n * (n - 1))
    sd = math.sqrt(var) / 1e2
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rows = con.execute(_oracle("events_gumbel_block_maxima")).fetchall()
    assert [r[0] for r in rows] == [7, 30, 365]
    for horizon, n_blocks, g_mu, g_beta, level in rows:
        assert n_blocks == n
        assert abs(g_mu - _snap(mu)) < 2e-6
        assert abs(g_beta - _snap(beta)) < 2e-6
        want = _snap(mu - beta * math.log(-math.log(1.0 - 1.0 / horizon)))
        assert abs(level - want) < 2e-6, horizon


# ---------------------------------------------------------------------------
# Erlang-C staffing off the stable Erlang-B recursion (Erlang 1917)
# ---------------------------------------------------------------------------


def test_erlang_staffing_matches_literal_recursion(con):
    """B(j) = a*B(j-1)/(j + a*B(j-1)) folded j=1..c (with the SQL's
    per-step 1e-12 snap), C = B/(1 - rho(1-B)), Lq = C*rho/(1-rho),
    Wq = Lq/lambda — recomputed as a literal Python loop."""
    n_peak = con.execute(
        "SELECT max(n) FROM (SELECT count(*) AS n FROM events"
        " GROUP BY date_trunc('hour', ts))"
    ).fetchone()[0]
    a = n_peak / 18e2
    c_lo = (n_peak + 1800) // 1800
    rows = con.execute(_oracle("events_erlang_staffing")).fetchall()
    assert [r[0] for r in rows] == [c_lo + i for i in range(10)]
    for (c, peak, load, util, p_wait, lq, wq, meets) in rows:
        assert peak == n_peak
        rho = a / c
        b = 1.0
        for j in range(1, c + 1):
            b = math.floor(a * b / (j + a * b) * 1e12 + 0.5) / 1e12
        erlang_c = b / (1.0 - rho * (1.0 - b))
        assert abs(load - _snap(a)) < 2e-6
        assert abs(util - _snap(rho)) < 2e-6
        assert abs(p_wait - _snap(erlang_c)) < 2e-6, c
        want_lq = erlang_c * rho / (1.0 - rho)
        assert abs(lq - _snap(want_lq)) < 2e-6, c
        want_wq = want_lq / (n_peak / 36e2)
        assert abs(wq - _snap(want_wq)) < 2e-6, c
        assert meets == (1 if _snap(want_wq) < 1.0 else 0)


# ---------------------------------------------------------------------------
# Shared document featurization (whitespace tokens, Gopher rules)
# ---------------------------------------------------------------------------


def _doc_feats(con) -> list[tuple[float, int]]:
    """(snapped logistic score, gopher_pass) per document, computed in
    pure Python from the raw text — independent of both engines'
    tokenize/aggregate paths."""
    out = []
    for (text,) in con.execute("SELECT text FROM documents").fetchall():
        toks = text.strip().split()
        n_tok = len(toks)
        n_uniq = len(set(toks))
        n_stop = sum(1 for t in toks if t in ("a", "the"))
        sum_len = sum(len(t) for t in toks)
        uniq_ratio = n_uniq / n_tok
        stop_ratio = n_stop / n_tok
        mean_len = sum_len / n_tok
        z = (-1.5 + 2.5 * uniq_ratio - 4.0 * stop_ratio
             + 0.5 * (mean_len - 4.0) - 0.005 * n_tok)
        score = _snap(1.0 / (1.0 + math.exp(-z)))
        gopher = int(
            20 <= n_tok <= 100000
            and 3.0 <= _snap(mean_len) <= 10.0
            and _snap(stop_ratio) >= 0.05
            and _snap(uniq_ratio) > 0.2
        )
        out.append((score, gopher))
    return out


# ---------------------------------------------------------------------------
# DeLong AUC variance (DeLong, DeLong & Clarke-Pearson 1988)
# ---------------------------------------------------------------------------


def test_delong_matches_per_row_placements(con):
    """V10_i = (#neg below + 0.5*#neg tied)/n per POSITIVE, V01_j
    mirrored per NEGATIVE; AUC = mean(V10), var = S10/m + S01/n with
    the usual (m-1)/(n-1) sample variances — recomputed per-row (the
    SQL uses histogram-cell moment sums; different algebra)."""
    feats = _doc_feats(con)
    pos = sorted(s for s, g in feats if g == 1)
    neg = sorted(s for s, g in feats if g == 0)
    m, n = len(pos), len(neg)
    assert m >= 2 and n >= 2
    neg_counter = Counter(neg)
    neg_sorted = sorted(neg_counter)
    pos_counter = Counter(pos)
    pos_sorted = sorted(pos_counter)

    def placements(points, other_sorted, other_counter, total, greater):
        """V(x) = P(other < x) + 0.5*P(other == x); `greater` flips
        the direction for the negative-side placements."""
        vals = []
        for x in points:
            below = sum(other_counter[o] for o in other_sorted
                        if (o < x if not greater else o > x))
            tied = other_counter.get(x, 0)
            vals.append((below + 0.5 * tied) / total)
        return vals

    v10 = placements(pos, neg_sorted, neg_counter, n, greater=False)
    v01 = placements(neg, pos_sorted, pos_counter, m, greater=True)
    auc = sum(v10) / m
    auc_b = sum(v01) / n  # consistency: both directions give the AUC
    assert abs(auc - auc_b) < 1e-9
    s10 = sum((v - auc) ** 2 for v in v10) / (m - 1)
    s01 = sum((v - auc) ** 2 for v in v01) / (n - 1)
    se = math.sqrt(s10 / m + s01 / n)
    rows = con.execute(_oracle("quality_auc_delong_ci")).fetchall()
    assert len(rows) == 1
    n_pos, n_neg, g_auc, g_se, lo, hi, z = rows[0]
    assert (n_pos, n_neg) == (m, n)
    assert abs(g_auc - _snap(auc)) < 2e-6
    assert abs(g_se - _snap(se)) < 2e-6
    assert abs(lo - _snap(auc - 1.96 * se)) < 4e-6
    assert abs(hi - _snap(auc + 1.96 * se)) < 4e-6
    assert abs(z - _snap((auc - 0.5) / se)) < 2e-6


# ---------------------------------------------------------------------------
# Kendall tau-b with ties (Kendall 1945) + Goodman-Kruskal gamma
# ---------------------------------------------------------------------------


def test_kendall_tau_b_matches_pairwise_definition(con):
    """tau_b = (C - D)/sqrt((n0 - n1)(n0 - n2)) over (score decile,
    gopher verdict) — C/D/tie terms recomputed from the cell grid by
    the literal pairwise definition."""
    feats = _doc_feats(con)
    n = len(feats)
    # decile off the distinct-score CDF by integer ceil-division,
    # exactly as quality_calibration_bins defines buckets
    hist = Counter(s for s, _ in feats)
    cum, decile_of = 0, {}
    for s in sorted(hist):
        cum += hist[s]
        decile_of[s] = (10 * cum + n - 1) // n
    cells = Counter((decile_of[s], g) for s, g in feats)
    keys = sorted(cells)
    c_pairs = d_pairs = 0
    for i, (xa, ya) in enumerate(keys):
        for xb, yb in keys:
            if xb > xa and yb > ya:
                c_pairs += cells[(xa, ya)] * cells[(xb, yb)]
            elif xb > xa and yb < ya:
                d_pairs += cells[(xa, ya)] * cells[(xb, yb)]
    tx = Counter()
    ty = Counter()
    for (xv, yv), cnt in cells.items():
        tx[xv] += cnt
        ty[yv] += cnt
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    tau = (c_pairs - d_pairs) / math.sqrt((n0 - n1) * (n0 - n2))
    gamma = (c_pairs - d_pairs) / (c_pairs + d_pairs)
    rows = con.execute(_oracle("quality_raters_kendall_tau")).fetchall()
    assert len(rows) == 1
    n_docs, concordant, discordant, g_tau, g_gamma = rows[0]
    assert n_docs == n
    assert concordant == c_pairs
    assert discordant == d_pairs
    assert abs(g_tau - _snap(tau)) < 2e-6
    assert abs(g_gamma - _snap(gamma)) < 2e-6


# ===========================================================================
# Round-10 operator cross-checks (same pattern, current round's folds):
# the most intricate new algebra — Welch-Satterthwaite, the JB central-
# moment identity, block R/S, Durbin-Levinson, the confusion battery,
# and pair-counting ARI — each recomputed naively in pure Python.
# ===========================================================================


def _hash28(s: str) -> int:
    import hashlib

    return int(hashlib.sha256(s.encode()).hexdigest()[:7], 16)


def test_welch_matches_two_sample_formula(con):
    """t and the Welch-Satterthwaite df recomputed from raw per-arm
    cents lists under the same sha-hash arm split."""
    rows = con.execute(
        "SELECT user_id, CAST(floor(value * 1e2 + 0.5) AS BIGINT)"
        " FROM events WHERE event_type = 'purchase'"
        " AND value IS NOT NULL"
    ).fetchall()
    arms = {0: [], 1: []}
    for uid, cents in rows:
        arms[_hash28(f"fx{uid}") % 2].append(cents)
    c, t = arms[0], arms[1]
    nc, nt = len(c), len(t)
    mc, mt = sum(c) / nc / 1e2, sum(t) / nt / 1e2
    vc = sum((x / 1e2 - mc) ** 2 for x in c) / (nc - 1)
    vt = sum((x / 1e2 - mt) ** 2 for x in t) / (nt - 1)
    se2 = vc / nc + vt / nt
    tstat = _snap((mt - mc) / math.sqrt(se2))
    df = se2 * se2 / ((vc / nc) ** 2 / (nc - 1) + (vt / nt) ** 2 / (nt - 1))
    got = con.execute(_oracle("events_welch_ttest")).fetchall()[0]
    g_nc, g_nt, g_mc, g_mt, _, _, g_t, g_df, g_p, g_rej = got
    assert (g_nc, g_nt) == (nc, nt)
    assert abs(g_mc - _snap(mc)) < 2e-6 and abs(g_mt - _snap(mt)) < 2e-6
    assert abs(g_t - tstat) < 4e-6
    assert abs(g_df - df) < 0.02
    # p-value from the same A&S polynomial (transcription check)
    z = abs(tstat)
    k = 1.0 / (1.0 + 0.2316419 * z)
    poly = k * (0.31938153 + k * (-0.356563782 + k * (1.781477937
               + k * (-1.821255978 + k * 1.330274429))))
    p = _snap(2.0 * 0.3989422804014327 * math.exp(-z * z / 2.0) * poly)
    assert abs(g_p - p) < 2e-6
    assert g_rej == (1 if p < 0.05 else 0)


def test_jarque_bera_matches_central_moments(con):
    """Skewness/kurtosis recomputed directly from the daily series
    (no shifted-moment identity — different algebra, same numbers)."""
    x = [c / 1.0 for _, c in _daily_cents(con)]
    n = len(x)
    m = sum(x) / n
    m2 = sum((v - m) ** 2 for v in x) / n
    m3 = sum((v - m) ** 3 for v in x) / n
    m4 = sum((v - m) ** 4 for v in x) / n
    skew = m3 / m2**1.5
    kurt = m4 / m2**2 - 3.0
    jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
    got = con.execute(_oracle("events_jarque_bera")).fetchall()[0]
    n_days, g_skew, g_kurt, g_jb, crit, rej = got
    assert n_days == n
    assert abs(g_skew - _snap(skew)) < 4e-6
    assert abs(g_kurt - _snap(kurt)) < 4e-6
    assert abs(g_jb - _snap(jb)) < 1e-3  # JB compounds two snapped squares
    assert rej == (1 if g_jb > 5.991465 else 0)


def test_hurst_matches_block_rs(con):
    """Per-block rescaled range recomputed with float cumulative
    deviations (the SQL uses exact m·W_k integers — different
    algebra)."""
    x = [c for c in _daily_counts(con)]
    n = len(x)
    ladder = {}
    for m in (8, 16, 32):
        rs_vals = []
        for b in range(n // m):
            blk = x[b * m : (b + 1) * m]
            mean = sum(blk) / m
            w, lo, hi = 0.0, 0.0, 0.0
            for v in blk:
                w += v - mean
                lo, hi = min(lo, w), max(hi, w)
            var = sum((v - mean) ** 2 for v in blk) / m
            if var > 0:
                rs_vals.append(_snap((hi - lo) / math.sqrt(var)))
        if rs_vals:
            s6 = sum(math.floor(v * 1e6 + 0.5) for v in rs_vals)
            ladder[m] = _snap(s6 / 1e6 / len(rs_vals))
    pts = [(math.log(m), math.log(r)) for m, r in ladder.items() if r > 0]
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    h = (k * sum(px * py for px, py in pts) - sx * sy) / (
        k * sum(px * px for px, _ in pts) - sx * sx)
    rows = con.execute(_oracle("events_hurst_rescaled_range")).fetchall()
    assert [r[0] for r in rows] == sorted(ladder)
    for m, n_blocks, rs_mean, hurst in rows:
        assert n_blocks == n // m
        assert abs(rs_mean - ladder[m]) < 2e-6, m
        assert abs(hurst - _snap(h)) < 4e-6


def test_pacf_matches_durbin_levinson(con):
    """ACF from the textbook definition, then the iterative DL
    recursion (the SQL hardcodes the closed forms)."""
    x = _daily_counts(con)
    n = len(x)
    m = sum(x) / n
    c0 = sum((v - m) ** 2 for v in x)
    r = {k: _snap(sum((x[t] - m) * (x[t + k] - m)
                      for t in range(n - k)) / c0)
         for k in (1, 2, 3)}
    # iterative Durbin-Levinson
    phi = {1: {1: r[1]}}
    for k in (2, 3):
        prev = phi[k - 1]
        num = r[k] - sum(prev[j] * r[k - j] for j in range(1, k))
        den = 1.0 - sum(prev[j] * r[j] for j in range(1, k))
        pkk = num / den
        phi[k] = {j: prev[j] - pkk * prev[k - j] for j in range(1, k)}
        phi[k][k] = pkk
    rows = con.execute(_oracle("events_pacf_durbin_levinson")).fetchall()
    band = _snap(1.96 / math.sqrt(n))
    for lag, n_days, acf, pacf, g_band, sig in rows:
        assert n_days == n
        assert abs(acf - r[lag]) < 2e-6
        assert abs(pacf - _snap(phi[lag][lag])) < 4e-6, lag
        assert g_band == band
        assert sig == (1 if abs(_snap(phi[lag][lag])) > band else 0)


def test_mcc_matches_confusion_definition(con):
    """The whole battery recomputed from per-doc (kept, truth) pairs."""
    feats = _doc_feats(con)
    tp = sum(1 for s, g in feats if s >= 0.5 and g == 1)
    fp = sum(1 for s, g in feats if s >= 0.5 and g == 0)
    fn = sum(1 for s, g in feats if s < 0.5 and g == 1)
    tn = sum(1 for s, g in feats if s < 0.5 and g == 0)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    got = con.execute(_oracle("quality_mcc_confusion")).fetchall()[0]
    g_tp, g_fp, g_fn, g_tn, prec, rec, f1, bacc, inf, g_mcc = got
    assert (g_tp, g_fp, g_fn, g_tn) == (tp, fp, fn, tn)
    assert abs(prec - _snap(tp / (tp + fp))) < 2e-6
    assert abs(rec - _snap(tp / (tp + fn))) < 2e-6
    assert abs(f1 - _snap(2 * tp / (2 * tp + fp + fn))) < 2e-6
    assert abs(bacc - _snap((tp / (tp + fn) + tn / (tn + fp)) / 2)) < 2e-6
    assert abs(inf - _snap(tp / (tp + fn) + tn / (tn + fp) - 1)) < 2e-6
    assert abs(g_mcc - _snap(mcc)) < 2e-6


def test_adjusted_rand_matches_pair_counting(con):
    """The Lloyd assignment replicated point-by-point (snapped
    distances, id tie-break), then ARI by the literal pair-counting
    definition."""
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[], label FROM embeddings"
    ).fetchall()
    vecs = {vid: (v, lab) for vid, v, lab in rows}
    cents = {vid: v for vid, (v, _) in vecs.items() if vid < 8}

    def d2(v, c):
        nv = sum(x * x for x in v)
        nc = sum(x * x for x in c)
        dot = sum(a * b for a, b in zip(v, c))
        return _snap(nv - 2 * dot + nc)

    assign = {}
    for vid, (v, lab) in vecs.items():
        best = min((d2(v, c), cell) for cell, c in cents.items())
        assign[vid] = (best[1], lab)
    cells = Counter(assign.values())
    n = len(assign)

    def c2(x):
        return x * (x - 1) // 2

    s_ij = sum(c2(v) for v in cells.values())
    a_tot = Counter()
    b_tot = Counter()
    for (cell, lab), cnt in cells.items():
        a_tot[cell] += cnt
        b_tot[lab] += cnt
    s_i = sum(c2(v) for v in a_tot.values())
    s_j = sum(c2(v) for v in b_tot.values())
    s_0 = c2(n)
    ari = (s_ij - s_i * s_j / s_0) / ((s_i + s_j) / 2 - s_i * s_j / s_0)
    ri = (s_0 + 2 * s_ij - s_i - s_j) / s_0
    got = con.execute(_oracle("clustering_adjusted_rand")).fetchall()[0]
    n_points, n_cells, n_labels, g_ari, g_ri = got
    assert n_points == n
    assert n_cells == len(a_tot) and n_labels == len(b_tot)
    assert abs(g_ari - _snap(ari)) < 2e-6
    assert abs(g_ri - _snap(ri)) < 2e-6
