"""Textbook-reference cross-checks for the remaining round-10 folds
(VERDICT r10 task 4 — the forward extension of the r8-r10 pattern).

The oracle-parity suite proves Spark == DuckDB; these tests close the
remaining blind spot by proving the DuckDB oracle == an independent
pure-Python reimplementation of the textbook algorithm, for the
round-10 operators test_round10_references.py did not yet cover:
Anderson-Darling with the Stephens factor (Anderson & Darling 1952;
Stephens 1974), Durbin-Watson on OLS residuals (Durbin & Watson 1950),
the theta(0,2) forecast backtest (Assimakopoulos & Nikolopoulos 2000),
weighted Slope One (Lemire & Maclachlan 2005), the credit-scoring KS
separation, cumulative gains/lift deciles, Hellinger + total-variation
source distances, the simplified silhouette (Hruschka et al. 2004),
log-loss + Brier, the Fisher index-of-dispersion Poisson gate (with
the r11 upper-tail flag semantics), and the repeat-purchase retention
ladder. Any shared SQL bug mirrored on both engine sides would surface
here. DuckDB-only — no Spark session, so the module runs in seconds.

The Python paths are deliberately NAIVE — literal loops and per-row
recomputation instead of the SQL's histogram/moment collapses — so
they share no algebra with the SQL they check.

Snapping discipline: where the SQL snaps intermediates to a fixed grid
(floor(x * 1eD + 0.5) / 1eD), the Python reference replicates the snap
so folds stay bit-comparable; where the SQL computes one final float
through transcendentals (exp/ln/sqrt), comparisons use the 2e-6
tolerance (one snap-grid step) like the round-8/9/10 modules.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.test_round10_references import (
    _daily_cents,
    _daily_counts,
    _doc_feats,
    _hash28,
    _oracle,
    _snap,
)

TABLES = ["events", "documents", "embeddings", "orders", "lineitem", "part"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return c


def _phi(z: float) -> float:
    """Standard normal CDF via the same A&S 26.2.17 polynomial the SQL
    transcribes (transcription check, not an independent erf)."""
    a = abs(z)
    k = 1.0 / (1.0 + 0.2316419 * a)
    poly = k * (0.31938153 + k * (-0.356563782 + k * (1.781477937
               + k * (-1.821255978 + k * 1.330274429))))
    upper = 0.3989422804014327 * math.exp(-a * a / 2.0) * poly  # 1 - Φ(a)
    return 1.0 - upper if z >= 0 else upper


def _two_sided_p(absz: float) -> float:
    return 2.0 * (1.0 - _phi(absz))


# ---------------------------------------------------------------------------
# Anderson-Darling with the Stephens small-sample factor
# ---------------------------------------------------------------------------


def test_anderson_darling_matches_sorted_sum(con):
    """A² = -n - (1/n)·Σ[(2i-1)·lnΦ(zᵢ) + (2(n-i)+1)·ln(1-Φ(zᵢ))] over
    the sorted standardized daily revenue, recomputed with a literal
    sorted loop (snap z → snap/clamp Φ → snap each summand)."""
    cents = [c for _, c in _daily_cents(con)]
    n = len(cents)
    s = sum(cents)
    ss = sum(c * c for c in cents)
    sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))
    zs = sorted(_snap((c - s / n) / sd) for c in cents)
    t6 = 0
    for i, z in enumerate(zs, start=1):
        ph = math.floor(_phi(z) * 1e12 + 0.5) / 1e12
        ph = min(max(ph, 1e-12), 1.0 - 1e-12)
        t6 += math.floor(((2 * i - 1) * math.log(ph)
                          + (2 * (n - i) + 1) * math.log(1.0 - ph))
                         * 1e6 + 0.5)
    a2_raw = -float(n) - t6 / 1e6 / n
    factor = 1.0 + 0.75 / n + 2.25 / (float(n) * n)
    rows = con.execute(_oracle("events_anderson_darling")).fetchall()
    assert len(rows) == 1
    n_days, a2, a2_star, crit, reject = rows[0]
    assert n_days == n
    assert abs(a2 - _snap(a2_raw)) < 2e-6
    assert abs(a2_star - _snap(a2_raw * factor)) < 2e-6
    assert crit == 0.752
    assert reject == (1 if _snap(a2_raw * factor) > 0.752 else 0)


# ---------------------------------------------------------------------------
# Durbin-Watson on OLS-detrended daily counts
# ---------------------------------------------------------------------------


def test_durbin_watson_matches_residual_loop(con):
    """OLS on the exact day index, snapped residuals, then the literal
    DW = Σ(eₜ-eₜ₋₁)²/Σeₜ² loop with per-term snapped squares."""
    daily = con.execute(
        "SELECT CAST(ts AS DATE) AS d, count(*) FROM events"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    d0 = daily[0][0]
    pts = [((d - d0).days, x) for d, x in daily]
    n = len(pts)
    st = sum(t for t, _ in pts)
    sx = sum(x for _, x in pts)
    stt = sum(t * t for t, _ in pts)
    stx = sum(t * x for t, x in pts)
    b = (n * stx - st * sx) / (n * stt - st * st)
    xbar, tbar = sx / n, st / n
    es = [_snap(x - (xbar + b * (t - tbar))) for t, x in pts]
    see6 = sum(math.floor(e * e * 1e6 + 0.5) for e in es)
    sdd6 = sum(
        math.floor((es[i] - es[i - 1]) ** 2 * 1e6 + 0.5)
        for i in range(1, n)
    )
    dw = _snap(sdd6 / see6)
    rows = con.execute(_oracle("events_durbin_watson")).fetchall()
    assert len(rows) == 1
    n_days, slope, dw_stat, rho, flag = rows[0]
    assert n_days == n
    assert abs(slope - _snap(b)) < 2e-6
    assert abs(dw_stat - dw) < 2e-6
    assert abs(rho - _snap(1.0 - sdd6 / see6 / 2.0)) < 2e-6
    assert flag == (1 if dw < 1.5 else 0)


# ---------------------------------------------------------------------------
# Theta(0,2) backtest: SES fold + trend extrapolation + MASE
# ---------------------------------------------------------------------------


def test_theta_forecast_matches_literal_fold(con):
    """SES level folded left-to-right with the per-step 1e-6 snap
    (alpha = 0.3), trend from exact integer moments, naive-scale MASE
    — the 7 held-out horizons recomputed literally."""
    daily = _daily_cents(con)
    cents = [c for _, c in daily]
    days = [d for d, _ in daily]
    n_all = len(cents)
    n = n_all - 7
    train = cents[:n]
    # trend from exact moments on i = 1..n
    st = sum(range(1, n + 1))
    sx = sum(train)
    stt = sum(i * i for i in range(1, n + 1))
    stx = sum(i * x for i, x in enumerate(train, start=1))
    b = (n * stx - st * sx) / (n * stt - st * st)
    xbar, tbar = sx / n, st / n
    # snapped SES fold, alpha = 0.3
    level = float(train[0])
    for v in train[1:]:
        level = _snap(0.3 * v + 0.7 * level)
    scale = sum(abs(train[i] - train[i - 1]) for i in range(1, n)) / (n - 1)
    rows = con.execute(_oracle("events_theta_forecast")).fetchall()
    assert [r[0] for r in rows] == list(range(1, 8))
    for h, day, actual, fc, abs_err, mase in rows:
        want_fc = 0.5 * level + 0.5 * (xbar + b * (n + h - tbar))
        assert day == days[n + h - 1].strftime("%Y-%m-%d")
        assert abs(actual - _snap(cents[n + h - 1] / 1e2)) < 2e-6
        assert abs(fc - _snap(want_fc / 1e2)) < 2e-6, h
        err = abs(cents[n + h - 1] - want_fc)
        assert abs(abs_err - _snap(err / 1e2)) < 2e-6, h
        assert abs(mase - _snap(err / scale)) < 2e-6, h


# ---------------------------------------------------------------------------
# Fisher index-of-dispersion Poisson gate (r11 upper-tail flag)
# ---------------------------------------------------------------------------


def test_poisson_dispersion_matches_definition(con):
    """VMR = s²/x̄, D = (n-1)s²/x̄, z = sqrt(2D) - sqrt(2df-1); the
    overdispersed flag must gate on the UPPER tail (z > 0) so
    significant underdispersion never raises it (r11 ADVICE fix)."""
    x = _daily_counts(con)
    n = len(x)
    mean = sum(x) / n
    s2 = sum((v - mean) ** 2 for v in x) / (n - 1)
    d = (n - 1) * s2 / mean
    z = _snap(math.sqrt(2.0 * d) - math.sqrt(2.0 * (n - 1) - 1.0))
    p = _snap(_two_sided_p(abs(z)))
    rows = con.execute(_oracle("events_poisson_dispersion")).fetchall()
    assert len(rows) == 1
    n_days, mean_count, vmr, d_stat, g_z, g_p, flag = rows[0]
    assert n_days == n
    assert abs(mean_count - _snap(mean)) < 2e-6
    assert abs(vmr - _snap(s2 / mean)) < 2e-6
    assert abs(d_stat - _snap(d)) < 2e-6
    assert abs(g_z - z) < 2e-6
    assert abs(g_p - p) < 2e-6
    assert flag == (1 if (z > 0 and p < 0.05) else 0)


# ---------------------------------------------------------------------------
# Repeat-purchase retention ladder
# ---------------------------------------------------------------------------


def test_repeat_purchase_curve_matches_counter(con):
    orders_per_cust = Counter(
        r[0] for r in con.execute("SELECT o_custkey FROM orders").fetchall()
    )
    n_cust = len(orders_per_cust)
    at_least = {
        k: sum(1 for v in orders_per_cust.values() if v >= k)
        for k in range(1, 12)
    }
    rows = con.execute(_oracle("orders_repeat_purchase_curve")).fetchall()
    assert [r[0] for r in rows] == list(range(1, 11))
    for k, n_k, share, cont in rows:
        assert n_k == at_least[k]
        assert abs(share - _snap(at_least[k] / n_cust)) < 2e-6
        if k < 10 and at_least[k] > 0:
            assert abs(cont - _snap(at_least[k + 1] / at_least[k])) < 2e-6
        else:
            assert cont is None


# ---------------------------------------------------------------------------
# Log-loss + Brier of the quality gate
# ---------------------------------------------------------------------------


def test_log_loss_matches_per_doc_terms(con):
    feats = _doc_feats(con)
    n = len(feats)
    n_pos = sum(g for _, g in feats)
    ll6 = br6 = 0
    for score, g in feats:
        p = min(max(score, 1e-6), 1.0 - 1e-6)
        ll6 += math.floor((-math.log(p) if g == 1 else -math.log(1.0 - p))
                          * 1e6 + 0.5)
        br6 += math.floor((p - g) ** 2 * 1e6 + 0.5)
    prev = n_pos / n
    baseline = -prev * math.log(prev) - (1 - prev) * math.log(1 - prev)
    got = con.execute(_oracle("quality_log_loss")).fetchall()[0]
    g_n, g_pos, g_ll, g_br, g_base = got
    assert (g_n, g_pos) == (n, n_pos)
    assert abs(g_ll - _snap(ll6 / 1e6 / n)) < 2e-6
    assert abs(g_br - _snap(br6 / 1e6 / n)) < 2e-6
    assert abs(g_base - _snap(baseline)) < 2e-6


# ---------------------------------------------------------------------------
# KS score separation (max CDF gap, lowest-score tie-break)
# ---------------------------------------------------------------------------


def test_ks_separation_matches_cdf_scan(con):
    feats = _doc_feats(con)
    m = sum(g for _, g in feats)
    n = len(feats) - m
    hist_pos = Counter(s for s, g in feats if g == 1)
    hist_neg = Counter(s for s, g in feats if g == 0)
    cum_p = cum_n = 0
    best = None  # (-gap, score)
    for s in sorted(set(hist_pos) | set(hist_neg)):
        cum_p += hist_pos.get(s, 0)
        cum_n += hist_neg.get(s, 0)
        gap = abs(cum_p * n - cum_n * m)
        cand = (-gap, s)
        if best is None or cand < best:
            best = cand
    got = con.execute(_oracle("quality_ks_separation")).fetchall()[0]
    g_m, g_n, ks, thr = got
    assert (g_m, g_n) == (m, n)
    assert abs(ks - _snap(-best[0] / (m * n))) < 2e-6
    assert thr == best[1]


# ---------------------------------------------------------------------------
# Cumulative gains / lift deciles off the descending-score CDF
# ---------------------------------------------------------------------------


def test_cumulative_gains_matches_decile_scan(con):
    feats = _doc_feats(con)
    n = len(feats)
    m = sum(g for _, g in feats)
    hist_all = Counter(s for s, _ in feats)
    hist_pos = Counter(s for s, g in feats if g == 1)
    cum = 0
    per_decile = defaultdict(lambda: [0, 0])
    for s in sorted(hist_all, reverse=True):
        cum += hist_all[s]
        dec = (10 * cum + n - 1) // n
        per_decile[dec][0] += hist_all[s]
        per_decile[dec][1] += hist_pos.get(s, 0)
    rows = con.execute(_oracle("quality_cumulative_gains")).fetchall()
    assert [r[0] for r in rows] == sorted(per_decile)
    cum_docs = cum_pos = 0
    for dec, n_docs, n_pos, gain, lift in rows:
        assert [n_docs, n_pos] == per_decile[dec]
        cum_docs += n_docs
        cum_pos += n_pos
        assert abs(gain - _snap(cum_pos / m)) < 2e-6, dec
        assert abs(lift - _snap((cum_pos / m) / (cum_docs / n))) < 2e-6, dec


# ---------------------------------------------------------------------------
# Hellinger + total-variation source distances (shared-vocab split)
# ---------------------------------------------------------------------------


def test_hellinger_tv_matches_shared_vocab_sums(con):
    """Both metrics decomposed over the SHARED vocabulary with the
    one-sided masses folded in closed form — recomputed from raw
    per-source token counters with the per-term 1e-9 snap."""
    counts = defaultdict(Counter)
    for source, text in con.execute(
        "SELECT source, text FROM documents"
    ).fetchall():
        counts[source].update(text.strip().split())
    totals = {s: sum(c.values()) for s, c in counts.items()}

    def snap9_sum(vals):
        return sum(math.floor(v * 1e9 + 0.5) for v in vals) / 1e9

    rows = con.execute(_oracle("corpus_source_hellinger_tv")).fetchall()
    seen = set()
    for sa, sb, hell, tv in rows:
        seen.add((sa, sb))
        assert sa < sb
        common = set(counts[sa]) & set(counts[sb])
        pa = {t: counts[sa][t] / totals[sa] for t in common}
        pb = {t: counts[sb][t] / totals[sb] for t in common}
        bc = snap9_sum(math.sqrt(pa[t] * pb[t]) for t in common)
        want_h = _snap(math.sqrt(max(1.0 - bc, 0.0)))
        sd = snap9_sum(abs(pa[t] - pb[t]) for t in common)
        sma = snap9_sum(pa[t] for t in common)
        smb = snap9_sum(pb[t] for t in common)
        want_tv = _snap(0.5 * (sd + (1.0 - sma) + (1.0 - smb)))
        assert abs(hell - want_h) < 2e-6, (sa, sb)
        assert abs(tv - want_tv) < 2e-6, (sa, sb)
    srcs = sorted(counts)
    assert seen == {(a, b) for a in srcs for b in srcs if a < b}


# ---------------------------------------------------------------------------
# Simplified (centroid-based) silhouette
# ---------------------------------------------------------------------------


def test_silhouette_matches_pointwise_loop(con):
    """Lloyd assignment (snapped squared distances, cell tie-break),
    per-dim snapped updated centroids, then the literal per-point
    s = (b-a)/max(a,b) with the module's snap discipline."""
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[], label FROM embeddings"
    ).fetchall()
    vecs = {vid: v for vid, v, _ in rows}
    seeds = {vid: v for vid, v in vecs.items() if vid < 8}

    def d2(v, c):
        nv = sum(x * x for x in v)
        nc = sum(x * x for x in c)
        dot = sum(a * b for a, b in zip(v, c))
        return _snap(nv - 2 * dot + nc)

    assign = {
        vid: min((d2(v, c), cell) for cell, c in seeds.items())[1]
        for vid, v in vecs.items()
    }
    # updated centroids: per-dimension snapped mean over members
    members = defaultdict(list)
    for vid, cell in assign.items():
        members[cell].append(vecs[vid])
    cents = {
        cell: [
            _snap(sum(v[d] for v in vs) / len(vs))
            for d in range(len(vs[0]))
        ]
        for cell, vs in members.items()
    }

    def dist(v, c):
        return _snap(math.sqrt(max(d2(v, c), 0.0)))

    s6 = defaultdict(list)
    for vid, v in vecs.items():
        own = assign[vid]
        a = dist(v, cents[own])
        b = min(dist(v, c) for cell, c in cents.items() if cell != own)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        s6[own].append(math.floor(s * 1e6 + 0.5))
    got = con.execute(_oracle("clustering_silhouette_simplified")).fetchall()
    assert [r[0] for r in got] == sorted(s6)
    all6 = [v for vals in s6.values() for v in vals]
    overall = math.floor(sum(all6) / len(all6) + 0.5) / 1e6
    for cell, n_members, mean_s, g_overall in got:
        assert n_members == len(s6[cell])
        want = math.floor(sum(s6[cell]) / len(s6[cell]) + 0.5) / 1e6
        assert abs(mean_s - want) < 2e-6, cell
        assert abs(g_overall - overall) < 2e-6


# ---------------------------------------------------------------------------
# Weighted Slope One offline eval
# ---------------------------------------------------------------------------


def test_slope_one_matches_literal_prediction_loop(con):
    """Ratings = customer x brand quantity sums, deterministic sha-hash
    10% holdout, dev grid and predictions recomputed with literal
    dict loops (snapped dev, scaled-integer numerator, snapped MAE)."""
    ratings = {
        (u, b): r
        for u, b, r in con.execute(
            "SELECT o_custkey, p_brand, CAST(sum(CAST(l_quantity AS BIGINT))"
            " AS BIGINT) FROM orders"
            " JOIN lineitem ON l_orderkey = o_orderkey"
            " JOIN part ON p_partkey = l_partkey"
            " GROUP BY 1, 2"
        ).fetchall()
    }
    train, test = {}, {}
    for (u, b), r in ratings.items():
        (test if _hash28(f"so{u}_{b}") % 10 == 0 else train)[(u, b)] = r
    by_user = defaultdict(dict)
    for (u, b), r in train.items():
        by_user[u][b] = r
    dev_n = Counter()
    dev_sum = Counter()
    for u, items in by_user.items():
        for bj, rj in items.items():
            for bi, ri in items.items():
                if bi != bj:
                    dev_n[(bj, bi)] += 1
                    dev_sum[(bj, bi)] += rj - ri
    n_pred, err6 = 0, 0
    for (u, b), r in test.items():
        num = den = 0
        for bi, ri in by_user.get(u, {}).items():
            if (b, bi) in dev_n:
                nc = dev_n[(b, bi)]
                dev = _snap(dev_sum[(b, bi)] / nc)
                num += math.floor(nc * (dev + ri) * 1e6 + 0.5)
                den += nc
        if den > 0:
            pred = math.floor(num / den + 0.5) / 1e6
            n_pred += 1
            err6 += math.floor(abs(pred - r) * 1e6 + 0.5)
    got = con.execute(_oracle("reco_slope_one_eval")).fetchall()[0]
    n_train, n_test, n_predicted, coverage, mae = got
    assert n_train == len(train)
    assert n_test == len(test)
    assert n_predicted == n_pred
    assert abs(coverage - _snap(n_pred / len(test))) < 2e-6
    assert abs(mae - _snap(err6 / 1e6 / n_pred)) < 2e-6


# ---------------------------------------------------------------------------
# Length-bucketed dynamic-batching padding waste (round-11 addition)
# ---------------------------------------------------------------------------


def test_padding_waste_matches_literal_batch_plan(con):
    """Buckets, batches-of-8 by descending length, dynamic padding to
    the batch max — the whole plan rebuilt with plain Python loops from
    raw whitespace token counts."""
    docs = [
        (doc_id, len(text.strip().split()))
        for doc_id, text in con.execute(
            "SELECT doc_id, text FROM documents"
        ).fetchall()
        if text.strip()
    ]
    groups = defaultdict(list)  # (len_bucket, sub) -> [(n_tok, doc_id)]
    for doc_id, n_tok in docs:
        bucket = ((n_tok + 63) // 64) * 64
        groups[(bucket, doc_id // 4096)].append((n_tok, doc_id))
    per_bucket = defaultdict(lambda: [0, 0, 0, 0])  # docs, batches, padded, real
    for (bucket, _sub), members in groups.items():
        members.sort(key=lambda t: (-t[0], t[1]))
        for i in range(0, len(members), 8):
            batch = members[i : i + 8]
            agg = per_bucket[bucket]
            agg[0] += len(batch)
            agg[1] += 1
            agg[2] += len(batch) * max(n for n, _ in batch)
            agg[3] += sum(n for n, _ in batch)
    rows = con.execute(_oracle("training_batch_padding_waste")).fetchall()
    assert [r[0] for r in rows] == sorted(per_bucket)
    for bucket, n_docs, n_batches, padded, real, waste in rows:
        want = per_bucket[bucket]
        assert [n_docs, n_batches, padded, real] == want
        assert abs(waste - _snap(1.0 - want[3] / want[2])) < 2e-6
