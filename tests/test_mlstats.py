"""Semantic reference checks for the mlstats operators.

Cross-engine parity is the driver's job (tools/verify_driver.py); these
tests pin the MATH against independent reference implementations —
textbook PAVA for the isotonic fits, pandas' Spearman for the rank
correlation, numpy linear algebra for Mahalanobis — all on the DuckDB
side (fast, no Spark session needed; the Spark side is hash-identical
by the driver check).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from automated_data_pipeline_python_spark.queries import mlstats as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "lineitem", "customer", "orders", "part"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _pava(vals: list[tuple[float, float]]) -> list[float]:
    """Textbook weighted pool-adjacent-violators, nondecreasing."""
    stack: list[list[float]] = []
    for v, w in vals:
        stack.append([v, w, 1])
        while len(stack) > 1 and stack[-2][0] > stack[-1][0] + 1e-15:
            v2, w2, c2 = stack.pop()
            v1, w1, c1 = stack.pop()
            stack.append([(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2, c1 + c2])
    out: list[float] = []
    for v, w, c in stack:
        out.extend([v] * int(c))
    return out


def test_isotonic_minimax_equals_pava(con):
    rows = sorted(con.execute(M._ISO_DUCK_SQL).fetchall())
    bins = con.execute(
        f"SELECT decile, n_docs, n_gopher_pass FROM ({M._CALIB_DUCK_SQL}) z"
        " ORDER BY decile"
    ).fetchall()
    vals = [(p / n, float(n)) for _, n, p in bins]
    iso_ref = _pava(vals)
    anti_ref = [-x for x in _pava([(-v, w) for v, w in vals])]
    got_iso = [r[3] for r in rows]
    got_anti = [r[4] for r in rows]
    assert all(abs(a - b) < 2e-6 for a, b in zip(iso_ref, got_iso))
    assert all(abs(a - b) < 2e-6 for a, b in zip(anti_ref, got_anti))
    # fits are monotone in their stated directions
    assert got_iso == sorted(got_iso)
    assert got_anti == sorted(got_anti, reverse=True)


def test_conformal_quantile_and_coverage(con):
    (n_calib, n_test, qhat, coverage, level), = con.execute(
        M._CONF_DUCK_SQL
    ).fetchall()
    # reference: exact split-conformal quantile on the same residuals
    resid = con.execute(
        "SELECT abs(n_chars - 6 * len(regexp_split_to_array(trim(text),"
        " '\\s+'))) AS r, doc_id FROM documents"
    ).fetchall()
    calib = sorted(r for r, d in resid if d % 2 == 0)
    test = [r for r, d in resid if d % 2 == 1]
    import math
    k = math.ceil(0.95 * (len(calib) + 1))
    assert n_calib == len(calib)
    assert qhat == calib[k - 1]
    ref_cov = sum(1 for r in test if r <= qhat) / len(test)
    assert abs(coverage - ref_cov) < 2e-6
    # the conformal guarantee: coverage ~ 95% (finite-sample slack)
    assert 0.90 <= coverage <= 1.0


def test_spearman_matches_pandas(con):
    rows = con.execute(M._SP_DUCK_SQL).fetchall()
    df = con.execute(
        "SELECT CAST(l_quantity AS BIGINT) AS q,"
        " CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,"
        " CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t FROM lineitem"
    ).df()
    ref = df.corr(method="spearman")
    got = {(a, b): rho for a, b, _, rho in rows}
    assert abs(got[("quantity", "discount")] - ref.loc["q", "d"]) < 2e-6
    assert abs(got[("quantity", "tax")] - ref.loc["q", "t"]) < 2e-6
    assert abs(got[("discount", "tax")] - ref.loc["d", "t"]) < 2e-6


def test_mahalanobis_matches_numpy(con):
    rows = con.execute(M._MAHA_DUCK_SQL).fetchall()
    df = con.execute(
        "SELECT c.c_custkey AS k,"
        " CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,"
        " coalesce(o.n, 0) AS y FROM customer c LEFT JOIN"
        " (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o"
        " ON o.o_custkey = c.c_custkey"
    ).df()
    X = df[["x", "y"]].to_numpy(dtype=float)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, bias=True)
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", X - mu, inv, X - mu)
    ref = pd.Series(d2, index=df["k"]).sort_values(
        ascending=False
    )
    got_keys = [r[0] for r in rows]
    # same top-20 set and matching distances (1e-4 slack: numpy's cov
    # accumulates in a different order than the exact-sum oracle)
    for key, got_d2 in [(r[0], r[3]) for r in rows]:
        assert abs(got_d2 - ref.loc[key]) < 1e-4
    assert set(got_keys) == set(ref.index[:20])


def test_sorted_neighborhood_candidates_subset_of_blockjoin(con):
    """Every emitted pair is a true lev<=3 pair, and the window method
    emits at most 2 pairs per record (the O(n*w) bound)."""
    rows = con.execute(M._SNM_SQL).fetchall()
    assert len(rows) > 0
    for blk, ka, kb, na, nb, lev in rows:
        assert lev <= M._SNM_LEV
        assert ka != kb
    from collections import Counter
    per_left = Counter(r[1] for r in rows)
    assert max(per_left.values()) <= 2
