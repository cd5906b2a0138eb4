"""Bounded-work guarantees for the tokenizer-training queries.

The unigram-EM E-step enumerates every segmentation of every distinct
word via a recursive CTE. Unbounded, one 40-char token (URL, hex hash —
guaranteed in a real web corpus) makes the path count explode
exponentially (2^39 paths). The ``length(w) <= 12`` guard in the
``words`` CTE bounds the enumeration at 2^11 paths per word regardless
of corpus content; this test feeds exactly that adversarial token and
asserts the query completes (it would not, within any reasonable
timeout, without the guard).
"""

from __future__ import annotations

import pandas as pd
import pytest

from automated_data_pipeline_python_spark.queries import QUERIES


@pytest.fixture(scope="module")
def hostile_corpus_dir(tmp_path_factory):
    """A documents table whose longest token would break an unbounded
    E-step: one 40-char hex blob plus enough short words to seed a
    vocabulary."""
    d = tmp_path_factory.mktemp("hostile_sf")
    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "deadbeefcafebabe0123456789abcdef01234567 the cat sat",
                "the cat sat on the mat the cat sat on the mat",
                "a cat and a mat and a cat and a mat",
                "the mat the cat the mat the cat",
                "sat sat sat cat cat mat mat the the",
                "on on on a a the cat mat sat",
            ],
            "lang": ["en"] * 6,
            "source": ["synthetic"] * 6,
            "n_chars": [0] * 6,
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_unigram_em_bounded_on_40char_token(spark, hostile_corpus_dir):
    rows = QUERIES["lm_unigram_em_round"].fn(spark, hostile_corpus_dir).collect()
    # Single chars always survive into the vocab; the 40-char token is
    # dropped by the length guard, so no piece can come from it alone.
    assert 0 < len(rows) <= 30
    assert all(r.piece_len <= 4 for r in rows)


def test_unigram_em_restores_recursion_confs(spark, hostile_corpus_dir):
    before = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    QUERIES["lm_unigram_em_round"].fn(spark, hostile_corpus_dir)
    after = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    assert after == before
    assert after != "100000000"


def test_viterbi_minima_match_exhaustive_enumeration():
    """The DP (Viterbi) segmentation cost equals the exhaustive
    recursive enumeration's minimum for EVERY word — same snapped
    left-to-right accumulation, so the minima are identical, while the
    DP does O(L x 4) work instead of O(2^(L-1)). Both sides run in
    DuckDB on the same corpus (the Spark sides are hash-pinned to
    these by oracle parity)."""
    import duckdb

    from automated_data_pipeline_python_spark.queries import QUERIES, lm

    full = lm._unigram_sql(
        lm._UNIGRAM_GEN2_DUCK, "unnest(string_split(path, ' '))", "tk"
    )
    prefix_seg = full.split("\nbest AS (")[0].rstrip().rstrip(",")
    exhaustive = (
        "WITH RECURSIVE tok_exploded AS ("
        f"SELECT unnest({lm.DUCK_TOKENS.format(col='text')}) AS tk "
        "FROM documents),\n"
        + prefix_seg.lstrip()
        + "\nSELECT w, wf, min(cost) AS cost FROM seg"
        " WHERE pos = length(w) GROUP BY w, wf"
    )
    vit_all = QUERIES["lm_viterbi_segmentation"].oracle.rsplit("LIMIT 30", 1)[0]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        " read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    diff = con.execute(
        f"""
        WITH e AS ({exhaustive}), v AS ({vit_all})
        SELECT e.w, e.cost AS exh, v.vit_cost AS vit
        FROM e JOIN v ON v.word = e.w
        WHERE floor(e.cost * 1e6 + 0.5) <> floor(v.vit_cost * 1e6 + 0.5)
        """
    ).fetchall()
    n_e = con.execute(f"SELECT count(*) FROM ({exhaustive})").fetchone()[0]
    n_v = con.execute(f"SELECT count(*) FROM ({vit_all})").fetchone()[0]
    con.close()
    assert n_e == n_v and n_e > 0
    assert diff == [], diff[:10]


def test_no_unscoped_recursion_limit_raises():
    """Every raise of the recursive-CTE limits must go through
    session.recursion_limits (scoped + restored around an eager
    materialization) — a bare conf.set leaves a 1e8 row limit on the
    shared session for every later query."""
    import pathlib

    pkg = pathlib.Path("automated_data_pipeline_python_spark")
    offenders = []
    for f in pkg.rglob("*.py"):
        if f.name == "session.py":
            continue
        if 'conf.set("spark.sql.cteRecursion' in f.read_text():
            offenders.append(str(f))
    assert offenders == []
