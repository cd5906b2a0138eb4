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
