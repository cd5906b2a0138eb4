"""The map-side simhash core equals the grouped textbook form.

The restructure rests on one identity: summing ±1 over raw token
OCCURRENCES equals summing cnt-weighted ±1 over distinct (doc, token)
rows. r13 sharpened the core to a RUN-LENGTH fold over the sorted
token array (one SHA per distinct-token run instead of per
occurrence), so this fixture now also guards the run-state machine:
heavy repetition (one token 50×), interleaved tokens whose sorted
runs must merge (a b a b ...), exact half-splits (the s_b > 0 strict
inequality), single-token docs, the empty-text tokenization edge
(split(trim('')) → ['']), and a NULL-text doc (dropped, per the
oracle's explode semantics — ADVICE r12).
"""

from __future__ import annotations

import pandas as pd
import pytest

from automated_data_pipeline_python_spark.queries import dedup as D

# The pre-r12 grouped core, kept inline as the reference implementation.
_REF_SQL = (
    """
WITH toks AS (
    SELECT doc_id, split(trim(text), '\\\\s+') AS w FROM documents
),
tok AS (
    SELECT doc_id, token, count(*) AS cnt
    FROM toks LATERAL VIEW explode(w) t AS token
    GROUP BY doc_id, token
),
th AS (SELECT doc_id, """
    + "CAST(conv(substr(sha2(token, 256), 1, 15), 16, 10) AS BIGINT) AS h, cnt FROM tok),"
    + """
acc AS (
    SELECT doc_id,
           """
    + ",\n           ".join(
        f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN cnt ELSE -cnt END)"
        f" AS s{b}"
        for b in range(32)
    )
    + """
    FROM th
    GROUP BY doc_id
)
SELECT doc_id,
       """
    + " + ".join(
        f"CASE WHEN s{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b})"
        f" ELSE CAST(0 AS BIGINT) END"
        for b in range(32)
    )
    + """ AS simhash
FROM acc
"""
)


@pytest.fixture(scope="module")
def rep_dir(tmp_path_factory):
    docs = []

    def add(doc_id, text):
        docs.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": "en",
                "source": "rep",
                "n_chars": len(text) if text is not None else 0,
            }
        )

    add(0, " ".join(["hot"] * 50 + ["cold"]))          # 50x one token
    add(1, " ".join(["a", "b"] * 17))                   # tied multiset halves
    add(2, "solo")                                       # single token
    add(3, "  ")                                         # trim -> '' -> ['']
    add(4, " ".join(f"w{i}" for i in range(40)))        # all-distinct
    add(5, " ".join(["x"] * 3 + ["y"] * 5 + ["z"] * 7))  # mixed counts
    add(6, None)  # NULL text: dropped on BOTH sides (ADVICE r12 fix)
    d = tmp_path_factory.mktemp("rep")
    pd.DataFrame(docs).to_parquet(d / "documents.parquet")
    return str(d)


def test_mapside_core_equals_grouped_reference(spark, rep_dir):
    from automated_data_pipeline_python_spark.tables import load

    load(spark, rep_dir, "documents").createOrReplaceTempView("documents")
    got = {
        r.doc_id: r.simhash
        for r in spark.sql(D._SIMHASH_SPARK_SQL).collect()
    }
    ref = {r.doc_id: r.simhash for r in spark.sql(_REF_SQL).collect()}
    assert got == ref
    assert len(got) == 6  # doc 6 (NULL text) dropped by both forms
    assert 6 not in got
