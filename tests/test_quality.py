"""Quality expectations fire on dirty data (not just zeros on clean)."""

from __future__ import annotations

from automated_data_pipeline_python_spark import quality as Q


def _report_dict(df):
    return {r.check_name: r.violations for r in df.collect()}


def test_row_and_set_checks_detect_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (1, "O", -5.0),   # duplicate id + negative price
            (None, "X", 20.0),  # null id + bad status
        ],
        "id long, status string, price double",
    )
    rep = _report_dict(
        Q.violation_report(
            df,
            [
                Q.not_null("id_not_null", "id"),
                Q.unique("id_unique", "id"),
                Q.accepted_values("status_ok", "status", ["O", "F"]),
                Q.in_range("price_range", "price", 0.0, 100.0),
            ],
        )
    )
    assert rep == {
        "id_not_null": 1,
        "id_unique": 1,   # two rows share id=1 (nulls don't count)
        "status_ok": 1,
        "price_range": 1,
    }


def test_referential_check_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = Q.referential_report("fk_ref", child, "fk", parent, "pk").collect()
    assert rep[0].check_name == "fk_ref" and rep[0].violations == 1


def test_clean_table_reports_all_zero(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], "id long, status string")
    rep = _report_dict(
        Q.violation_report(
            df,
            [
                Q.not_null("id_not_null", "id"),
                Q.unique("id_unique", "id"),
                Q.accepted_values("status_ok", "status", ["O", "F"]),
            ],
        )
    )
    assert set(rep.values()) == {0}
