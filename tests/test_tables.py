"""tables.load must work for every table against whatever physical dtype
the driver's corpus ships — the ts column of events.parquet has already
changed across corpus regenerations (TIMESTAMP(NANOS) in rounds 1-2,
timestamp[us] from round 3), and an assumption baked into the loader cost
a full round. These tests introspect, never assume.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from automated_data_pipeline_python_spark import tables
from tests.conftest import SF_SMOKE

_TS_ROWS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 15, 12, 30, 45),
    datetime.datetime(2024, 1, 30, 23, 59, 59),
]


def _write_events(path, ts_unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS_ROWS, pa.timestamp(ts_unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, path)


def test_load_every_table_from_shipped_corpus(spark):
    """Whatever the corpus ships, every table loads and counts."""
    for name in tables.TABLE_NAMES:
        df = tables.load(spark, SF_SMOKE, name)
        assert df.count() > 0, name


# The columns the catalog queries depend on. A corpus regeneration that
# drops or renames one should fail HERE with a named diff — one
# diagnosable assertion instead of dozens of red driver rows (the
# events-ts lesson, generalized from dtypes to the full schema).
EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def test_corpus_schema_contract(spark):
    for name, expected in EXPECTED_COLUMNS.items():
        got = tables.load(spark, SF_SMOKE, name).columns
        missing = [c for c in expected if c not in got]
        assert not missing, (
            f"{name}: corpus regeneration dropped columns {missing} "
            f"(shipped: {got}) — audit every catalog query reading them"
        )


def test_shipped_events_ts_is_timestamp_ntz(spark):
    df = tables.load(spark, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    lo, hi = df.selectExpr("min(ts)", "max(ts)").first()
    assert lo.year >= 2000 and hi.year <= 2100  # sane epoch, no unit mixup


@pytest.mark.parametrize("ts_unit", ["ns", "us", "ms"])
def test_load_events_any_parquet_timestamp_unit(spark, tmp_path, ts_unit):
    """Simulated corpora: nanos (rounds 1-2), micros (round 3+), millis.

    The loader must branch on the dtype Spark actually reads and always
    yield the same TimestampNTZ values.
    """
    sf_dir = tmp_path / f"corpus_{ts_unit}"
    sf_dir.mkdir()
    _write_events(str(sf_dir / "events.parquet"), ts_unit)
    df = tables.load(spark, str(sf_dir), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == _TS_ROWS


def test_load_events_utc_adjusted_parquet_is_timezone_independent(spark, tmp_path):
    """A corpus shipping isAdjustedToUTC=true parquet timestamps reads
    as TIMESTAMP (LTZ) in Spark. The loader must convert via an
    explicit epoch-based convention (UTC wall clock), NOT a bare cast —
    a cast renders in the session timezone, so the driver's vanilla
    session would yield different values per machine."""
    sf_dir = tmp_path / "corpus_utc"
    sf_dir.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS_ROWS, pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, str(sf_dir / "events.parquet"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")  # UTC+14
    try:
        df = tables.load(spark, str(sf_dir), "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
        got = sorted(r.ts for r in df.select("ts").collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == _TS_ROWS  # UTC wall clock, not shifted by +14h


def test_load_scaled_widens_single_split_scan(spark):
    """A one-split corpus fans out to the session parallelism; tables
    already scanning at/above parallelism pass through un-shuffled."""
    from automated_data_pipeline_python_spark.tables import load_scaled

    docs = tables.load(spark, SF_SMOKE, "documents")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    scaled = load_scaled(spark, SF_SMOKE, "documents")
    assert scaled.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert scaled.count() == docs.count()


def test_corpus_schema_contract(spark):
    """Early warning for corpus regenerations: the columns the query
    catalog depends on must exist with compatible types. A drift here
    fails ONE assertion instead of dozens of driver rows (the round-3
    events-ts regeneration cost a full round; see tables.load)."""
    expected = {
        "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                      "source": "string"},
        "embeddings": {"vec_id": "bigint", "label": "int",
                       "embedding": "array<float>"},
        "events": {"event_id": "bigint", "ts": "timestamp_ntz",
                   "user_id": "bigint", "event_type": "string",
                   "value": "double", "props": "string"},
        "orders": {"o_orderkey": "bigint", "o_custkey": "bigint",
                   "o_totalprice": "double", "o_orderdate": "timestamp_ntz",
                   "o_orderstatus": "string", "o_orderpriority": "string"},
        "lineitem": {"l_orderkey": "bigint", "l_partkey": "bigint",
                     "l_suppkey": "bigint", "l_quantity": "double",
                     "l_extendedprice": "double", "l_discount": "double",
                     "l_tax": "double", "l_returnflag": "string",
                     "l_linestatus": "string", "l_shipdate": "timestamp_ntz"},
    }
    for table, cols in expected.items():
        df = tables.load(spark, SF_SMOKE, table)
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for col, typ in cols.items():
            assert col in actual, f"{table}.{col} missing (corpus drift?)"
            assert actual[col] == typ, (
                f"{table}.{col}: expected {typ}, corpus ships {actual[col]}"
            )
