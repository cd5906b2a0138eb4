"""Bucketed-join tests: the co-located fact join plans with NO shuffle."""

from __future__ import annotations

import pytest

from automated_data_pipeline_python_spark.plans import plan_report
from automated_data_pipeline_python_spark.storage import read_table, write_bucketed
from automated_data_pipeline_python_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    write_bucketed(
        load(spark, SF, "lineitem"), "b_lineitem", "l_orderkey", num_buckets=8
    )
    write_bucketed(
        load(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        "l_orderkey",
        num_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = read_table(spark, "b_lineitem").join(
            read_table(spark, "b_orders"), "l_orderkey"
        )
        rep = plan_report(joined)
        assert rep.sort_merge_joins == 1
        assert rep.exchanges == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correctness(spark, bucketed):
    got = (
        read_table(spark, "b_lineitem")
        .join(read_table(spark, "b_orders"), "l_orderkey")
        .count()
    )
    li = load(spark, SF, "lineitem")
    orders = load(spark, SF, "orders")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_groupby_avoids_shuffle(spark, bucketed):
    # Aggregation on the bucket key reuses the bucketing: no Exchange.
    agg = read_table(spark, "b_lineitem").groupBy("l_orderkey").count()
    assert plan_report(agg).exchanges == 0


def test_range_clustered_write_has_disjoint_rowgroup_stats(spark, tmp_path):
    """Range clustering must yield (near-)disjoint per-file key ranges —
    the property parquet row-group pruning exploits — while a plain
    write of shuffled data yields heavily overlapping ranges."""
    import glob

    import pyarrow.parquet as pq

    from automated_data_pipeline_python_spark.storage import write_range_clustered
    from automated_data_pipeline_python_spark.tables import load
    from tests.conftest import SF_SMOKE

    orders = load(spark, SF_SMOKE, "orders")

    def key_ranges(path):
        ranges = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
                "o_orderkey"
            )
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                ranges.append((st.min, st.max))
        return sorted(ranges)

    def overlaps(ranges):
        return sum(
            1
            for (a, b) in zip(ranges, ranges[1:])
            if b[0] <= a[1]  # next range starts inside the previous one
        )

    clustered = tmp_path / "clustered"
    write_range_clustered(orders, str(clustered), "o_orderkey", num_files=8)
    plain = tmp_path / "plain"
    # Round-robin shuffle first => every file spans ~the whole key space.
    orders.repartition(8).write.mode("overwrite").parquet(str(plain))

    c_ranges, p_ranges = key_ranges(str(clustered)), key_ranges(str(plain))
    assert len(c_ranges) >= 2 and len(p_ranges) >= 2
    assert overlaps(c_ranges) == 0, f"clustered ranges overlap: {c_ranges}"
    assert overlaps(p_ranges) >= len(p_ranges) - 1  # plain: all overlap

    # Round-trips completely.
    assert spark.read.parquet(str(clustered)).count() == orders.count()


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from automated_data_pipeline_python_spark.storage import compact_parquet

    src = str(tmp_path / "small_files")
    # simulate a streaming sink: 20 tiny appends
    for i in range(20):
        spark.range(i * 50, (i + 1) * 50).selectExpr(
            "id", "id % 7 AS k"
        ).coalesce(1).write.mode("append").parquet(src)
    dst = str(tmp_path / "compacted")
    before, after = compact_parquet(spark, src, dst, target_rows_per_file=500)
    assert before == 20
    assert after == 2  # 1000 rows / 500 per file
    a = sorted(r.id for r in spark.read.parquet(src).collect())
    b = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert a == b  # lossless


def test_compact_parquet_preserving_cluster_order(spark, tmp_path):
    from automated_data_pipeline_python_spark.storage import compact_parquet

    src = str(tmp_path / "small_files2")
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    dst = str(tmp_path / "compacted2")
    _, after = compact_parquet(
        spark, src, dst, target_rows_per_file=500, preserve_order_by="id"
    )
    assert after == 2
    # re-clustered: a selective scan prunes to one file's row groups
    import pyarrow.parquet as pq
    import glob
    ranges = []
    for f in glob.glob(dst + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = [md.row_group(i).column(0) for i in range(md.num_row_groups)]
        ranges.append((min(c.statistics.min for c in col),
                       max(c.statistics.max for c in col)))
    ranges.sort()
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
