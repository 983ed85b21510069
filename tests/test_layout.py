"""Data-skipping layout tests: range-sorted writes give disjoint per-file
key ranges (footer-level pruning); z-order keys give multi-dimensional
locality."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_data_transformer_spark.functions.scalar import zorder_key
from etl_data_transformer_spark.sources.readers import read_table
from etl_data_transformer_spark.sources.writers import write_sorted

SF_DIR = "/root/testdata/sf0.001"


def _file_ranges(path, col):
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_write_sorted_gives_disjoint_file_ranges(spark, tmp_path):
    orders = read_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_sorted")
    write_sorted(orders, path, ["o_orderkey"], num_files=8)
    ranges = sorted(_file_ranges(path, "o_orderkey"))
    assert len(ranges) >= 4
    # range partitioning → pairwise disjoint key ranges
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # a point predicate intersects exactly one file's range
    probe = ranges[2][0]
    assert sum(1 for lo, hi in ranges if lo <= probe <= hi) == 1
    # the same data written unsorted: every file overlaps the probe
    unsorted = str(tmp_path / "orders_unsorted")
    orders.repartition(8).write.parquet(unsorted)
    uranges = _file_ranges(unsorted, "o_orderkey")
    assert sum(1 for lo, hi in uranges if lo <= probe <= hi) == len(uranges)
    # round-trip intact
    assert spark.read.parquet(path).count() == orders.count()


def test_write_sorted_partitioned_keeps_sort_col_ranges(spark, tmp_path):
    """Round-5 advice: with partition_by set, the file writer inserts its own
    partition-column sort when the incoming ordering doesn't lead with the
    partition columns — which used to scramble sort_cols within each
    partition directory. The fix leads the within-partition sort with
    partition_by, so per-file min/max ranges on the sort key stay disjoint
    INSIDE each partition directory."""
    orders = read_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_part_sorted")
    write_sorted(orders, path, ["o_orderkey"], partition_by=["o_orderstatus"], num_files=6)
    checked = 0
    for part in sorted(glob.glob(f"{path}/o_orderstatus=*")):
        ranges = sorted(_file_ranges(part, "o_orderkey"))
        if len(ranges) < 2:
            continue
        checked += 1
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, (part, ranges)
    assert checked >= 1  # at least one partition had multiple files to check
    # rows inside every file are key-sorted (row-group/page-level skipping in
    # big files depends on this, and pre-fix it relied on the writer's
    # inserted sort being accidentally stable)
    for f in glob.glob(f"{path}/*/*.parquet"):
        keys = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert keys == sorted(keys), f
    assert spark.read.parquet(path).count() == orders.count()


def test_zorder_key_is_morton_interleave(spark):
    def morton2(x, y, bits=21):
        k = 0
        for b in range(bits):
            k |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return k

    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (123, 456)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == morton2(x, y), (x, y)


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    orders = read_table(spark, SF_DIR, "orders").withColumn(
        "__z", zorder_key(["o_custkey", "o_orderkey"])
    )
    path = str(tmp_path / "orders_z")
    write_sorted(orders, path, ["__z"], num_files=8)
    n_files = len(glob.glob(f"{path}/*.parquet"))
    for dim in ("o_custkey", "o_orderkey"):
        ranges = _file_ranges(path, dim)
        lo = min(r[0] for r in ranges)
        probe = lo + 1
        candidates = sum(1 for lo_, hi in ranges if lo_ <= probe <= hi)
        # z-order: a point predicate on EITHER dimension must prune files
        assert candidates < n_files, (dim, ranges)


def test_zorder_key_validations(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key([])
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"])
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=40)
