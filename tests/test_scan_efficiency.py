"""Scan-efficiency assertions (SURVEY.md §4.2 'free from Catalyst' — but
verify it stayed free): incremental filters reach the parquet scan and
column pruning keeps unneeded columns out of the read schema."""

from etl_data_transformer_spark.catalog import QUERIES, ROTATED_QUERIES

SF_DIR = "/root/testdata/sf0.001"

# rotated queries (round-4 contract swap) keep their plan assertions
_ALL_QUERIES = {**ROTATED_QUERIES, **QUERIES}


def _scan_lines(spark, name):
    plan = _ALL_QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_watermark_filter_pushed_to_scan(spark):
    """The P5 incremental predicate must appear as a scan DataFilter, not a
    post-scan Filter over the full table."""
    scans = _scan_lines(spark, "watermark_filter")
    assert any("l_shipdate" in ln and ">=" in ln and "DataFilters" in ln for ln in scans)


def test_pricing_summary_prunes_columns(spark):
    """The 6-column aggregation must not read all 11 lineitem columns."""
    scans = _scan_lines(spark, "pricing_summary")
    li_scan = next(ln for ln in scans if "l_quantity" in ln)
    assert "l_partkey" not in li_scan and "l_suppkey" not in li_scan and "l_tax" not in li_scan


def test_item_status_incremental_filter_pushed(spark):
    """The flagship branch's watermark filter reaches the lineitem scan."""
    scans = _scan_lines(spark, "item_status")
    assert any("l_shipdate" in ln and ">=" in ln for ln in scans)


def test_topk_prunes_order_columns(spark):
    """topk reads only the 3 needed orders columns."""
    scans = _scan_lines(spark, "topk_orders_per_nation")
    o_scan = next(ln for ln in scans if "o_totalprice" in ln)
    assert "o_orderpriority" not in o_scan and "o_orderdate" not in o_scan


def test_parse_byte_conf_unit_forms():
    """spread()'s maxPartitionBytes parse accepts every Spark byte-string
    form (round-4 verdict residue: '128m' used to throw)."""
    import pytest

    from etl_data_transformer_spark.sources.readers import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 134217728
    assert _parse_byte_conf("134217728b") == 134217728
    assert _parse_byte_conf("128m") == 128 * 1024**2
    assert _parse_byte_conf("128MB") == 128 * 1024**2
    assert _parse_byte_conf("1g") == 1024**3
    assert _parse_byte_conf(" 64k ") == 64 * 1024
    assert _parse_byte_conf("2t") == 2 * 1024**4
    assert _parse_byte_conf(134217728) == 134217728
    with pytest.raises(ValueError, match="unparseable"):
        _parse_byte_conf("12.5 parsecs")


def test_spread_accepts_unit_conf(spark):
    """spread() works end-to-end with a unit-suffixed maxPartitionBytes."""
    from etl_data_transformer_spark.sources.readers import read_table, spread

    key = "spark.sql.files.maxPartitionBytes"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "128m")
        df = spread(read_table(spark, "/root/testdata/sf0.001", "documents"), key="doc_id")
        assert df.count() > 0
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
