"""Driver-contract regression tests (round-1 verdict item 1).

The driver's CORRECTNESS harness constructs its OWN SparkSession — none of
``session.get_spark``'s build-time confs can be assumed. Round 1 lost 9
CORRECTNESS rows because ``read_table`` relied on
``spark.sql.legacy.parquet.nanosAsLong`` being baked into the session; these
tests pin the fix: ``read_table`` must self-provision every conf it needs at
runtime, even on a session where the conf is explicitly hostile.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_transformer_spark.sources import readers

SF_DIR = "/root/testdata/sf0.001"


def _hostile_session(spark):
    """A session whose SQL conf actively contradicts what the reader needs —
    stronger than 'vanilla', since newSession() falls back to the
    SparkContext conf (where tests set nanosAsLong=true at build time)."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return ns


def test_read_events_on_foreign_session(spark):
    ns = _hostile_session(spark)
    ev = readers.read_table(ns, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() == 1000
    # micros conversion sanity: timestamps land in the fixture's date range
    years = [r[0] for r in ev.select(F.year("ts")).distinct().collect()]
    assert all(1990 <= y <= 2030 for y in years)


def test_register_views_on_foreign_session(spark):
    ns = _hostile_session(spark)
    readers.register_views(ns, SF_DIR)
    got = ns.sql("SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert got == 1000


def test_entry_module_queries_on_foreign_session(spark):
    """The exact driver flow: import __spark_entry__, call a queries() entry
    that touches events, on a session without engine confs."""
    import sys

    sys.path.insert(0, "/root/repo")
    try:
        import __spark_entry__ as ent
    finally:
        sys.path.pop(0)
    ns = _hostile_session(spark)
    # tumbling_events touches the events table's TIMESTAMP(NANOS) read —
    # the conf-sensitive path this test exists for (events_json rotated
    # out in round 9; the window family's driver slot passed hopping →
    # tumbling in the round-11 rotation; same nanos read either way)
    df = ent.queries()["tumbling_events"](ns, SF_DIR)
    assert df.count() > 0
