"""Temporal operator tests: as-of join, bucketed range join, sessionization,
rolling stats (operators/temporal.py) with hand-computed expectations."""

import datetime as dt

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators.temporal import (
    as_of_join,
    range_join,
    rolling_stats,
    session_agg,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_as_of_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 00:00:00"), "a"),
            (1, _ts("2024-01-20 00:00:00"), "b"),
            (1, _ts("2024-01-01 00:00:00"), "early"),  # before any rate
            (2, _ts("2024-01-15 00:00:00"), "c"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-05 00:00:00"), 1.0),
            (1, _ts("2024-01-20 00:00:00"), 2.0),  # equal ts → inclusive match
            (2, _ts("2024-01-10 00:00:00"), 3.0),
        ],
        "k int, rts timestamp, rate double",
    )
    out = as_of_join(left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rate"])
    got = {r["tag"]: r["rate"] for r in out.collect()}
    # 'early' dropped (inner, no prior rate); 'b' takes the equal-ts rate
    assert got == {"a": 1.0, "b": 2.0, "c": 3.0}

    kept = as_of_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rate"], how="left"
    )
    got_left = {r["tag"]: r["rate"] for r in kept.collect()}
    assert got_left["early"] is None and len(got_left) == 4


def test_range_join_matches_naive(spark, star):
    ev = star["events"].select("event_id", "user_id", "ts").limit(500)
    a = ev.select("user_id", F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select("user_id", F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    fast = range_join(a, b, on=["user_id"], left_ts="ts_a", right_ts="ts_b", upper_s=600)
    naive = (
        a.join(b, "user_id")
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 600 SECONDS"))
        )
    )
    fast_pairs = {(r["id_a"], r["id_b"]) for r in fast.select("id_a", "id_b").collect()}
    naive_pairs = {(r["id_a"], r["id_b"]) for r in naive.select("id_a", "id_b").collect()}
    assert fast_pairs == naive_pairs and len(fast_pairs) > 0


def test_sessionize_gap_breaks(spark):
    rows = [
        (1, 1, _ts("2024-01-01 00:00:00"), 1.0),
        (1, 2, _ts("2024-01-01 00:10:00"), 1.0),  # same session (10 min)
        (1, 3, _ts("2024-01-01 01:00:00"), 1.0),  # 50 min gap → new session
        (2, 4, _ts("2024-01-01 00:00:00"), 2.0),
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp, value double")
    out = sessionize(ev, gap="30 minutes")
    sess = {r["event_id"]: r["sess_id"] for r in out.collect()}
    assert sess == {1: 1, 2: 1, 3: 2, 4: 1}

    agg = session_agg(ev, gap="30 minutes")
    r = {(x["user_id"], x["sess_id"]): x["n_events"] for x in agg.collect()}
    assert r == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_rolling_stats_values(spark):
    rows = [(1, i, _ts(f"2024-01-01 00:0{i}:00"), float(i)) for i in range(1, 5)]
    ev = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp, value double")
    out = rolling_stats(ev, window_rows=3).orderBy("event_id").collect()
    assert [r["prev_value"] for r in out] == [None, 1.0, 2.0, 3.0]
    assert [r["next_value"] for r in out] == [2.0, 3.0, 4.0, None]
    # trailing 3-row means: 1, 1.5, 2, 3
    assert [r["ma3_value"] for r in out] == [1.0, 1.5, 2.0, 3.0]


def test_ngram_jaccard_exact_identical_docs(spark):
    from etl_data_transformer_spark.operators.dedup import ngram_jaccard_exact

    d = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "zzzzzz")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_exact(d, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard_3gram"]) for r in out] == [(1, 2, 1.0)]


def test_session_agg_native_equals_gaps_and_islands(spark, star):
    """Native session_window aggregation and the gaps-and-islands window
    formulation produce the same sessions on microsecond event data."""
    from etl_data_transformer_spark.operators.temporal import (
        session_agg,
        session_agg_native,
    )

    ev = star["events"]
    a = {
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"], r["sum_value"])
        for r in session_agg(ev).collect()
    }
    b = {
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"], r["sum_value"])
        for r in session_agg_native(ev).collect()
    }
    assert a == b and len(a) > 0


def test_resample_ffill_fills_gap_buckets(spark):
    import datetime as dt

    from etl_data_transformer_spark.operators.temporal import resample_ffill

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        (1, ts(0, 10), 1.0),
        (1, ts(0, 20), 2.0),   # hour 0: sum 3.0
        (1, ts(3, 5), 5.0),    # hours 1-2 are gaps
        (2, ts(1, 0), 7.0),    # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket"].hour): (r["n_events"], r["sum_value"], r["filled_sum_value"])
        for r in resample_ffill(df).collect()
    }
    assert got[(1, 0)] == (2, 3.0, 3.0)
    assert got[(1, 1)] == (0, None, 3.0)   # gap: carried forward
    assert got[(1, 2)] == (0, None, 3.0)
    assert got[(1, 3)] == (1, 5.0, 5.0)
    assert got[(2, 1)] == (1, 7.0, 7.0)
    assert len(got) == 5  # grid spans each key's own range only


def test_funnel_order_sensitivity(spark):
    import datetime as dt

    from etl_data_transformer_spark.operators.temporal import funnel

    def ts(m):
        return dt.datetime(2024, 1, 1, m // 60, m % 60)

    rows = [
        # user 1 completes in order
        (1, ts(0), "view"), (1, ts(10), "click"), (1, ts(20), "purchase"),
        # user 2: purchase BEFORE click -> stalls at step 2
        (2, ts(0), "view"), (2, ts(5), "purchase"), (2, ts(10), "click"),
        # user 3: never views -> no funnel row at all
        (3, ts(0), "click"), (3, ts(5), "purchase"),
        # user 4: click before the first view does not count
        (4, ts(0), "click"), (4, ts(5), "view"), (4, ts(10), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1]["steps_completed"] == 3 and got[1]["step_3_ts"] == ts(20)
    assert got[2]["steps_completed"] == 2 and got[2]["step_2_ts"] == ts(10)
    assert got[2]["step_3_ts"] is None  # purchase pre-dated the click
    assert got[4]["steps_completed"] == 2 and got[4]["step_2_ts"] == ts(10)

    import pytest

    with pytest.raises(ValueError):
        funnel(df, ["view"])


def test_funnel_default_mode_no_forced_broadcast(spark, star):
    """Default (scale-safe) mode: the per-key step table — O(#keys), unbounded
    — must NOT be hint-broadcast. With auto-broadcast disabled the plan
    contains zero BroadcastExchange (a leftover hint would force one anyway),
    and the pre-repartitioned event stream is shuffled exactly once and
    reused by every step (ReusedExchange)."""
    from etl_data_transformer_spark.operators.temporal import funnel

    ev = star["events"]
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        df = funnel(ev, steps=["view", "click", "purchase"])
        rows = df.collect()
        assert rows  # sanity: funnel produced results
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "ReusedExchange" in plan  # one event shuffle, shared by steps
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_funnel_auto_gate_picks_strategy_by_key_estimate(spark, star):
    """broadcast_steps=None (default) auto-gates on the step-1 key-domain
    estimate vs autoBroadcastJoinThreshold: a generous threshold over the
    small fixture domain yields the broadcast plan (hinted BroadcastHashJoin
    on the step tables, no event repartition); a 1-byte threshold yields
    the scale-safe shuffle plan (zero BroadcastExchange once Spark's own
    auto-broadcast is also out of the picture at that size). Results are
    strategy-independent."""
    from etl_data_transformer_spark.operators.temporal import funnel

    ev = star["events"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        df_b = funnel(ev, steps=["view", "click", "purchase"])
        got_b = {tuple(r) for r in df_b.collect()}
        plan_b = df_b._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_b
        assert "REPARTITION_BY_COL" not in plan_b  # no event-stream shuffle

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        df_s = funnel(ev, steps=["view", "click", "purchase"])
        got_s = {tuple(r) for r in df_s.collect()}
        plan_s = df_s._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan_s
        assert "ReusedExchange" in plan_s  # shuffle mode's shared event exchange
        assert got_b == got_s
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_funnel_threshold_parsing(spark):
    from etl_data_transformer_spark.operators.temporal import _broadcast_threshold_bytes

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        for raw, want in (
            ("-1", -1),
            ("10485760", 10485760),
            ("10485760b", 10485760),  # Spark's normalized byte spelling
            ("10MB", 10 << 20),
            ("512k", 512 << 10),
            ("1g", 1 << 30),
        ):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _broadcast_threshold_bytes(spark) == want, raw
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_funnel_broadcast_mode_pins_hint(spark, star):
    """broadcast_steps=True (small known key domains only): the step tables
    join broadcast even with auto-broadcast disabled — the event scan is the
    only shuffled input."""
    from etl_data_transformer_spark.operators.temporal import funnel

    ev = star["events"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = funnel(ev, steps=["view", "click", "purchase"], broadcast_steps=True)
        base = funnel(ev, steps=["view", "click", "purchase"])
        got = {tuple(r) for r in df.collect()}
        assert got == {tuple(r) for r in base.collect()}  # mode-independent result
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
