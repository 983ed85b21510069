"""Temporal + profiling catalog queries (as-of join, range join, sessions,
rolling analytics, rollup, distinct/HLL profiling).

Each has a DuckDB oracle twin in ``oracles.TEMPORAL_ORACLES``; the HLL side
of ``profile_orders`` is oracle-checked as an accuracy assertion (sketches
differ across engines, the 2%-rsd envelope does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import as_of_join, range_join, rolling_stats, session_agg
from ..sources.readers import load_star


def _monthly_rates(star: dict[str, DataFrame]) -> DataFrame:
    """Per-(nation, month) conversion rate derived from orders — the as-of
    right side (timestamped dimension history). Derivation is rounding-tie
    safe: ``max`` (order-insensitive, unlike avg whose summation order
    differs between Spark partitions and DuckDB) rounded to an integer then
    scaled by 100 — a 2-decimal value needs no further rounding, so the
    engines' different round-half tie-breaking never engages."""
    o, c = star["orders"], star["customer"]
    return (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_trunc("month", "o_orderdate").alias("rate_month"),
        )
        .agg((F.round(F.max("o_totalprice"), 0) / 100.0).alias("conversion_rate"))
    )


def q_asof_rate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders enriched with the most recent monthly rate at order time —
    backward as-of join via union + last-value carry (1 shuffle)."""
    star = load_star(spark, sf_dir, ("orders", "customer"))
    o = star["orders"].join(
        F.broadcast(star["customer"].select("c_custkey", F.col("c_nationkey").alias("nationkey"))),
        star["orders"]["o_custkey"] == F.col("c_custkey"),
    ).select("o_orderkey", "o_orderdate", "o_totalprice", "nationkey")
    enriched = as_of_join(
        o,
        _monthly_rates(star),
        on=["nationkey"],
        left_ts="o_orderdate",
        right_ts="rate_month",
        right_cols=["conversion_rate"],
    )
    return enriched.select(
        "o_orderkey",
        "nationkey",
        "conversion_rate",
        F.round(F.col("o_totalprice") / F.col("conversion_rate"), 4).alias("dollar_amt"),
    )


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs of the same user within (0, 5 min] — bucketed interval
    join (hash join on (user, bucket), never a nested-loop)."""
    ev = load_star(spark, sf_dir, ("events",))["events"].select("event_id", "user_id", "ts")
    a = ev.select("user_id", F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select("user_id", F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    pairs = range_join(a, b, on=["user_id"], left_ts="ts_a", right_ts="ts_b", lower_s=0, upper_s=300)
    return pairs.select(
        "id_a",
        "id_b",
        (F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")).cast("long").alias("gap_s"),
    )


def q_session_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session rollup with a 30-minute inactivity gap
    (gaps-and-islands sessionization)."""
    ev = load_star(spark, sf_dir, ("events",))["events"]
    return session_agg(ev, key="user_id", ts_col="ts", tiebreak="event_id", gap="30 minutes")


def q_rolling_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered analytics: lag/lead + trailing 3-row moving average."""
    ev = load_star(spark, sf_dir, ("events",))["events"]
    return rolling_stats(ev, key="user_id", ts_col="ts", tiebreak="event_id", value_col="value", window_rows=3)


def q_resample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid from first to last event with gap buckets
    forward-filled — the resample/gap-fill primitive
    (operators/temporal.resample_ffill)."""
    from ..operators.temporal import resample_ffill

    ev = load_star(spark, sf_dir, ("events",))["events"]
    return resample_ffill(ev, key="user_id", ts_col="ts", value_col="value")


def q_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase conversion funnel per user (each step
    strictly after the previous step's first qualifying event)."""
    from ..operators.temporal import funnel

    ev = load_star(spark, sf_dir, ("events",))["events"]
    return funnel(ev, steps=["view", "click", "purchase"])


def q_rollup_nation_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(nation, status) totals with 'ALL' supergroup labels."""
    star = load_star(spark, sf_dir, ("orders", "customer", "nation"))
    o, c, n = star["orders"], star["customer"], star["nation"]
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    return (
        j.rollup("n_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: exact distinct counts PLUS HyperLogLog sketches
    (approx_count_distinct — the 100 TB path where exact distinct is a full
    shuffle) asserted to land within the 2% rsd envelope of the exact
    answer. HLL sketch values are engine-specific, so the approx side is
    oracle-checked as a boolean accuracy assertion, not a value compare."""
    o = load_star(spark, sf_dir, ("orders",))["orders"]
    prof = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.countDistinct("o_orderkey").alias("n_orderkeys"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("hll_custkeys"),
        F.approx_count_distinct("o_orderkey", rsd=0.02).alias("hll_orderkeys"),
    )
    within = lambda hll, exact: (  # noqa: E731
        F.abs(F.col(hll) - F.col(exact)) <= F.col(exact) * 0.05
    )
    return prof.select(
        "n_rows",
        "n_custkeys",
        "n_orderkeys",
        "n_statuses",
        "n_priorities",
        within("hll_custkeys", "n_custkeys").alias("hll_custkeys_ok"),
        within("hll_orderkeys", "n_orderkeys").alias("hll_orderkeys_ok"),
    )


TEMPORAL_QUERIES = {
    "asof_rate_orders": q_asof_rate_orders,
    "range_join_events": q_range_join_events,
    "session_agg_events": q_session_agg_events,
    "rolling_user_stats": q_rolling_user_stats,
    "rollup_nation_status": q_rollup_nation_status,
    "profile_orders": q_profile_orders,
}
