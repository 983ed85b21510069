"""Time-window aggregation over event streams, batch form (SURVEY.md §2.9).

The reference has no streaming surface — its ``v_delta_offset`` is a batch
high-water mark. ``F.window`` tumbling aggregation is exposed here as a batch
operator over ts-keyed tables (``events``); the true streaming twin (same
transformation, ``readStream`` + watermark) lives in ``streaming/pipeline.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window count/sum per window (+ optional extra keys).

    Emits ``window_start`` (timestamp) rather than the struct so results are
    plain-SQL comparable.
    """
    keys = [F.window(F.col(ts_col), duration).alias("w")] + [F.col(c) for c in (group_extra or [])]
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        *[F.col(c) for c in (group_extra or [])],
        "n_events",
        "sum_value",
    )
