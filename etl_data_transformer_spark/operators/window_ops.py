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
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum per window (+ optional extra keys).

    Emits ``window_start`` (timestamp) rather than the struct so results are
    plain-SQL comparable. ``slide`` switches to the HOPPING form (see
    ``hopping_agg``) — one body serves both, mirroring the streaming twin
    ``stream_tumbling_agg(slide=...)`` (round-9 review: the two copies
    would otherwise drift).
    """
    win = (
        F.window(F.col(ts_col), duration, slide)
        if slide is not None
        else F.window(F.col(ts_col), duration)
    )
    keys = [win.alias("w")] + [F.col(c) for c in (group_extra or [])]
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


def hopping_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """HOPPING (sliding) window count/sum — ``tumbling_agg``'s overlapping
    twin: every event lands in each of the duration/slide windows covering
    its timestamp (``F.window``'s three-arg form), the standard smoothing
    window for rate/trend dashboards that tumbling buckets quantize too
    coarsely. Same output shape as ``tumbling_agg`` (``window_start`` +
    extra keys + count/sum), so the two interchange downstream.

    Scale shape: the window expansion is a JVM-side generator (one row in,
    duration/slide rows out) feeding the same single groupBy shuffle as
    tumbling — cost scales with the overlap factor, which the caller
    chooses. The streaming twin is ``streaming.stream_tumbling_agg(slide=
    ...)`` (watermark + windowed state, closed windows evicted). Thin
    alias over ``tumbling_agg(slide=...)`` — one body, no drift."""
    return tumbling_agg(df, ts_col, duration, group_extra, slide=slide)
