"""User-defined function surface (SURVEY.md §2.10): one worked example per
extension point — scalar pandas UDF, grouped-agg pandas UDAF, and a Python
UDTF — so pipeline authors have a vetted template for logic that genuinely
can't be a built-in expression.

The engine's rule stands: built-ins first (everything in §2.7 is JVM-side);
these are the documented escape hatches, all Arrow-batched — never
row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf(T.DoubleType())
def sigmoid(v: pd.Series) -> pd.Series:
    """Scalar pandas UDF (Series→Series, Arrow-batched): a shape built-ins
    can't express when the real body is a numpy/model call."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-v.astype("float64")))


@pandas_udf(T.DoubleType())
def weighted_avg(values: pd.Series, weights: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg pandas UDAF: sum(v·w)/sum(w) per group. Use with
    ``df.groupBy(...).agg(weighted_avg("price", "qty"))`` — Spark runs it as
    partial per-group Arrow batches. (A pure-SQL twin exists; the UDAF form
    is the template for aggregations that need numpy/scipy internals.)"""
    import numpy as np

    w = weights.astype("float64")
    tot = float(np.sum(w))
    return float(np.sum(values.astype("float64") * w) / tot) if tot else float("nan")


@udtf(returnType="sentence_idx int, sentence string")
class SplitSentences:
    """Python UDTF: one input row → N output rows (here: naive sentence
    split). The lateral-join shape for expansion logic too stateful for
    ``explode(split(...))`` — e.g. a real tokenizer or parser.

    Usage: ``SplitSentences(F.col("text"))`` in a ``select``/``lateralJoin``.
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        buf: list[str] = []
        idx = 0
        for ch in text:
            buf.append(ch)
            if ch in ".!?":
                s = "".join(buf).strip()
                if s:
                    yield idx, s
                    idx += 1
                buf = []
        tail = "".join(buf).strip()
        if tail:
            yield idx, tail
