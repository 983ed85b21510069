"""Join operators (SURVEY.md §2.3, J1-J10).

Design rules for 100 TB scale:
- dims are always broadcast (``F.broadcast``) — all reference dims are KB-MB;
- the null-tolerant multi-key join (J3, ``I:101-109``) keeps its 5 equi keys
  as an explicit ``on`` conjunction so Catalyst picks SortMergeJoin /
  ShuffledHashJoin, with the null-tolerant residuals as extra predicates —
  writing the residual CASE-expressions alone degrades to a
  BroadcastNestedLoopJoin (SURVEY.md §4.2); a plan-shape test asserts this;
- constant-pinned dim joins (J5, ``I:235,244,248``) pre-filter the dim to the
  pinned row(s) then broadcast, so no fact-side shuffle is ever introduced.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J1/J2/J8/J9 — equi join against a small dimension, always broadcast
    (``I:96-100``, ``I:301-306``). No shuffle on the fact side."""
    return fact.join(F.broadcast(dim), on, how)


def null_tolerant_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[tuple[str, str]],
    null_tolerant_pairs: Sequence[tuple[Column, Column]] = (),
    extra: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """J3 — multi-key equi join with null-tolerant residual predicates
    (``I:101-109``).

    ``equi_keys`` are (left_col, right_col) name pairs joined with ``==`` —
    these drive the shuffle/hash join. Each ``null_tolerant_pairs`` (l, r)
    renders the reference's ``CASE WHEN l IS NULL THEN 1 WHEN l = r THEN 1
    ELSE 0 END = 1`` as ``l.isNull() | r.isNull() | (l == r)`` residuals,
    which Catalyst keeps as join residuals on top of the hash join.
    """
    cond: Column | None = None
    for lc, rc in equi_keys:
        p = left[lc] == right[rc]
        cond = p if cond is None else cond & p
    for lc_col, rc_col in null_tolerant_pairs:
        p = lc_col.isNull() | rc_col.isNull() | (lc_col == rc_col)
        cond = p if cond is None else cond & p
    if extra is not None:
        cond = extra if cond is None else cond & extra
    return left.join(right, cond, how)


def const_pinned_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    pin: Column,
    how: str = "left",
) -> DataFrame:
    """J5 — left join whose only condition pins the dim to constants
    (``forex.from_currency = 'CNY'`` I:232-235; ``region_id = 7`` I:245-248).

    Pre-filter the dim to the pinned row(s), then join on a constant-true
    condition — a broadcast of a 1-row side, never a real cross product.
    """
    pinned = dim.filter(pin)
    return fact.join(F.broadcast(pinned), F.lit(True), how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_unique: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi join (SURVEY.md §4.3's documented fallback when AQE
    skew splitting isn't enough): the skewed (left) side gets a deterministic
    salt in [0, salt_buckets) derived from a unique column — NOT ``rand()``,
    which breaks task-retry determinism — and the right side is replicated
    ``salt_buckets``× via explode. The join key becomes (key, salt), so one
    hot key spreads over ``salt_buckets`` reducers.

    Cost: right side shuffled ``salt_buckets``× — use for skewed-fact ⋈
    mid-size table where broadcast doesn't fit and one key dominates.
    Output columns match ``left.join(right, on, how)``.
    """
    salt = F.pmod(F.xxhash64(F.col(left_unique)), F.lit(salt_buckets))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")


def normalized_key_join(
    left: DataFrame,
    right: DataFrame,
    left_expr: Callable[[DataFrame], Column],
    right_expr: Callable[[DataFrame], Column],
    extra: Column | None = None,
    how: str = "left",
) -> DataFrame:
    """J6/J7 — equi join on computed (case-/regex-normalized) keys
    (``UPPER(channel_name) = UPPER(code)`` I:253-256; the double
    REGEXP_REPLACE key I:257-264). Still an equi join for Catalyst because
    both sides are deterministic expressions."""
    cond = left_expr(left) == right_expr(right)
    if extra is not None:
        cond = cond & extra
    return left.join(F.broadcast(right), cond, how)


def runtime_filtered_join_confs(
    creation_side_threshold: str = "1GB",
    application_side_scan_threshold: str = "0",
) -> dict[str, str]:
    """Conf set that makes Catalyst inject a RUNTIME BLOOM FILTER into
    large-large shuffled joins (``InjectRuntimeFilter``): the selective
    build side aggregates a bloom filter of its join keys, and the probe
    side's scan gets a ``might_contain`` predicate — rows that cannot match
    are dropped BEFORE the shuffle, which at 100 TB is the difference
    between shuffling the whole fact table and shuffling only the matching
    slice. This is the engine-native answer to "semi-join against a set too
    big to broadcast". Two limitations, plan-pinned in tests: the rewrite
    only fires for join types that may prune the probe side (Inner /
    LeftSemi — never the probe side of a LEFT OUTER join), and the probe
    key's lineage must reach a scan (a key derived through an explode is
    not traced — ``curation.contamination_check`` hand-rolls a coarse
    bucket tier for exactly that reason).

    Spark enables the feature by default but gates it on size estimates
    (creation side < 10 MB, probe scan > 10 GB); these confs widen the gate.
    Apply with::

        with_confs(spark, runtime_filtered_join_confs())

    or set them per-cluster. Correctness is unaffected — bloom false
    positives only let extra rows through to the exact join.
    """
    return {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": creation_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": application_side_scan_threshold,
    }


class with_confs:
    """Context manager: set SQL confs, restore previous values on exit."""

    def __init__(self, spark, confs: dict[str, str]):
        self.spark, self.confs, self._saved = spark, confs, {}

    def __enter__(self):
        # save ALL current values first, then apply — and roll back on a
        # failed set: __exit__ never runs when __enter__ raises, so a
        # partial apply would otherwise leak confs into the shared session
        for k in self.confs:
            try:
                self._saved[k] = self.spark.conf.get(k)
            except Exception:
                self._saved[k] = None
        try:
            for k, v in self.confs.items():
                self.spark.conf.set(k, v)
        except Exception:
            self.__exit__(None, None, None)
            raise
        return self.spark

    def __exit__(self, *exc):
        for k, old in self._saved.items():
            if old is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, old)
        return False
