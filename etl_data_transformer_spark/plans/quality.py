"""Declarative data-quality expectations — the validation pass an ETL
engine runs before publishing a load (dbt-test / Deequ-style), absent from
the reference (its only guard is the row-count audit insert,
``Incremental_load_fact_item_status.sql:332-342``; C5/A6) but a core
warehouse-contract feature.

``validate_expectations`` evaluates a rule list against one DataFrame and
returns (rule, kind, violations, passed) — one row per rule.

Scale shape (the point of the design):

- Every ROW-LEVEL rule (not_null / accepted_values / in_range / matches /
  expression) compiles to one ``sum(CASE)`` aggregate, and ALL of them run
  in a SINGLE scan + partial-agg pass — adding a rule adds one codegen'd
  accumulator, not a pass. At 100 TB the whole row-level suite costs one
  map-side-combined aggregation of the table.
- ``unique`` needs a shuffle by its key (count per key) — one exchange per
  distinct key set, shared when several rules use the same keys.
- ``references`` (foreign key ⊆ dimension) is a LEFT ANTI join against the
  distinct reference keys — broadcast when the dimension is small, shuffle
  otherwise; Spark's planner picks via ``autoBroadcastJoinThreshold``.

NULL contract (explicit, dbt-compatible): ``not_null`` is the ONLY rule
that counts NULLs as violations. Every other row-level rule PASSES null
inputs (a null can't fail a range/set/regex check — compose with
``not_null`` to forbid them); ``unique`` ignores rows with any null key
part; ``references`` ignores null foreign keys. This keeps each rule
single-purpose and the violation counts non-overlapping.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named rule. Build with the factory classmethods, not directly."""

    name: str
    kind: str
    columns: tuple[str, ...] = ()
    params: tuple = field(default=())
    # live objects (the `references` dimension DataFrame) sit here, NOT in
    # params: excluded from eq/hash/repr so rules stay comparable,
    # hashable-by-value, and safe to dedupe or cache.
    ref: object = field(default=None, compare=False, repr=False)

    @classmethod
    def not_null(cls, column: str, name: str | None = None) -> "Expectation":
        return cls(name or f"{column}_not_null", "not_null", (column,))

    @classmethod
    def unique(cls, *columns: str, name: str | None = None) -> "Expectation":
        if not columns:
            raise ValueError("unique requires at least one column")
        return cls(name or "_".join(columns) + "_unique", "unique", tuple(columns))

    @classmethod
    def accepted_values(cls, column: str, *values, name: str | None = None) -> "Expectation":
        return cls(name or f"{column}_accepted_values", "accepted_values", (column,), tuple(values))

    @classmethod
    def in_range(cls, column: str, lo, hi, name: str | None = None) -> "Expectation":
        return cls(name or f"{column}_in_range", "in_range", (column,), (lo, hi))

    @classmethod
    def matches(cls, column: str, pattern: str, name: str | None = None) -> "Expectation":
        return cls(name or f"{column}_matches", "matches", (column,), (pattern,))

    @classmethod
    def expression(cls, name: str, sql_bool_expr: str) -> "Expectation":
        """Arbitrary boolean SQL over the row; NULL result passes."""
        return cls(name, "expression", (), (sql_bool_expr,))

    @classmethod
    def references(
        cls, column: str, ref: DataFrame, ref_column: str, name: str | None = None
    ) -> "Expectation":
        # fold a fingerprint of the dimension's logical plan into params:
        # ``ref`` itself is a live object excluded from eq/hash, so without
        # this two references rules on the same fk/ref_column against
        # DIFFERENT dimensions (default names) would compare and hash
        # equal, and any dedupe/cache keyed on the rule would silently drop
        # one of two genuinely different checks (round-8 advice)
        return cls(
            name or f"{column}_references",
            "references",
            (column,),
            (ref_column, ref.semanticHash()),
            ref=ref,
        )


def _row_condition(rule: Expectation) -> Column:
    c = F.col(rule.columns[0]) if rule.columns else None
    if rule.kind == "not_null":
        return c.isNotNull()
    if rule.kind == "accepted_values":
        return c.isin(list(rule.params))
    if rule.kind == "in_range":
        lo, hi = rule.params
        return (c >= F.lit(lo)) & (c <= F.lit(hi))
    if rule.kind == "matches":
        return c.rlike(rule.params[0])
    if rule.kind == "expression":
        return F.expr(rule.params[0])
    raise ValueError(f"not a row-level rule: {rule.kind}")


_ROW_KINDS = ("not_null", "accepted_values", "in_range", "matches", "expression")


def validate_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """(rule, kind, violations, passed) — one row per rule, see module doc
    for the per-kind pass structure and NULL contract."""
    if not rules:
        raise ValueError("no rules given")
    if len({r.name for r in rules}) != len(rules):
        raise ValueError("rule names must be unique")
    parts: list[DataFrame] = []

    row_rules = [r for r in rules if r.kind in _ROW_KINDS]
    if row_rules:
        # one scan, one partial-aggregated pass for the whole row-level
        # suite; "cond IS FALSE" counting makes NULL results pass for
        # every kind except not_null (whose condition is never NULL)
        aggs = [
            F.sum(F.coalesce((~_row_condition(r)).cast("long"), F.lit(0))).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        stacked = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.lit(r.kind).alias("kind"),
                            F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("violations"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("r")
        ).select("r.*")
        parts.append(stacked)

    for r in rules:
        if r.kind == "unique":
            keys = [F.col(c) for c in r.columns]
            nn = reduce(lambda a, b: a & b, [k.isNotNull() for k in keys])
            dup_keys = (
                df.filter(nn)
                .groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            parts.append(
                dup_keys.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("violations"),
                )
            )
        elif r.kind == "references":
            ref, ref_col = r.ref, r.params[0]
            fk = r.columns[0]
            orphans = (
                df.filter(F.col(fk).isNotNull())
                .select(F.col(fk).alias("__fk"))
                .join(
                    ref.select(F.col(ref_col).alias("__fk")).distinct(),
                    "__fk",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            parts.append(
                orphans.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("violations"),
                )
            )
        elif r.kind not in _ROW_KINDS:
            raise ValueError(f"unknown rule kind: {r.kind}")

    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.select(
        "rule", "kind", "violations", (F.col("violations") == 0).alias("passed")
    )


def corpus_stats(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Dataset-card profile of a document corpus (round 10): the per-group
    summary every published dataset release ships (docs, token mass,
    character mass, the largest document) — per (lang, source) by default,
    all EXACT BIGINTs so the row set is engine-hash-exact. This is the
    read-side companion of the curation pipeline: mixture weights,
    stratified caps and the frozen scored-cut threshold are all set by
    looking at exactly this table.

    Scale shape: ONE map-side-combined groupBy over a map-only projection
    (token counting is `size` of the filtered split array — no explode),
    output one row per group. At 100 TB this is the cheapest full-corpus
    pass the engine offers."""
    from ..functions.text import tokens

    # coalesce: size(tokens(NULL)) is -1 under Spark's default legacy
    # sizeOfNull, which would subtract from tok_sum while the DuckDB
    # twin's SUM skips NULLs (round-11 advice; same fix as domain_stats)
    toks = F.size(
        F.filter(
            tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda t: F.length(t) > 0,
        )
    )
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("tok_sum"),
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).cast("long").alias("char_sum"),
        F.max(toks).cast("long").alias("max_tokens"),
    )


# ------------------------- incremental corpus-stats store (round 11) -------
# The dataset-card profile over a GROWING corpus without re-scanning it:
# every corpus_stats column is merge-able (counts/sums are additive,
# max_tokens is max-mergeable), so the store holds per-batch PARTIAL rows
# (exactly corpus_stats(batch)) and the merged view is one groupBy over
# batch-count-many rows — the same additive-counter discipline as the NB
# count store and the passage count store. Group columns are pinned in a
# sidecar (partials grouped differently never merge meaningfully); appends
# validate it, rebuilds swap it atomically with the data.

_STATS_STORE_ALGO = "corpus-stats-partials-v1"


def _stats_params(group_cols: tuple) -> dict:
    return {"algo": _STATS_STORE_ALGO, "group_cols": list(group_cols)}


def ensure_stats_params_sidecar(
    path: str, group_cols: tuple = ("lang", "source")
) -> None:
    import os

    from ..operators.dedup import _validate_store_params, _write_params_sidecar
    from ..sources.writers import recover_interrupted_swap

    recover_interrupted_swap(path)
    sidecar = os.path.join(path, "_stats_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, _stats_params(group_cols), label="corpus-stats")
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, _stats_params(group_cols))


def write_stats_store(
    batch: DataFrame,
    path: str,
    *,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    mode: str = "append",
) -> None:
    """Append one batch's PARTIAL profile (= ``corpus_stats(batch)``) to
    the store; ``mode='overwrite'`` rebuilds from the given frame through
    the crash-safe atomic swap (sidecar lands with the data). A flat
    append onto a STREAMING (``__batch_id``-partitioned,
    ``stream_stats_rows``) store rejects — mixing layouts corrupts
    partition discovery (round-12 review; the shared store rule)."""
    import os

    from ..operators.dedup import _reject_streaming_layout_append, _write_params_sidecar
    from ..sources.writers import atomic_swap_write

    rows = corpus_stats(batch, group_cols, text_col)
    if mode == "overwrite":
        atomic_swap_write(
            rows,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_stats_params.json"), _stats_params(group_cols)
            ),
        )
        return
    ensure_stats_params_sidecar(path, group_cols)
    _reject_streaming_layout_append(rows, path, "corpus-stats")
    rows.write.mode("append").parquet(path)


def read_corpus_stats(
    spark, path: str, group_cols: tuple = ("lang", "source")
) -> DataFrame:
    """Merged dataset-card profile over every batch landed so far: one
    groupBy over the partial rows (sums add, max_tokens maxes) —
    equivalent to ``corpus_stats`` over the concatenated corpus
    (equivalence pinned by ``tests/test_domains.py``), at batch-count
    cost instead of corpus cost."""
    ensure_stats_params_sidecar(path, group_cols)
    partials = spark.read.parquet(path)
    return partials.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("tok_sum").cast("long").alias("tok_sum"),
        F.sum("char_sum").cast("long").alias("char_sum"),
        F.max("max_tokens").cast("long").alias("max_tokens"),
    )


def compact_stats_store(
    spark, path: str, group_cols: tuple = ("lang", "source")
) -> None:
    """Collapse the accumulated partials to one row per group (the merged
    view materialized) through the atomic swap — reads after compaction
    return identical profiles over fewer files. A STREAMING store refuses
    compaction while its ``__batch_id`` partitions are live (the NB-store
    rule): flattening would break the stream's replay-overwrite sink."""
    import os

    from ..operators.dedup import _write_params_sidecar
    from ..sources.writers import atomic_swap_write

    if "__batch_id" in spark.read.parquet(path).columns:
        raise ValueError(
            f"stats store at {path} has the streaming (__batch_id) layout; "
            "compacting it flat would break the stream's replay-overwrite "
            "sink — stop the stream and rebuild flat first"
        )
    merged = read_corpus_stats(spark, path, group_cols).localCheckpoint(eager=True)
    atomic_swap_write(
        merged,
        path,
        finalize_staging=lambda staging: _write_params_sidecar(
            os.path.join(staging, "_stats_params.json"), _stats_params(group_cols)
        ),
    )
