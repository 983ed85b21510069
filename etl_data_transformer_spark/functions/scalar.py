"""Scalar expression library (SURVEY.md §2.7, F1-F15).

Thin, tested wrappers over ``pyspark.sql.functions`` for every scalar
construct the reference exercises. All JVM-side / codegen'd — no Python UDFs.
Reference lines cited per function (``I:`` = Incremental_load_fact_item_status.sql).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str, sep: str = "#") -> Column:
    """F1 — ``CONCAT(a,'#',b,'#',c)`` composite-key synthesis (I:62,69,80,196,276,290).

    NULL parts are skipped by concat_ws (BigQuery CONCAT would null the whole
    key; the reference only applies this to non-null key parts).
    """
    return F.concat_ws(sep, *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols])


def case_map(col: Column | str, mapping: Mapping[object, object], default: Column | object = None) -> Column:
    """F2 — multi-branch ``CASE WHEN col = k THEN v`` lookup (I:217-229).

    For large mappings this stays a single codegen'd CASE expression; genuinely
    big lookup tables should be broadcast-join dims instead (J6).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        branch = v if isinstance(v, Column) else F.lit(v)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    if expr is None:
        return default if isinstance(default, Column) else F.lit(default)
    return expr.otherwise(default if isinstance(default, Column) else F.lit(default))


def ifnull(a: Column | str, b: Column | object) -> Column:
    """F3 — ``IFNULL(a, b)`` (I:17,80,207,274,290)."""
    a = F.col(a) if isinstance(a, str) else a
    b = b if isinstance(b, Column) else F.lit(b)
    return F.coalesce(a, b)


def safe_divide(num: Column | str, den: Column | str) -> Column:
    """F4 — ``SAFE_DIVIDE``: NULL on division by zero (I:83,85,210,293,295).

    ``try_divide`` is ANSI-mode-proof (plain ``/`` also NULLs on 0 only in
    non-ANSI mode).
    """
    num = F.col(num) if isinstance(num, str) else num
    den = F.col(den) if isinstance(den, str) else den
    return F.try_divide(num, den)


def ts(col: Column | str) -> Column:
    """F5/F6 — CAST to timestamp / ``TIMESTAMP(x)`` (I:15,216,299,307)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def lookback(col: Column | str, days: int) -> Column:
    """F8 — ``DATE_SUB(ts, INTERVAL n DAY)`` (I:17)."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.expr(f"INTERVAL {int(days)} DAYS")


def day_floor_string(col: Column | str) -> Column:
    """F11 — ``CONCAT(FORMAT_DATETIME('%Y-%m-%d', ts), ' 00:00:00')`` (I:185):
    floor a timestamp to the day, rendered as a string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.date_trunc("day", c), "yyyy-MM-dd HH:mm:ss")


def two_digit_year(col: Column | str) -> Column:
    """F10 — ``CAST(FORMAT_DATE('%y', d) AS int64)`` (I:124) — the reference's
    2-digit-year quirk, preserved deliberately (SURVEY.md §7.4.3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yy").cast("long")


def norm_upper_key(col: Column | str) -> Column:
    """F12/J6 — case-normalized join key: ``UPPER(x)`` (I:256)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(c)


def strip_digits_parens_key(col: Column | str) -> Column:
    """F13/J7 — the reference's regex-normalized join key (I:260-262):
    ``UPPER(REGEXP_REPLACE(REGEXP_REPLACE(x,'[0-9]',''), '[\\(\\)\\d]+',''))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.regexp_replace(F.regexp_replace(c, "[0-9]", ""), r"[\(\)\d]+", ""))


def deterministic_uuid(*key_cols: Column | str) -> Column:
    """F14 — deterministic surrogate for ``GENERATE_UUID()`` (I:193).

    Real ``uuid()`` breaks hash oracles and idempotent re-loads; the engine
    default is a content-derived sha256 key (SURVEY.md §7.4.1). Use
    ``F.expr("uuid()")`` explicitly where true randomness is wanted.
    """
    return F.sha2(surrogate_key(*key_cols), 256)


def in_list(col: Column | str, values: Iterable[object]) -> Column:
    """P6 — ``col IN (...)`` (I:63-65)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(list(values))


def zorder_key(cols: list, bits: int = 21):
    """Z-order (Morton) key over non-negative integer columns: bit ``b`` of
    column ``i`` lands at position ``b * len(cols) + i``, interleaving the
    dimensions so rows close in EVERY dimension get close keys. Sort/range-
    partition on this key (``sources.writers.write_sorted``) and a scan
    filtered on any subset of the dimensions prunes most files — the
    multi-column data-skipping layout (single-column sort only skips on its
    leading column). ``bits`` caps each dimension at ``2^bits - 1``
    (21 bits × 3 cols fits a long); values are clamped, preserving order.

    Statically unrolled shifts/masks — one codegen'd expression, no UDF.
    """
    n = len(cols)
    if not (1 <= n <= 3):
        raise ValueError("zorder_key interleaves 1-3 columns")
    if bits * n > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    cap = F.lit((1 << bits) - 1)
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = F.least(F.greatest(F.col(c) if isinstance(c, str) else c, F.lit(0)).cast("long"), cap)
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return key
