"""Vector expressions over ``array<float>`` embedding columns
(SURVEY.md §2.10; fixtures ``embeddings.embedding``).

All math stays JVM-side via higher-order functions (``zip_with`` /
``aggregate``) in double precision — no Python in the hot path. The
brute-force cosine here is the correctness oracle; the scale path is the
LSH/IVF variants in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, accumulated in double."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def unit_normalize(a: Column | str) -> Column:
    """Scale to unit L2 norm (pre-normalize once → cosine becomes dot).

    The norm is computed ONCE and carried via ``array_repeat`` — naming it
    inside a per-element lambda would re-run the O(dim) dot fold per
    element (O(dim²)/row; Spark doesn't hoist loop invariants out of
    higher-order-function lambdas — the ``matryoshka_truncate`` lesson).
    Zero-norm vectors pass through as zeros rather than NULL elements
    (division by zero is NULL non-ANSI, which poisons ``array_to_vector``
    consumers downstream — round-6 review)."""
    c = _c(a)
    n = l2_norm(a)
    unit = F.zip_with(
        c, F.array_repeat(n, F.size(c)), lambda x, nn: x.cast("double") / nn
    )
    return F.when(n > 0, unit).otherwise(
        F.transform(c, lambda x: x.cast("double") * F.lit(0.0))
    )


def quant_scale(a: Column | str) -> Column:
    """Symmetric int8 quantization scale: max|x| / 127."""
    absmax = F.array_max(F.transform(_c(a), lambda x: F.abs(x.cast("double"))))
    return absmax / F.lit(127.0)


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Quantize to int8 codes (as longs): round(x / scale). At 100 TB this
    is the 4× embedding-storage lever; keep the per-vector ``scale`` column
    for dequantization (x ≈ code * scale)."""
    return F.transform(_c(a), lambda x: F.round(x.cast("double") / scale, 0).cast("long"))


def quant_rmse(a: Column | str, scale: Column) -> Column:
    """Root-mean-square reconstruction error of int8 quantization."""
    err2 = F.transform(
        _c(a),
        lambda x: F.pow(x.cast("double") - F.round(x.cast("double") / scale, 0) * scale, F.lit(2.0)),
    )
    return F.sqrt(F.aggregate(err2, F.lit(0.0), lambda acc, v: acc + v) / F.size(_c(a)))


def matryoshka_truncate(a: Column | str, dim: int) -> Column:
    """Matryoshka-style dimensionality reduction: keep the FIRST ``dim``
    components and re-normalize to unit L2 (MRL-trained embeddings order
    information by prefix, so the truncated prefix is itself a valid
    embedding). At 100 TB this is the cheap recall/latency dial: a 4×
    truncation cuts ANN index storage and probe IO 4× with a known small
    recall cost — pair with ``operators/similarity.ivf_*`` or
    ``quantize_int8`` (the levers compose).

    Expression shape (review finding): the norm is evaluated ONCE per row
    inside ``array_repeat`` and the division runs as ``zip_with`` over
    lambda variables only — referencing the norm subtree from inside a
    ``transform`` lambda would re-evaluate the O(dim) fold per ELEMENT
    (O(dim²)/row; Spark does not hoist loop invariants out of
    higher-order-function lambdas). Vectors shorter than ``dim`` raise at
    runtime (``assert_true``) instead of silently returning a short prefix.
    """
    if dim <= 0:
        raise ValueError("dim must be positive")
    arr = _c(a)
    pre = F.slice(arr, 1, dim)
    n = F.sqrt(
        F.aggregate(
            pre, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    checked = F.when(
        F.assert_true(
            F.size(arr) >= dim,
            F.concat(F.lit(f"matryoshka_truncate: vector shorter than dim={dim}: "), F.size(arr).cast("string")),
        ).isNull(),
        F.zip_with(pre, F.array_repeat(n, dim), lambda x, nn: x.cast("double") / nn),
    )
    return checked
