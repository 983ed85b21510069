"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the ITEM_STATUS branch of the
incremental fact load, SURVEY.md §7.1 Slice B) at sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md §2
plus the LLM-pipeline and temporal extensions (catalog package — 50 queries,
sized to the driver's 50-query check budget and FROZEN at the round-14 set
for the optimization rounds; inventory map in COVERAGE.md);
``oracle_sql()`` gives the DuckDB twin for every query. Approximate
operators (MinHash LSH, ANN LSH/IVF, SimHash, HLL) are oracle-checked via
exact-verification or accuracy-assertion outputs rather than left
unchecked — e.g. ``simhash_blocked_recall`` asserts the
non-SQL-expressible xxhash64 bit-fold recalls every exact char-3-gram
near-dup pair through the blocked scale path.

Column aliases match exactly on both sides (the driver sorts columns by name
before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_data_transformer_spark.catalog import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ITEM_STATUS incremental branch at sf0.001 (rows > 0)."""
    return QUERIES["item_status"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
