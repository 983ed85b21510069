"""etl_data_transformer_spark — a PySpark-native analytics/ETL engine.

From-scratch engine with the query and data-processing capabilities of the
reference repo ``aditichaubey/etl-data-transformer`` (a pandas CSV cleanse +
a BigQuery incremental fact load), re-expressed Spark-first: DataFrame/SQL
logical plans, Catalyst/AQE physical planning, broadcast dim joins,
partitioned incremental loads, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).
"""

from .session import get_spark

__all__ = ["get_spark"]
