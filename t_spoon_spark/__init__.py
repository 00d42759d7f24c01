"""t_spoon_spark — a PySpark-native engine with the capabilities of
affo/t-spoon (transactional dataflow over keyed MVCC state, snapshot
queryable state, single-partition updates, windowed analytics, WAL
durability), rebuilt Spark-first on DataFrames / Spark SQL /
Structured Streaming, plus the relational + training-data-pipeline
surface (dedup, similarity search, text analysis) that a 100 TB
deployment needs.

See SURVEY.md for the reference analysis this implements.
"""

from t_spoon_spark.session import build_spark, load_tables

__all__ = ["build_spark", "load_tables"]
