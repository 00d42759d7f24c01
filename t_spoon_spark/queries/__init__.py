"""Query corpus: every entry here is a (PySpark impl, DuckDB oracle)
pair registered with t_spoon_spark.registry and surfaced through
__spark_entry__.queries()/oracle_sql().
"""
