from cassandra_sql_spark.functions.pg import register_pg_functions

__all__ = ["register_pg_functions"]
