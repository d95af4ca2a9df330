from pgsf_spark.analytics.registry import QUERIES, QuerySpec  # noqa: F401
