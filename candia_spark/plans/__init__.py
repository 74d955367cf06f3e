from candia_spark.plans.queries import QUERY_REGISTRY, queries, oracle_sql  # noqa: F401
