from etl_active911_spark.plans.registry import QUERIES, ORACLES, query  # noqa: F401
