from nagios_custom_etl_spark.operators import dedup, similarity  # noqa: F401
