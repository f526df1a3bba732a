from nagios_custom_etl_spark.streaming import ops  # noqa: F401
