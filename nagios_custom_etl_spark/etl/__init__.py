from nagios_custom_etl_spark.etl import nagios  # noqa: F401
