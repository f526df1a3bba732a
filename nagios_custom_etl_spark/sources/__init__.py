from nagios_custom_etl_spark.sources import rest  # noqa: F401
