from nagios_custom_etl_spark.sinks import influx, jdbc_routed  # noqa: F401
