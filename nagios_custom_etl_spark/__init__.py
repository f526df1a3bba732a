"""nagios_custom_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL (wbneville/nagios-custom-ETL, read-only at /root/reference):
its data model, relational operators, incremental/streaming semantics and
sources/sinks — plus the LLM-data-pipeline extension operators (dedup,
similarity search, multimodal columns, text analysis).

Design stance (see SURVEY.md §7):
  * DataFrame/SQL on Spark builtins; zero Python UDFs on the hot path.
  * Explicit schemas everywhere; no first-row schema inference
    (the reference's load_to_db.py:46-47 bug class).
  * Structured Streaming for the reference's cron-micro-batch semantics.
  * No custom Catalyst rules; Catalyst/AQE own physical planning.
"""

__version__ = "0.1.0"

from nagios_custom_etl_spark.session import get_spark  # noqa: F401
from nagios_custom_etl_spark.catalog import load_table, register_views, TABLES  # noqa: F401
