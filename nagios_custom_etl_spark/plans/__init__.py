"""Query registry: every operator from SURVEY.md §2 lands here as a named
query (PySpark callable) plus, where SQL-expressible, a DuckDB oracle SQL
string. The driver contract (__spark_entry__.py) is assembled from this
registry.
"""

from nagios_custom_etl_spark.plans.registry import Query, all_queries, register  # noqa: F401

# Importing the plan modules populates the registry.
from nagios_custom_etl_spark.plans import relational  # noqa: F401,E402
from nagios_custom_etl_spark.plans import scalar_etl  # noqa: F401,E402
from nagios_custom_etl_spark.plans import extensions  # noqa: F401,E402
from nagios_custom_etl_spark.plans import streaming_queries  # noqa: F401,E402
