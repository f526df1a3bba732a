"""Relational core queries (SURVEY.md §2.3–§2.7) with DuckDB oracles.

Each query exercises one operator family from the SURVEY inventory on the
driver fixture tables. Scale notes accompany the non-obvious plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.functions.scalar import davg, dec, dsum
from nagios_custom_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — SURVEY §7 Milestone 0.
# Exercises S8 parquet scan, P7 time-range predicate (pushed to the scan),
# hash aggregate with partial (map-side) combine, F1-style exact numeric
# semantics. At 100 TB this is a single scan + one shuffle on a 6-value
# grouping key; AQE coalesces the tiny post-agg partitions.
# ---------------------------------------------------------------------------

Q1_CUTOFF = "2000-09-02"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
               * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Flagship pricing-summary aggregate (scan+filter+hash agg).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    disc_price = price * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1).cast("decimal(12,2)") + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 12, 2).alias("sum_qty"),
            dsum("l_extendedprice", 12, 2).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", 12, 2).alias("avg_qty"),
            davg("l_extendedprice", 12, 2).alias("avg_price"),
            davg("l_discount", 12, 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
