"""Driver-contract verification: run every queries() entry at a given
sf_dir and compare against its oracle_sql() in DuckDB (sorted-column,
order-insensitive, exact values). Usage:

    python scripts/verify_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from nagios_custom_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_query, duckdb_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("verify-contract")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name in sorted(qs):
        if name in osql:
            try:
                compare_query(spark, sf_dir, qs[name], osql[name])
                print(f"{name}: MATCH")
            except AssertionError as ex:
                print(f"{name}: MISMATCH — {ex}")
                failures.append(name)
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR — {type(ex).__name__}: {str(ex)[:200]}")
                failures.append(name)
        else:
            try:
                n = qs[name](spark, sf_dir).count()
                print(f"{name}: rows-only ({n} rows)")
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR — {type(ex).__name__}: {str(ex)[:200]}")
                failures.append(name)
    print(f"\n{len(qs)} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
