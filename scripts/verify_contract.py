"""Driver-contract verification: run every queries() entry at a given
sf_dir and compare against its oracle_sql() in DuckDB (sorted-column,
order-insensitive, exact values). Usage:

    python scripts/verify_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from nagios_custom_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_query, duckdb_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("verify-contract")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    timings: dict[str, float] = {}
    t_start = time.monotonic()
    for name in qs:  # driver-contract order (unscored families first)
        t0 = time.monotonic()
        if name in osql:
            try:
                compare_query(spark, sf_dir, qs[name], osql[name])
                timings[name] = time.monotonic() - t0
                print(f"{name}: MATCH [{timings[name]:.2f}s]")
            except AssertionError as ex:
                print(f"{name}: MISMATCH — {ex}")
                failures.append(name)
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR — {type(ex).__name__}: {str(ex)[:200]}")
                failures.append(name)
        else:
            try:
                n = qs[name](spark, sf_dir).count()
                timings[name] = time.monotonic() - t0
                print(f"{name}: rows-only ({n} rows) [{timings[name]:.2f}s]")
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR — {type(ex).__name__}: {str(ex)[:200]}")
                failures.append(name)
    total = time.monotonic() - t_start
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(f"\ntotal {total:.1f}s; slowest: " + ", ".join(f"{n}={s:.2f}s" for n, s in slowest))
    print(f"\n{len(qs)} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
