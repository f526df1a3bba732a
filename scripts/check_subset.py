"""Oracle-check a SUBSET of registry queries (r14 optimization round:
fast inner-loop verification between full contract runs).

    python scripts/check_subset.py [sf_dir] name [name...]

Same compare_query machinery as verify_contract.py; prints MATCH /
rows-only per name and exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nagios_custom_etl_spark.plans import all_queries  # noqa: E402
from nagios_custom_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_query  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("check-subset")
    registry = all_queries()
    failures = []
    for name in names:
        q = registry[name]
        t0 = time.monotonic()
        try:
            if q.oracle is not None:
                compare_query(spark, sf_dir, q.fn, q.oracle)
                print(f"{name}: MATCH [{time.monotonic() - t0:.2f}s]")
            else:
                n = q.fn(spark, sf_dir).count()
                print(f"{name}: rows-only ({n} rows) [{time.monotonic() - t0:.2f}s]")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAIL — {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
    print(f"{len(names)} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
