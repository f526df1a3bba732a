"""r14 optimization-round measurement harness (guide §1: measure first).

Two modes:

  python scripts/profile_r14.py steps <query> [query...]
      Re-run the named registry queries at $SPARK_GRAFT_SF_DIR with every
      snapshots.py / similarity.py operator wall-timed (module-attribute
      wrappers) so the per-step cost breakdown of a contract-run query is
      visible without the Spark UI. Prints a sorted table of
      (callable, calls, total_sec).

  python scripts/profile_r14.py explain <query> [query...]
      Capture .explain("formatted") of each query's returned DataFrame to
      plans/r14/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
      "before").

Measurement only — never imported by the engine.
"""

from __future__ import annotations

import functools
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nagios_custom_etl_spark.plans import all_queries  # noqa: E402
from nagios_custom_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ACC: dict[str, list[float]] = {}  # name -> [calls, total_sec]


def _wrap_module(mod, skip=("F", "DataFrame", "SparkSession")) -> None:
    import inspect

    for n, f in list(vars(mod).items()):
        if not inspect.isfunction(f) or f.__module__ != mod.__name__:
            continue

        def mk(_f, _key):
            @functools.wraps(_f)
            def g(*a, **k):
                t0 = time.perf_counter()
                try:
                    return _f(*a, **k)
                finally:
                    dt = time.perf_counter() - t0
                    e = ACC.setdefault(_key, [0, 0.0])
                    e[0] += 1
                    e[1] += dt

            return g

        setattr(mod, n, mk(f, f"{mod.__name__.rsplit('.', 1)[-1]}.{n}"))


def cmd_steps(names: list[str]) -> None:
    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import (
        dedup,
        graph,
        maintenance,
        similarity,
        sketches,
        snapshots,
    )
    from nagios_custom_etl_spark.functions import text as ftext

    for mod in (snapshots, similarity, dedup, fsio, maintenance, sketches, graph, ftext):
        _wrap_module(mod)
    spark = get_spark("profile-r14")
    registry = all_queries()
    for name in names:
        registry[name].fn(spark, SF_DIR).collect()  # warm (JIT, memos)
        ACC.clear()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: {total:.3f}s total ===")
        rows = sorted(ACC.items(), key=lambda kv: -kv[1][1])
        for key, (calls, sec) in rows:
            if sec >= 0.005:
                print(f"  {sec:8.3f}s  x{calls:<4d} {key}")


def cmd_jobs(names: list[str]) -> None:
    """Spark JOB COUNT per query (warmed run) via the in-process
    AppStatusStore — the evidence artifact for optimizations that
    remove whole jobs (observe()-carried stats, dropped footer-merge
    jobs), which explain() output cannot show."""
    spark = get_spark("profile-r14")
    registry = all_queries()
    store = spark.sparkContext._jsc.sc().statusStore()
    for name in names:
        registry[name].fn(spark, SF_DIR).collect()  # warm (JIT, memos)
        before = store.jobsList(None).size()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        after = store.jobsList(None).size()
        print(f"{name}: {after - before} jobs, {dt:.3f}s")


def cmd_explain(names: list[str]) -> None:
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    outdir = os.environ.get("PLAN_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("profile-r14")
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    mode, qnames = sys.argv[1], sys.argv[2:]
    if mode == "steps":
        cmd_steps(qnames)
    elif mode == "jobs":
        cmd_jobs(qnames)
    elif mode == "explain":
        cmd_explain(qnames)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
