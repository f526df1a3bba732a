"""Parallelism-signal mini-bench (r14 verdict item 6, guide §1/§2).

At sf0.1 every headline query is sub-2 s, so the driver's 8-core vs
32-core comparison measures FIXED OVERHEAD (session, planning, py4j,
task scheduling) — every ratio reads ~1 and a parallelism regression is
invisible. This script synthesizes a K-fold inflated copy of the tables
the compute-bound representatives scan (default K=8 over sf0.1 ≈ sf0.8)
and times those queries on it, so the 8v32 ratio measures COMPUTE.

    SPARK_GRAFT_CPUS=32 python scripts/scale_bench.py
    SPARK_GRAFT_CPUS=8  python scripts/scale_bench.py

Prints one JSON line: {"mult": K, "cpus": N, "queries": {name: sec}}.

Inflation is semantics-preserving per copy:

- lineitem/orders/customer: keys shifted by copy_i * 10^10 — joins and
  group-bys land entirely within a copy, so per-copy results mirror the
  fixture and total work scales K-fold;
- documents: doc_id shifted AND every word tagged with the copy index
  (a per-copy vocabulary bijection) — shingle/minhash structure within
  a copy is identical to the fixture while NO shingle matches across
  copies, so near-dup candidate pairs scale K-fold (not K^2 cliques of
  spurious exact duplicates, which naive replication would create).

Measurement-only: never imported by the engine; bench.py and its
one-line JSON contract are untouched. The synthesized dataset is
rebuilt per (fixture, K) under /tmp and reused within a round purely as
INPUT data — results are always computed from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nagios_custom_etl_spark.plans import all_queries  # noqa: E402
from nagios_custom_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "8"))
QUERIES = [
    "q18_large_orders",
    "x2b_minhash_lsh_neardup",
    "x13_neardup_clusters",
    "x97_dup_span_coverage",
]
KEY_SHIFT = 10_000_000_000


def synthesize(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.catalog import load_table

    shifted = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
    }
    for name, keys in shifted.items():
        base = load_table(spark, SF_DIR, name)
        parts = []
        for i in range(MULT):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * KEY_SHIFT))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    docs = load_table(spark, SF_DIR, "documents")
    parts = []
    for i in range(MULT):
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_SHIFT))
            # per-copy vocabulary bijection: tag every word with the copy
            # index so shingles never match ACROSS copies while within-copy
            # near-dup structure is byte-for-byte the fixture's
            .withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale-bench")
    tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    out_dir = f"/tmp/scale_bench_{tag}_x{MULT}"
    if not os.path.exists(f"{out_dir}/_SYNTH_DONE"):
        synthesize(spark, out_dir)
        with open(f"{out_dir}/_SYNTH_DONE", "w") as fh:
            fh.write("ok")
    registry = all_queries()
    timings: dict[str, float] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"scale_bench warm {name}")
        registry[name].fn(spark, out_dir).collect()  # untimed: codegen JIT
        samples = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"scale_bench {name} #{i}")
            t0 = time.perf_counter()
            registry[name].fn(spark, out_dir).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
    print(
        json.dumps(
            {
                "metric": "scale_bench_sec",
                "mult": MULT,
                "cpus": cpus,
                "queries": timings,
                "value": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
