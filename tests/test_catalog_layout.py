"""Layout-invariance proof for the catalog's starved-scan spread
heuristics (VERDICT r5 task 4).

All of ``catalog._HEAVY_TABLES`` / ``_FACT_SPREAD_KEYS`` /
``_scan_is_starved`` exists because the fixture writes ONE row group per
file. These tests pin the two claims that guard against fixture
regeneration drift:

1. on a multi-row-group or multi-file layout the spread branch is NOT
   taken (``_scan_is_starved`` no-op claim — production data that
   already splits must never pay an injected exchange);
2. no contract query's ANSWER depends on the layout: a representative
   slice (scan/agg, exact dedup, per-row-CPU text, vector top-k) returns
   byte-identical rows against both layouts.
"""

from __future__ import annotations

import contextlib
import io
import os

import pyarrow.parquet as pq

from nagios_custom_etl_spark import catalog
from nagios_custom_etl_spark.catalog import TABLES, load_table
from nagios_custom_etl_spark.plans import all_queries

QUERIES = ["q1_pricing_summary", "x1_exact_dedup", "x4_token_stats", "x3_cosine_topk"]


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _build_alt_layout(sf_dir: str, dest: str) -> None:
    """A copy of the fixture where the spread-eligible tables actually
    split: lineitem/embeddings as single FILES with many row groups (the
    production shape the footer check recognizes), documents as a
    multi-file DIRECTORY (the shape the os.path.getsize file probe must
    fail safe on). Everything else is symlinked."""
    os.makedirs(dest, exist_ok=True)
    for name in TABLES:
        src = f"{sf_dir}/{name}.parquet"
        out = f"{dest}/{name}.parquet"
        if name in ("lineitem", "embeddings"):
            t = pq.read_table(src)
            pq.write_table(t, out, row_group_size=max(t.num_rows // 16, 1))
        elif name == "documents":
            t = pq.read_table(src)
            os.makedirs(out, exist_ok=True)
            n = max(t.num_rows // 8, 1)
            for i in range(0, 8):
                part = t.slice(i * n, n if i < 7 else t.num_rows - 7 * n)
                if part.num_rows:
                    pq.write_table(part, f"{out}/part-{i:05d}.parquet")
        else:
            os.symlink(src, out)


def test_spread_branch_not_taken_on_splittable_layouts(spark, sf_dir, tmp_path):
    alt = str(tmp_path / "alt_sf")
    _build_alt_layout(sf_dir, alt)

    # the fixture layout IS starved (the heuristics' reason to exist) ...
    assert catalog._scan_is_starved(f"{sf_dir}/lineitem.parquet", 32, 64 << 10)
    # ... and the multi-row-group file is NOT (16 row groups split fine)
    assert not catalog._scan_is_starved(f"{alt}/lineitem.parquet", 32, 64 << 10)
    # the directory layout fails the file probe safe: never starved
    assert not catalog._scan_is_starved(f"{alt}/documents.parquet", 32, 32 << 10)

    # no injected exchange in the bare loaded plans on the alt layout;
    # the fixture layout's plans carry the repartition
    for name in ("lineitem", "documents", "embeddings"):
        assert "Exchange" not in _plan_of(load_table(spark, alt, name)), name
        assert "Exchange" in _plan_of(load_table(spark, sf_dir, name)), name
    # scan parallelism on the alt layout comes from the LAYOUT itself:
    # with byte-range splitting engaged (a MB-scale fixture file needs
    # maxPartitionBytes lowered to see it; at production sizes the
    # default 128 MiB splits naturally) the multi-row-group file fans
    # out to many tasks with no repartition anywhere
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    spark.conf.set(key, str(128 << 10))
    try:
        n = spark.read.parquet(f"{alt}/lineitem.parquet").rdd.getNumPartitions()
    finally:
        spark.conf.set(key, old)
    assert n > 1, "multi-row-group file should split by byte range"


def test_contract_answers_are_layout_invariant(spark, sf_dir, tmp_path):
    alt = str(tmp_path / "alt_sf")
    _build_alt_layout(sf_dir, alt)
    reg = all_queries()
    for name in QUERIES:
        base = sorted(map(tuple, reg[name].fn(spark, sf_dir).collect()))
        got = sorted(map(tuple, reg[name].fn(spark, alt).collect()))
        assert got == base, f"{name}: answer depends on physical layout"
