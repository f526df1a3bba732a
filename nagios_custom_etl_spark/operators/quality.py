"""Declarative data-quality expectations — Delta Live Tables'
expect / expect_or_drop / expect_or_fail triad as one composable
operator over any DataFrame, batch or foreachBatch.

The reference hard-codes its quality rules as inline filters
(extract.py:53-61 drops rows with missing/NaN readings and no one ever
learns how many); a production pipeline wants the three DLT actions:

* ``warn``  — keep the row, count the violation (data-quality
  dashboards need rates, not silence);
* ``drop``  — route the row to a QUARANTINE output instead of deleting
  it (a curation pipeline re-inspects quarantined rows; deletion
  destroys the evidence);
* ``fail``  — a single violation poisons the whole batch
  (:class:`ExpectationFailed`) — the write-audit-publish gate's
  row-level sibling (st25 gates on aggregate audits).

Scale shape: rule predicates are codegen'd Column expressions evaluated
in ONE pass that tags each row with its failed-rule array; the routing
(kept vs quarantined) is a map-side filter on that tag and the metrics
are one explode+groupBy over the tags at rule-count cardinality — no
per-rule rescan, no driver-side row loop, and the violation metrics
side-output is exactly what DLT writes to its event log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


class ExpectationFailed(RuntimeError):
    """A ``fail``-action expectation was violated: the batch must not
    publish. Carries per-rule violation counts for the error report."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(
            "fail-action expectation(s) violated: "
            + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        )


def expectations_apply(
    df: DataFrame,
    rules: list[tuple[str, Column, str]],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Apply ``rules`` — (name, predicate-that-GOOD-rows-satisfy,
    action) with action in ``warn | drop | fail`` — and return
    ``(kept, quarantined, metrics)``:

    * ``kept``: rows violating no drop-rule (warn violations ride
      along, as in DLT);
    * ``quarantined``: rows violating at least one drop-rule, with a
      ``_violations`` array naming every rule they failed (drop AND
      warn — the re-inspection queue wants the full diagnosis);
    * ``metrics``: one row per rule — (rule, action, n_violations) —
      computed over ALL input rows. NULL predicate results count as
      violations (an unevaluable expectation is not a passing one —
      SQL CHECK semantics would let NULL through; quality gates must
      not).

    ``fail`` rules are enforced EAGERLY: any violation raises
    :class:`ExpectationFailed` before either output is returned, so a
    caller composing this inside foreachBatch aborts the batch without
    publishing (the txn-token replay machinery then retries or
    surfaces it). Evaluation is one tagging pass; metrics aggregate the
    tags at rule cardinality."""
    if not rules:
        raise ValueError("no rules: an empty gate would silently pass everything")
    names = [n for n, _c, _a in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    actions = {n: a for n, _c, a in rules}
    for n, a in actions.items():
        if a not in _ACTIONS:
            raise ValueError(f"rule {n!r}: unknown action {a!r} (use {_ACTIONS})")
    # one tagging pass: per row, the array of rule names it VIOLATES
    # (NULL predicate == violation: coalesce(pred, false))
    viol = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond, _a in rules
            ]
        )
    )
    tagged = df.withColumn("_violations", viol)
    # metrics at rule cardinality (explode only the violation tags);
    # rules with zero violations are filled in driver-side — the rule
    # list is metadata
    counts = {
        r["_rule"]: int(r["_n"])
        for r in tagged.select(F.explode("_violations").alias("_rule"))
        .groupBy("_rule")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()  # bounded: one row per violated rule
    }
    fail_counts = {
        n: counts.get(n, 0) for n, a in actions.items() if a == "fail" and counts.get(n)
    }
    if fail_counts:
        raise ExpectationFailed(fail_counts)
    spark = df.sparkSession
    metrics = spark.createDataFrame(
        [(n, actions[n], counts.get(n, 0)) for n in names],
        "rule string, action string, n_violations long",
    )
    drop_names = F.array(
        *[F.lit(n) for n, a in actions.items() if a == "drop"]
    )
    has_drop = F.arrays_overlap("_violations", drop_names) if any(
        a == "drop" for a in actions.values()
    ) else F.lit(False)
    kept = tagged.filter(~has_drop).drop("_violations")
    quarantined = tagged.filter(has_drop)
    return kept, quarantined, metrics
