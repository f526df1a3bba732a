"""bench.py's uniform-inflation band guard (VERDICT r10 task 6): the
r10 driver bench recorded a 1.22x hot-box total because EVERY shared
query was ~1.2x its settled band while the streaming-floor canary (one
sample, taken before the queries) read fine. The guard re-measures when
more than BAND_VIOLATION_LIMIT banded queries exceed their ceilings —
synthetic-load tests, no Spark session needed."""

from __future__ import annotations

from bench import BAND_MAX, apply_band_guard


def _bands(n: int) -> dict[str, float]:
    return {f"q{i}": 1.0 for i in range(n)}


def test_uniform_inflation_retried_and_cleared():
    """Hot-box signature: 8 queries all ~1.3x their band. One retry on a
    settled box clears every violation; per-query minima are kept."""
    bands = _bands(8)
    timings = {n: 1.3 for n in bands}
    slept = []
    v, retries = apply_band_guard(
        timings,
        lambda n: 0.9,  # the settled re-measure
        band_max=bands,
        limit=5,
        max_retries=2,
        sleep=slept.append,
    )
    assert v == [] and retries == 1 and slept == [30.0]
    assert all(t == 0.9 for t in timings.values())


def test_persistent_inflation_stamped_not_hidden():
    """If the load never drains, bounded retries stop and the surviving
    violations are RETURNED (stamped into the JSON) — a reader sees a
    hot record, not a silently retried-forever bench."""
    bands = _bands(8)
    timings = {n: 1.4 for n in bands}
    slept = []
    v, retries = apply_band_guard(
        timings, lambda n: 1.4, band_max=bands, limit=5, max_retries=2,
        sleep=slept.append,
    )
    assert len(v) == 8 and retries == 2 and len(slept) == 2
    assert all(t == 1.4 for t in timings.values())


def test_single_regression_never_retried_away():
    """At or below the limit, nothing is re-measured: a genuine
    per-query regression stays visible in the timings."""
    bands = _bands(8)
    timings = {n: 0.9 for n in bands}
    timings["q3"] = 5.0  # one real regression

    def boom(_):
        raise AssertionError("must not re-measure below the limit")

    v, retries = apply_band_guard(
        timings, boom, band_max=bands, limit=5, max_retries=2, sleep=boom
    )
    assert v == ["q3"] and retries == 0 and timings["q3"] == 5.0


def test_retry_keeps_minimum_never_worse():
    """A retry that lands on a BUSIER box cannot inflate the record:
    the per-query minimum across attempts is kept."""
    bands = _bands(8)
    timings = {n: 1.2 for n in bands}
    v, retries = apply_band_guard(
        timings, lambda n: 2.5, band_max=bands, limit=5, max_retries=1,
        sleep=lambda s: None,
    )
    assert retries == 1 and all(t == 1.2 for t in timings.values())
    assert len(v) == 8


def test_real_bands_cover_headline():
    """Every banded name is a real registry headline entry (guards the
    dict against drifting from bench.HEADLINE renames)."""
    from bench import HEADLINE

    assert set(BAND_MAX) <= set(HEADLINE)
    assert len(BAND_MAX) >= 25


def test_hot_floor_licenses_small_violator_retry():
    """When the streaming-floor canary itself read hot, even a
    below-limit violator set re-measures (the floor is independent
    evidence of box load); on a cool floor the same set is untouched."""
    bands = _bands(8)
    timings = {n: 0.9 for n in bands}
    timings["q1"] = 1.3
    timings["q2"] = 1.2
    slept = []
    v, retries = apply_band_guard(
        timings, lambda n: 0.9, band_max=bands, limit=5, max_retries=2,
        sleep=slept.append, floor_hot=True,
    )
    assert v == [] and retries == 1 and slept == [30.0]
    assert timings["q1"] == 0.9 and timings["q2"] == 0.9
    # cool floor, same shape: stays visible, nothing re-measured
    timings = {n: 0.9 for n in bands}
    timings["q1"] = 1.3

    def boom(_):
        raise AssertionError("must not re-measure on a cool floor")

    v, retries = apply_band_guard(
        timings, boom, band_max=bands, limit=5, max_retries=2,
        sleep=boom, floor_hot=False,
    )
    assert v == ["q1"] and retries == 0
