"""Vector expression layer (SURVEY §2.12 X3): dot products, norms, cosine —
as built-in array expressions (zip_with/aggregate), evaluated JVM-side in
double precision. The sequential left-fold of ``aggregate`` makes the
result deterministic (no reduction-order variance), which is what lets a
DuckDB oracle match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double_array(col: str | Column) -> Column:
    return _c(col).cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    products = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: str | Column, b: str | Column) -> Column:
    diffs = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def l2_normalize(a: str | Column) -> Column:
    n = norm(a)
    return F.transform(as_double_array(a), lambda x: x / n)


def random_projection_signs(a: str | Column, n_planes: int, seed: int, dim: int) -> Column:
    """Sign-LSH bucket id: bit b = sign(<v, h_b>) where h_b is a deterministic
    pseudo-random hyperplane derived from (seed, b, i) via xxhash64 — no
    driver-side randomness, reproducible across runs and executors.

    Returns a bigint bucket id in [0, 2^n_planes).
    """
    v = as_double_array(a)
    bucket = F.lit(0).cast("bigint")
    for b in range(n_planes):
        # h_b[i] in [-1, 1): hash -> uniform via modulo of a large prime
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x
                * ((F.pmod(F.xxhash64(F.lit(seed), F.lit(b), i), F.lit(2000003)) - 1000001.5)
                   / F.lit(1000001.5)),
            ),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
    return bucket


# ---------------------------------------------------------------------------
# int8 quantization — the storage/bandwidth scale path: 4x smaller vectors
# (and 4x less shuffle) at a small recall cost; all built-in expressions.
# ---------------------------------------------------------------------------


def quantize_int8(a: str | Column, scale: float) -> Column:
    """Symmetric int8 quantization: round(x/scale) clamped to [-127, 127].

    ``scale`` ≈ max|x|/127 for the column (compute once per corpus; a
    fixed calibration constant at serving time, never a per-batch shuffle).
    """
    return F.transform(
        as_double_array(a),
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x / F.lit(scale)).cast("int"))
        ).cast("tinyint"),
    )


def dequantize_int8(q: str | Column, scale: float) -> Column:
    c = _c(q)
    return F.transform(c, lambda x: x.cast("double") * F.lit(scale))


def int8_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two int8 vectors (exact in long arithmetic)."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("long") * y.cast("long")))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
