"""Vector math over ArrayType(Float) columns — all JVM-side.

No Python UDFs: `zip_with`/`aggregate` higher-order functions run in
whole-stage codegen, so a brute-force similarity scan stays on the JVM
hot path. Accumulation is left-to-right double (the higher-order
``aggregate`` is a sequential fold), which matches DuckDB's
``list_dot_product`` C loop — the property the oracle comparison rests
on (bit-identical doubles for identical inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖); dimensions and accumulation order fixed so the
    DuckDB oracle reproduces the exact double."""
    return dot(a, b) / (norm(a) * norm(b))


def normalized(vec: Column, nrm: Column) -> Column:
    """vec / nrm, element-wise. Callers precompute ``nrm`` as a column
    (withColumn) so the fold runs once per ROW, not once per pair —
    the O(n) vs O(n²) difference in pairwise similarity plans. With
    both sides pre-normalized, cosine degrades to a single dot()."""
    return F.transform(vec, lambda x: x / nrm)
