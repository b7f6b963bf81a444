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
    both sides pre-normalized, cosine degrades to a single dot().

    Shaped as ``zip_with(vec, array_repeat(nrm, size(vec)), x/n)``
    rather than the obvious ``transform(vec, x / nrm)`` on purpose:
    CollapseProject substitutes a single-use ``withColumn`` alias into
    its consumer, and a scalar planted INSIDE a higher-order-function
    lambda is then re-evaluated per ELEMENT — the inlined norm fold
    made unit normalization Θ(d²) per row (observed in the dumped
    plan: ``transform(v, x / SQRT(aggregate(zip_with(v, v, ·))))``).
    Here the substitution target is ``array_repeat``'s scalar
    argument, which is evaluated once per row no matter what Catalyst
    inlines, so the plan stays Θ(d) with bit-identical doubles (same
    x/n divisions in the same order)."""
    return F.zip_with(
        vec, F.array_repeat(nrm, F.size(vec)), lambda x, n: x / n
    )
