"""Reusable column expressions shared across plans and operators.

Oracle-determinism policy: the driver hash-compares Spark results
against DuckDB (order-insensitive value hash). Floating-point SUMs are
order-dependent, and Spark's partial/final aggregation order differs
from DuckDB's sequential scan, so money aggregates are computed in
DECIMAL (exact, order-independent) and cast to DOUBLE at the very end —
an exact-decimal→double conversion is deterministic in both engines.
The matching oracle SQL uses the same CAST(SUM(CAST(...)) AS DOUBLE)
shape.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: The fixtures' money/rate values carry ≤2 decimal digits, so inputs
#: are exact in DECIMAL(12,2) and the triple product
#: price×(1-disc)×(1+tax) needs scale 6 — which keeps every
#: intermediate within precision 38 in BOTH Spark and DuckDB, avoiding
#: Spark's silent scale truncation on precision overflow (observed:
#: DECIMAL(18,4) inputs push the triple product to precision 57 →
#: Spark rounds scale to 6 mid-expression while DuckDB keeps scale 12,
#: yielding a 1e-9 double mismatch).
MONEY_DECIMAL = "decimal(12,2)"


def dec(col: Column | str) -> Column:
    """Cast to the engine's exact money decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY_DECIMAL)


def money_sum(expr: Column, alias: str) -> Column:
    """Order-independent SUM of a decimal expression, surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


def revenue() -> Column:
    """extendedprice * (1 - discount), exact decimal."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def charge() -> Column:
    """extendedprice * (1 - discount) * (1 + tax), exact decimal."""
    return revenue() * (F.lit(1) + dec("l_tax"))


def avg_as_double(expr: Column, count_expr: Column, alias: str) -> Column:
    """AVG computed as exact-decimal SUM cast to double, divided by count.

    Plain AVG(double) is order-dependent; this form is deterministic and
    reproducible verbatim in DuckDB.
    """
    return (F.sum(expr).cast("double") / count_expr).alias(alias)


def bind(value: Column, body) -> Column:
    """Poor-man's ``let``: evaluate ``value`` ONCE per row and pass it
    to ``body`` as a bound lambda variable.

    Why this exists (SURVEY.md §7.5 rule 2, generalized): referencing a
    computed Column expression inside a higher-order-function lambda
    embeds a COPY of the whole expression tree at every reference site
    (Python-side composition — no Catalyst needed), and HOFs re-evaluate
    lambda bodies per ELEMENT with no codegen subexpression elimination.
    The shingle builders hit exactly this: ``transform(seq, i ->
    slice(tokens(text), i, n))`` re-ran split+trim-filter once per
    shingle position — Θ(T²) per doc in tokens, measured **59.9 s vs
    0.7 s** (85×) on 2 000 docs × 1 000 tokens (SCALE.md round 8; the
    corpus-COUNT ladder can't see it because per-doc cost is constant
    in corpus size). Materializing through ``withColumn`` does not
    survive Catalyst either: CollapseProject / predicate pushdown
    substitute single-use aliases right back into the consumer (the
    round-7 ``normalized()``/mm findings).

    ``element_at(transform(array(value), v -> body(v)), 1)`` is a
    collapse-proof let-binding: ``array(value)`` evaluates its argument
    exactly once per row wherever Catalyst inlines it, and inside
    ``body`` the value is a lambda VARIABLE — an O(1) attribute read,
    never a re-evaluation. Works for any data type ``array()`` accepts
    (including arrays — array-of-array is fine). Overhead is one
    1-element array allocation per row.

    Consumers: ``dedup.shingles``, ``text._bigrams``/``_trigrams``,
    the x5 chunk builder. Catalog-wide enforcement:
    ``tests/test_plan_hygiene.py`` scans every executed plan for
    length-proportional expressions over row columns inside lambda
    bodies (``plan_scan.expensive_exprs_in_lambda_bodies``)."""
    return F.element_at(F.transform(F.array(value), body), 1)
