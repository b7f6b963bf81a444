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
