"""Oracle-parity expression helpers.

The driver hashes result values after sorting, so every output column
must be bit-identical between Spark and the DuckDB oracle. Floating
point SUM/AVG are accumulation-order dependent and therefore NOT
reproducible across engines; money math goes through exact DECIMAL
arithmetic (PHP ``number_format`` is half-up — so is Spark ``round``
on DECIMAL and DuckDB ``round`` on DECIMAL; verified empirically) and
is cast to DOUBLE only at the output boundary.

Convention for every registered query:
- monetary / float aggregate => ``dsum`` / ``davg`` here, mirrored in
  the oracle SQL with ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
- per-row rounding (reference ``number_format($x, 2)`` semantics,
  kinesis-pay.php:140) => DECIMAL multiply + ``F.round`` then DOUBLE.
- counts => BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Wide enough for sf-scaled sums; DuckDB's max DECIMAL width is 38.
_SUM_PREC = 38


def dec(col: Column | str, scale: int = 2, prec: int = 18) -> Column:
    """Cast to exact decimal for order-independent arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, emitted as DOUBLE (bit-stable across engines)."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """avg as exact-sum / count — double division of identical operands
    is deterministic, unlike engine-native AVG accumulation."""
    return F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2, prec: int = 18) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2, prec: int = 18) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT(*)"
