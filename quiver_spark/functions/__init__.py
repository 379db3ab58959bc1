"""Reusable column-expression helpers.

The decimal helpers implement the engine's determinism convention (see
registry.py): float aggregates run in exact DECIMAL arithmetic so results are
independent of partitioning/accumulation order, then surface as DOUBLE. The
matching SQL fragments are provided so Spark builders and DuckDB oracles are
generated from the same shapes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type for prices / quantities (values < 1e10, 4 frac digits).
DEC_PRICE = "decimal(14,4)"
#: Decimal type for rates in [0, 1] (discount, tax).
DEC_RATE = "decimal(8,4)"
#: Decimal type for generic measures (events.value).
DEC_VALUE = "decimal(18,6)"


def dec(col: str | Column, typ: str = DEC_PRICE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, typ: str = DEC_PRICE) -> Column:
    """Exact decimal SUM surfaced as double."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: str | Column, typ: str = DEC_PRICE) -> Column:
    """Exact decimal SUM divided by COUNT — one IEEE division, deterministic."""
    return F.sum(dec(col, typ)).cast("double") / F.count(F.lit(1))


# --- SQL fragment builders (DuckDB side of the same conventions) -----------


def sql_dec(expr: str, typ: str = DEC_PRICE) -> str:
    return f"CAST({expr} AS {typ.upper()})"


def sql_dsum(expr: str, typ: str = DEC_PRICE) -> str:
    return f"CAST(SUM({sql_dec(expr, typ)}) AS DOUBLE)"


def sql_davg(expr: str, typ: str = DEC_PRICE) -> str:
    return f"(CAST(SUM({sql_dec(expr, typ)}) AS DOUBLE) / COUNT(*))"


def revenue() -> Column:
    """``l_extendedprice * (1 - l_discount)`` — exact decimal (both sides).
    A function (not a module constant) because Column construction requires
    an active SparkContext."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount", DEC_RATE))


SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))"
)


def int_vec(col: str | Column, scale: int = 1_000_000) -> Column:
    """Quantize a float array column to scaled BIGINTs.

    Integer dot products are exact and order-insensitive, which makes
    similarity scores bit-identical between Spark and any oracle. 1e-6
    resolution is far below meaningful embedding-score differences.
    """
    name = col if isinstance(col, str) else None
    assert name is not None, "int_vec takes a column name"
    return F.expr(
        f"transform({name}, x -> CAST(ROUND(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
    )


def int_dot(a: str, b: str) -> Column:
    """Exact dot product of two scaled-int array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
