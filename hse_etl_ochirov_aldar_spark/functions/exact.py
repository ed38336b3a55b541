"""Cross-engine-exact aggregate arithmetic.

Problem: ``round(avg(double), 2)`` is nondeterministic across engines —
summation order and binary representation of ``x.xx5`` half-cases flip
the last digit between Spark and any oracle (observed: DuckDB giving
152741.23 where Spark gives .24 for an exact .235 average).

Solution: the testdata's numerics are fixed-point decimals stored as
doubles (2 dp). Convert to exact integer units (``round(x * 10^f)`` as
BIGINT), aggregate in integer space (exact in both engines), and
produce final values by integer half-up rounding:

    round_half_up(s / (n * 10^f), o dp)
      = (2*s*10^o + n*10^f) div (2*n*10^f)      [positive values]

then a single exact-by-construction double division by ``10^o``.
Products of fixed-point values (disc_price, charge) multiply their unit
representations — still exact integers.

Scale bounds: BIGINT sums hold up to ~9.2e18; the worst case here
(sum_charge in 1e-6 units) stays < 1e17 at sf0.1 and < 1e19 at sf10 —
beyond that, switch the sum column to DECIMAL(38,0). Values must be
non-negative for the div-based rounding (true for all catalog columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def units(col: Column | str, scale: int = 2) -> Column:
    """Exact integer units of a fixed-point-in-double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**scale), 0).cast("long")


def units_sum(col: Column | str, scale: int = 2) -> Column:
    """Aggregate: exact BIGINT sum in 10^-scale units."""
    return F.sum(units(col, scale))


def as_value(sum_col: Column | str, scale: int = 2) -> Column:
    """Post-aggregate: convert an exact unit sum back to a double value."""
    c = F.col(sum_col) if isinstance(sum_col, str) else sum_col
    return c.cast("double") / F.lit(float(10**scale))


def avg_units_expr(sum_name: str, cnt_name: str, in_scale: int, out_scale: int) -> Column:
    """Post-aggregate: half-up average of unit-sum ``sum_name`` over
    ``cnt_name`` rows, rounded to ``out_scale`` decimals, as double.

    Pure BIGINT arithmetic until the final division — deterministic in
    any engine. Oracle-side twin: ``oracle_avg_units``.
    """
    o, f = 10**out_scale, 10**in_scale
    return (
        F.expr(
            f"CAST((2 * {sum_name} * {o} + {cnt_name} * {f}) "
            f"div (2 * CAST({cnt_name} AS BIGINT) * {f}) AS DOUBLE)"
        )
        / F.lit(float(o))
    )


# --- DuckDB oracle SQL twins (string builders) -----------------------------


def oracle_units(col_sql: str, scale: int = 2) -> str:
    return f"CAST(round({col_sql} * {10**scale}) AS BIGINT)"


def oracle_units_sum(col_sql: str, scale: int = 2) -> str:
    return f"sum({oracle_units(col_sql, scale)})"


def oracle_sum_value(col_sql: str, scale: int = 2) -> str:
    return f"CAST({oracle_units_sum(col_sql, scale)} AS DOUBLE) / {float(10 ** scale)}"


def oracle_avg_units(sum_sql: str, cnt_sql: str, in_scale: int, out_scale: int) -> str:
    o, f = 10**out_scale, 10**in_scale
    return (
        f"CAST((2 * {sum_sql} * {o} + {cnt_sql} * {f}) "
        f"// (2 * CAST({cnt_sql} AS BIGINT) * {f}) AS DOUBLE) / {float(o)}"
    )


def oracle_avg_value(col_sql: str, in_scale: int = 2, out_scale: int = 2) -> str:
    """Convenience: exact rounded average of a raw column."""
    return oracle_avg_units(oracle_units_sum(col_sql, in_scale), "count(*)", in_scale, out_scale)
