"""Exact-decimal helpers for monetary / fixed-point math.

The reference does all token math in integer basis points and
fixed-decimal units (kamiyo-hive `lib/governance.ts:316`,
`packages/hive-sdk/src/swarmteams/burn.ts:65-72`, 6-decimal token units
`swarm-types.ts:409`). We mirror that discipline on Spark: any column
whose values are exact decimals (prices, balances, rates) is cast to
``DecimalType`` *before* aggregation, so sums are exact and therefore
independent of partitioning and execution order — a prerequisite both
for DuckDB-oracle hash parity and for reproducible results on a
1000-executor cluster where partial-aggregate order is nondeterministic.

Final outputs are cast back to ``double``: an exact decimal converts to
the same IEEE-754 value everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precisions are deliberately small (money: 12 integer digits, rates:
# 2 fraction digits) so chained products stay within DECIMAL(38) in
# both Spark and DuckDB without precision-loss rounding.
MONEY = "decimal(14,2)"
RATE = "decimal(4,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def one_minus(col: str | Column) -> Column:
    """(1 - rate) as an exact decimal."""
    return F.lit(1).cast(RATE) - dec(col, RATE)


def one_plus(col: str | Column) -> Column:
    """(1 + rate) as an exact decimal."""
    return F.lit(1).cast(RATE) + dec(col, RATE)


def money_sum(expr: Column) -> Column:
    """Exact sum of a decimal expression, exposed as double."""
    return F.sum(expr).cast("double")
