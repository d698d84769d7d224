"""Cross-engine-stable float arithmetic snippets.

Floating-point SUM/AVG results depend on summation order, which differs
between engines (and between runs under different partitionings). To make
aggregate outputs bit-identical between Spark and any ANSI oracle (DuckDB),
every additive aggregate is routed through fixed-point DECIMAL(30,8):

    per-row double -> DECIMAL(30,8)   (deterministic nearest-cast)
    SUM(DECIMAL)                      (exact, associative, order-independent)
    ROUND(decimal, 4)                 (exact half-away-from-zero in both)
    CAST(... AS DOUBLE)               (deterministic nearest-cast)

The same SQL text is valid in Spark SQL and DuckDB, so each helper returns a
snippet used verbatim on both sides (Spark side via ``F.expr``).
"""

from __future__ import annotations


def round4(expr: str) -> str:
    """Stable 4-dp rounding of a scalar double expression."""
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(30,8)), 4) AS DOUBLE)"


def sum4(expr: str) -> str:
    """Stable 4-dp-rounded SUM of a double expression."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(30,8))), 4) AS DOUBLE)"


def avg4(expr: str) -> str:
    """Stable 4-dp-rounded AVG: exact decimal sum, double divide, decimal round.

    The double division of (identical decimal-sum, identical count) is IEEE
    deterministic, so both engines round the same double.
    """
    exact_sum = f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,8))) AS DOUBLE)"
    return f"CAST(ROUND(CAST({exact_sum} / COUNT({expr}) AS DECIMAL(30,12)), 4) AS DOUBLE)"
