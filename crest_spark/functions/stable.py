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


# --- Execution-side fast forms (r14 optimization round) -------------------
#
# ``sum4``/``avg4`` are kept verbatim for the DuckDB oracle strings; the
# Spark side now evaluates the SAME value through three BIGINT partial sums
# instead of one wide-decimal sum. Motivation (optimization guide §1.2/§2.3,
# measured on TPC-H Q1 at sf0.1): a SUM over DECIMAL(30,8) keeps a
# DECIMAL(38,8) aggregation buffer, which at precision > 18 is byte-array
# backed in UnsafeRow and every per-row update goes through BigDecimal —
# 1.10 s for the 600k-row Q1 aggregate vs 0.33 s for double sums. Three
# BIGINT sums use inline primitive buffer slots with codegen'd long adds:
# the identical Q1 aggregate measures 0.68 s (plan: same single
# partial+final HashAggregate, narrower buffer), and the partial-agg rows
# crossing the exchange carry 3 longs per measure instead of a var-length
# decimal.
#
# Exactness: the per-row quantum is unchanged — u = unscaled(CAST(e AS
# DECIMAL(20,8))) = the very integer the decimal cast rounds to (scale 8,
# half-up, identical to the DECIMAL(30,8) cast for every |e| < 10^12).
# u is split base-2^20 into (hi, mid, lo) with exact floor-division
# identities (u == hi*2^40 + mid*2^20 + lo, lo/mid in [0, 2^20)), each part
# is summed as BIGINT (exact integer arithmetic, order-independent), and
# the group total is reassembled in DECIMAL and divided by 10^8 — Spark's
# decimal-division rule at DECIMAL(30,0)/DECIMAL(9,0) yields scale 8, so
# the reassembled decimal is the exact scale-8 sum, and ROUND(...,4) /
# the final double cast see bit-identical inputs to the ``sum4`` path.
# NULL semantics match (all three partial sums skip exactly the NULL rows;
# empty/all-NULL groups yield NULL).
#
# Domain (fail-loud under ANSI mode, Spark 4's default — same posture as
# the decimal path, just lower ceilings; pick ``sum4`` for anything wider):
#   per-row |e| < 2^63/10^8 ≈ 9.2e10   (BIGINT cast of u overflows)
#   rows per group < ~1.1e12           (SUM(hi) overflows first)
#   |Σe| < 10^22                       (DECIMAL(30,0) reassembly cast)
# A 100 TB TPC-H lineitem is ~6e11 rows TOTAL with per-row money values
# < 1e7, so every current call site clears the bounds by >10x; the fuzz +
# equality gate lives in tests/test_stable_fast_sums.py and every
# registry entry using these still passes the unchanged DuckDB oracle.

_B = 1 << 20
_B2 = 1 << 40


def _split_total(expr: str, scale: int = 8) -> str:
    """DECIMAL(30,0) exact unscaled (×10^scale) group sum of ``expr``
    via three BIGINT partial sums (see module comment for the proof).

    The per-row quantum is ``unscaled(CAST(expr AS DECIMAL(12+scale,
    scale)))`` — the same half-up scale-``scale`` rounding as the
    equivalent wide-decimal cast for every |expr| < 10^12, fail-loud
    past it under ANSI mode (a tighter ceiling than the scale-8
    default's 2^63/10^8; every current call site's values are < 10^7).
    """
    q = 10 ** scale
    u = f"CAST(CAST(({expr}) AS DECIMAL({12 + scale},{scale})) * {q} AS BIGINT)"
    lo = f"PMOD({u}, {_B})"
    midhi = f"(({u}) - PMOD({u}, {_B})) DIV {_B}"
    mid = f"PMOD({midhi}, {_B})"
    hi = f"(({midhi}) - PMOD({midhi}, {_B})) DIV {_B}"
    return (
        f"CAST(CAST(SUM({hi}) AS DECIMAL(38,0)) * {_B2}"
        f" + CAST(SUM({mid}) AS DECIMAL(38,0)) * {_B}"
        f" + CAST(SUM({lo}) AS DECIMAL(38,0)) AS DECIMAL(30,0))"
    )


def sum4x(expr: str) -> str:
    """Spark-side fast twin of ``sum4`` — identical value, BIGINT buffers."""
    return f"CAST(ROUND({_split_total(expr)} / 100000000, 4) AS DOUBLE)"


def sumdec(expr: str, scale: int = 8) -> str:
    """Value- and dtype-identical fast twin of
    ``SUM(CAST(expr AS DECIMAL(.,scale)))`` (result DECIMAL(38,scale))
    through three BIGINT partial sums — for Spark-side call sites that
    keep the exact decimal sum (a HAVING bound, a pivot cell, a ratio
    numerator) instead of the 4-dp ``sum4x`` form.

    Measured guidance (r14, interleaved A/Bs at sf0.1 — see
    OPTIMIZATION_r14.md): the swap wins where the aggregate's per-row
    buffer updates are the work — fact-scale input into FEW groups
    (stats_correlation 0.68x, q15e 0.73x, q15d 0.81x) — and LOSES on
    high-cardinality groupings (one group per key: 1.27x worse on a
    100k-group synthetic), where tripling the per-group state widens
    the hash map and the exchange rows. Convert only measured sites.
    """
    q = 10 ** scale
    return f"CAST({_split_total(expr, scale)} / {q} AS DECIMAL(38,{scale}))"


def avg4x(expr: str) -> str:
    """Spark-side fast twin of ``avg4`` — identical value, BIGINT buffers."""
    exact_sum = (
        f"CAST(CAST({_split_total(expr)} / 100000000 AS DECIMAL(38,8))"
        " AS DOUBLE)"
    )
    return (
        f"CAST(ROUND(CAST({exact_sum} / COUNT({expr}) AS DECIMAL(30,12)), 4)"
        " AS DOUBLE)"
    )
