"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the driver contract: row count, schema arity, and an
order-insensitive value comparison with columns sorted by name.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame


def _canon_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float canonicalization: repr of the double
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [tuple(r) for r in cur.fetchall()]
    return cols, rows


def compare(df: DataFrame, con, sql: str) -> tuple[bool, str]:
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [
            f"  spark={a}\n   duck={b}"
            for a, b in zip(sc, dc)
            if a != b
        ][:5]
        only_s = [r for r in sc if r not in set(dc)][:3]
        only_d = [r for r in dc if r not in set(sc)][:3]
        return False, (
            "value mismatch; first row-aligned diffs:\n"
            + "\n".join(diffs)
            + f"\n only-spark={only_s}\n only-duck={only_d}"
        )
    return True, "ok"
