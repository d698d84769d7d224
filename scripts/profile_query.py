#!/usr/bin/env python
"""Profile one registered query: wall time + final (post-AQE) physical
plan. Usage: python scripts/profile_query.py <query_name> [sf_dir]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from crest_spark.registry import load_all
    from crest_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spec = load_all()[name]
    # warm-up at smoke scale amortizes JVM/codegen startup
    spec.fn(spark, "/root/testdata/sf0.001").count()
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    n = len(df.collect())
    wall = time.perf_counter() - t0
    print(f"\n=== {name} @ {sf_dir}: {wall:.2f}s, {n} rows ===\n")
    print(df._jdf.queryExecution().executedPlan().toString())
    spark.stop()


if __name__ == "__main__":
    main()
