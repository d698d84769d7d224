#!/usr/bin/env python
"""Dump .explain('formatted') for bench queries into plans/r15/<q>_<tag>.txt.

Usage: python scripts/dump_plans_r15.py <tag> [query ...]
Defaults to every BENCH_QUERIES entry. Multi-job entries (index builds,
lakehouse setups) record the plan of the RETURNED DataFrame; their setup
phases are profiled separately in OPTIMIZATION_r15.md.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    only = sys.argv[2:]

    from bench import BENCH_QUERIES
    from crest_spark.registry import load_all
    from crest_spark.session import get_spark

    names = only or BENCH_QUERIES
    specs = load_all()
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(REPO, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
