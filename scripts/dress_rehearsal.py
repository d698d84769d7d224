"""Full dress rehearsal: run every queries() entry on a VANILLA SparkSession
and compare against its oracle_sql() via DuckDB, the way the driver does.

Usage:  python scripts/dress_rehearsal.py [sf_dir] [query_name ...]

Mimics the driver's compare: columns sorted by name, rows sorted, floats
via repr(), NULL -> "∅".  Flags 0-row results (trivial oracle matches).
Run from anywhere; inserts the repo root on sys.path itself.
"""
from __future__ import annotations

import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        out.append(
            tuple(
                "∅"
                if r[i] is None
                else (repr(float(r[i])) if isinstance(r[i], float) else repr(r[i]))
                for i in order
            )
        )
    return sorted(out)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in qs if not only or n in only]
    failures, empties, no_oracle = [], [], []
    t0 = time.time()
    for name in names:
        tq = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if not srows:
            empties.append(name)
        if name not in osql:
            no_oracle.append(name)
            print(f"rows  {name}: {len(srows)} (no oracle) [{time.time()-tq:.1f}s]")
            continue
        try:
            ores = con.execute(osql[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        a, b = _norm(scols, srows), _norm(ocols, ores)
        if a == b:
            print(f"ok    {name}: {len(a)} rows [{time.time()-tq:.1f}s]")
        else:
            failures.append((name, f"mismatch: spark {len(a)} rows vs oracle {len(b)}"))
            diff = next(
                (i for i, (x, y) in enumerate(zip(a, b)) if x != y), min(len(a), len(b))
            )
            print(f"FAIL  {name}: spark {len(a)} vs oracle {len(b)} rows; first diff @ {diff}")
            if a[diff:diff + 1]:
                print(f"      spark : {a[diff]}")
            if b[diff:diff + 1]:
                print(f"      oracle: {b[diff]}")

    print(f"\n== {len(names)} queries in {time.time()-t0:.0f}s ==")
    print(f"failures: {len(failures)}  {[n for n, _ in failures]}")
    print(f"empty results: {len(empties)}  {empties}")
    print(f"no oracle: {len(no_oracle)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
