#!/usr/bin/env python
"""Instrumented stage profile for dedup_minhash_lsh (VERDICT r7 #1).

The r7 sweep recorded wall-time exponent 1.50 at the 1024x->4096x step
for the flagship minhash-LSH dedup while the prose claimed near-linear.
This harness answers WHICH stage grew super-linearly by measuring, per
scale, every intermediate cardinality the judge asked for plus the
per-stage wall time:

  band_rows       (doc_id, band, sig) rows out of the signature stage
  cand_pairs      candidate pairs out of the banded miner
  cand_docs       distinct docs appearing in >= 1 candidate pair
  verified_pairs  pairs surviving the exact-Jaccard verify
  t_sig / t_cand / t_full   cumulative stage wall times (each timed as
                            its own action from a cold plan, so t_cand
                            includes the signature work it consumes)

If cand_pairs grows ~linearly while t_full grows super-linearly, the
algorithm (banding) is fine and the cliff is an execution artifact —
which is what the r8 diagnosis found: every cardinality scaled ~1.0x
per 4x data, and the wall cliff was the verify join shuffling full
string-shingle arrays for the whole corpus through a 16 GB heap (fixed
in dedup.py by hashed shingles + semi-join reduction to candidate
docs, plus a size-adaptive repartition replacing the hard-coded 8).

Results land in docs/minhash_diagnosis.json.

Usage:
    python scripts/diagnose_minhash.py [--scales 256,1024,4096]
        [--root /tmp/crest_scale_shared]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scale_sweep import build_scaled_dir  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="256,1024,4096")
    ap.add_argument("--root", default="/tmp/crest_scale_shared")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from crest_spark.operators.dedup import (
        _docs,
        dedup_minhash_lsh,
        lsh_candidate_pairs,
        minhash_band_rows,
        with_shingles,
    )
    from crest_spark.session import get_spark

    spark = get_spark("crest-minhash-diagnosis")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.root, exist_ok=True)
    # warm-up (JVM, Python worker pool)
    spark.range(1024, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    out: dict[str, dict] = {}
    for s in scales:
        d = build_scaled_dir(s, args.root)
        row: dict[str, float | int] = {}

        t0 = time.perf_counter()
        bands = minhash_band_rows(with_shingles(_docs(spark, d)))
        row["band_rows"] = bands.count()
        row["t_sig"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        cand = lsh_candidate_pairs(
            minhash_band_rows(with_shingles(_docs(spark, d)))
        ).localCheckpoint(eager=False)
        row["cand_pairs"] = cand.count()
        row["t_cand"] = round(time.perf_counter() - t0, 3)
        from pyspark.sql import functions as F

        row["cand_docs"] = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
            .count()
        )

        t0 = time.perf_counter()
        row["verified_pairs"] = dedup_minhash_lsh(spark, d).count()
        row["t_full"] = round(time.perf_counter() - t0, 3)

        out[str(s)] = row
        print(f"# x{s}: {row}", file=sys.stderr)

    path = os.path.join(REPO, "docs", "minhash_diagnosis.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
