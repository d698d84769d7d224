#!/usr/bin/env python
"""SF spot probe for the top bench entries (VERDICT r14 next-round #5).

At sf0.1 every c8/c32 bench ratio sits in 0.47-1.10 — the whole bench is
fixed-overhead-bound and proves nothing about data-volume scaling. This
probe times the top-10 (by sf0.1 wall time) bench entries, plus q03 as a
scan-bound reference, on sf0.1 replicated 1x/2x/5x (i.e. ~sf0.1/0.2/0.5)
with the scale_sweep's deterministic perturbations (documents get
position-salted markers so the near-dup rate stays constant; embeddings
get direction jitter; fact keys offset per replica), and reports each
entry's log-log slope over the largest step.

Reading: slope ~0 = per-entry fixed floor (job count / session overhead
dominates — the entry cannot demonstrate data scaling at this size);
slope ~1 = scan/compute-bound (the bench number is a real data-volume
measurement). Results are appended to docs/SCALE.md by hand.

Usage: python scripts/sf_probe_r15.py [--scales 1,2,5] [--runs 3]
       (idle box required; clean /tmp/crest_* first)
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

import scale_sweep as ss  # noqa: E402

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/crest_sfprobe"

ENTRIES = [
    # (entry, tables it scans)
    ("lake_index_rebuild_roundtrip", ("embeddings",)),
    ("ann_ivfpq_topk", ("embeddings",)),
    ("dedup_minhash_lsh", ("documents",)),
    ("q58_market_basket", ("lineitem",)),
    ("ann_pq_topk", ("embeddings",)),
    ("lake_batch_point_lookup", ("orders",)),
    ("curation_dsir_weights", ("documents",)),
    ("lake_tail_compaction_lookup", ("orders",)),
    ("dedup_containment_capped", ("documents",)),
    ("text_bigram_nll", ("documents",)),
    ("q03_agg_pricing_summary", ("lineitem",)),  # scan-bound reference
]


def _build_orders_replica(scale: int, out: str) -> None:
    src = pq.read_table(os.path.join(BASE, "orders.parquet"))
    chunks = []
    for i in range(scale):
        t = src
        if i:
            for c in ("o_orderkey", "o_custkey"):
                t = t.set_column(
                    t.schema.get_field_index(c),
                    t.schema.field(c),
                    pc.add(t[c], i * 10_000_000),
                )
        chunks.append(t)
    pq.write_table(
        pa.concat_tables(chunks).cast(src.schema),
        os.path.join(out, "orders.parquet"),
        row_group_size=131_072,
    )


def build_dir(scale: int, tables: set[str]) -> str:
    ss.BASE_SF = BASE  # rebase the sweep's builders onto sf0.1
    out = os.path.join(ROOT, f"x{scale}")
    os.makedirs(out, exist_ok=True)
    if scale == 1:
        # replica 0 is the identity: link the originals
        for t in tables:
            dst = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(dst):
                os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
        return out
    if "lineitem" in tables and not os.path.exists(
        os.path.join(out, "lineitem.parquet")
    ):
        ss._build_fact_replica("lineitem", scale, out)
    if "orders" in tables and not os.path.exists(
        os.path.join(out, "orders.parquet")
    ):
        _build_orders_replica(scale, out)
    if "documents" in tables and not os.path.exists(
        os.path.join(out, "documents.parquet")
    ):
        ss._build_documents_replica(scale, out)
    if "embeddings" in tables and not os.path.exists(
        os.path.join(out, "embeddings.parquet")
    ):
        ss._build_embeddings_replica(scale, out)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,5")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--ops", default=None)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    entries = ENTRIES
    if args.ops:
        keep = set(args.ops.split(","))
        entries = [e for e in ENTRIES if e[0] in keep]

    tables = {t for _, ts in entries for t in ts}
    for m in scales:
        build_dir(m, tables)

    from crest_spark.registry import load_all
    from crest_spark.session import get_spark

    specs = load_all()
    spark = get_spark("sf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(128, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    results: dict[str, dict] = {}
    for name, _ in entries:
        row = {}
        for m in scales:
            d = os.path.join(ROOT, f"x{m}")
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                specs[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            row[m] = round(min(ts), 3)
            print(f"# {name} x{m}: {row[m]:.3f}s", file=sys.stderr)
        lo, hi = scales[-2], scales[-1]
        slope = math.log(row[hi] / row[lo]) / math.log(hi / lo)
        results[name] = {"times": row, "slope_last_step": round(slope, 2)}
        print(f"{name}: {row} slope({lo}->{hi}x)={slope:.2f}")
    with open(os.path.join(REPO, "docs", "sf_probe_r15.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/sf_probe_r15.json")


if __name__ == "__main__":
    main()
