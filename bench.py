#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE compact JSON line LAST.

Timing = full query wall time (plan + execute + collect-to-count) per
query, after a session warm-up query so JVM/codegen startup isn't billed
to the first query.

Cross-round comparability: compare PER-QUERY times, not totals — the
query set grows (r5: 36 entries; r6 added q51_event_funnel +
q54_rolling_active_users -> 38; r7 added the remaining behavioral four
q52_cohort_retention / q53_user_paths / q58_market_basket /
q59_audience_overlap -> 42; r7 later added q64_markov_transitions +
q65_rfm_segments -> 44; r8 added the temporal flagships
q60_scd2_build / q61_scd2_point_in_time / q62_attribution_last_touch
and one hypothesis test stats_mann_whitney -> 48). Timing policy
changed twice: r5 (single-shot -> min-of-k) and r8 (timing action
count() -> noop-sink full materialization — count() let Catalyst PRUNE
every output column the count doesn't need, so projected-only work
never executed: q61's entire window, q03's aggregate value
expressions, q17's JSON extraction (5x), udf_scalar_pandas' UDF (3.6x).
The noop sink consumes every output row with all columns, measuring
the operator as a downstream consumer would pay for it. r1-r7
per-query numbers are count()-action and NOT comparable to r8+ without
that caveat; the filter/join-dominated queries — the dedup/LSH family,
q58 — moved <5% because their expensive work feeds filters count
could not prune).

Output contract (VERDICT r6 "what's wrong" #1): the LAST stdout line is
a compact driver-parseable summary — metric/value/unit/queries/sf only —
bounded-size by test (tests/test_bench_emit.py). The per-run
distribution, medians, and timing policy go to BENCH_DETAIL.json next to
this file (and a leading `# detail: ...` stderr note), NOT the summary
line: r6's enriched single line outgrew the driver's tail capture and
the round lost its bench signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: every operator family, weighted toward the scale-sensitive
# ones (joins, windows, dedup, similarity, behavioral pair-joins).
BENCH_QUERIES = [
    "q01_filter_project",
    "q03_agg_pricing_summary",
    "q04_distinct_agg",
    "q05_join_groupby",
    "q06_join3_topk",
    "q07_left_outer",
    "q09_broadcast_dim",
    "q10_range_join",
    "q11_rank_window",
    "q12_frame_window",
    "q13_topk",
    "q15_rollup",
    "q16_scalar_zoo",
    "q17_json_extract",
    "q18b_explode",
    "q19_tumbling_batch",
    "q20_asof_join",
    "q21_dedup_groups",
    "q22_cosine_topk",
    "q24c_in_subquery",
    "q26_misc_aggs",
    "q27_having",
    "q37_local_supplier_volume",
    "q38_revenue_forecast",
    "q40_returned_items",
    "q45_dominant_suppliers",
    "q51_event_funnel",
    "q52_cohort_retention",
    "q53_user_paths",
    "q54_rolling_active_users",
    "q58_market_basket",
    "q59_audience_overlap",
    "q60_scd2_build",
    "q61_scd2_point_in_time",
    "q62_attribution_last_touch",
    "q64_markov_transitions",
    "q65_rfm_segments",
    "stats_mann_whitney",
    "stats_moments",
    "udf_scalar_pandas",
    "skew_salted_agg",
    "text_word_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_brute_topk",
    "ann_pq_topk",
    "text_lang_id",
    "text_token_stats",
    # r9 additions: the containment scale route and the restructured
    # bigram-LM scorer (single model join)
    "dedup_containment_capped",
    "text_bigram_nll",
    "curation_dsir_weights",
    # r11 addition: the IVF-PQ composite (persisted codes-only index,
    # probed-cell ADC + exact re-rank)
    "ann_ivfpq_topk",
    # r12 addition: batch point lookup via the multi-value scan
    # predicate (one pruned IN-list scan over a clustered+Bloomed
    # table — the serving-path shape the pruned dedup/ANN fetches use)
    "lake_batch_point_lookup",
    # r13 addition: tail-proportional (LSM) compaction + manifest-group
    # admission — two tail rewrites (run 1 carried by reference) then a
    # pruned key probe over the multi-run layout
    "lake_tail_compaction_lookup",
    # r14 addition: the staged index-maintenance flow — build + deferred
    # drift adds + off-path rebuild publish, membership hash-gated
    "lake_index_rebuild_roundtrip",
]

SUMMARY_MAX_BYTES = 4096  # bound enforced by tests/test_bench_emit.py


def emit(timings, medians, all_runs, sf, runs, detail_path=None, out=None):
    """Write BENCH_DETAIL.json (full distribution + policy) and print the
    compact driver-facing summary as the LAST stdout line.

    Returns the summary line string (for the size-bound test)."""
    out = out if out is not None else sys.stdout
    total = round(sum(timings.values()), 3)
    detail = {
        "runs_per_query": runs,
        "timing_policy": "min_of_runs over FULL-PLAN materialization via"
        " the noop sink (since r8: count() let Catalyst prune"
        " projected-only work — window outputs, aggregate value"
        " expressions, scalar/UDF projections — so r1-r7 per-query"
        " numbers are count()-action and not directly comparable);"
        " sorted per-query runs in 'runs'; session warmup excluded"
        " (r1-r4 were single-shot)",
        "median": medians,
        "median_total": round(sum(medians.values()), 3),
        "runs": all_runs,
    }
    if detail_path:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        print(f"# detail: {detail_path}", file=sys.stderr)
    # Compact summary — keys limited to what the driver parses. Keep this
    # the LAST line printed; nothing may follow it.
    summary = json.dumps(
        {
            "metric": "headline_query_wall_time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    print(summary, file=out)
    return summary


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from crest_spark.registry import load_all
    from crest_spark.session import get_spark

    specs = load_all()
    spark = get_spark("crest-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer caches, AND the Python worker pool —
    # Arrow-batched operators (mapInPandas/pandas_udf) pay a one-time
    # per-executor worker spin-up (~hundreds of ms x cores) that
    # amortizes to zero in any long-lived job; a tiny mapInPandas over
    # every core pre-forks the pool so per-query timings measure the
    # operators, not interpreter startup (same spirit as not billing JVM
    # startup to the first query).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # min-of-k per query (k = SPARK_GRAFT_RUNS, default 5 since r7 — r6's
    # k=2 could not separate machine noise from plan regressions, VERDICT
    # r6 "what's wrong" #2). Root cause of the r6 "uniform ~25%
    # slowdown": measurement noise at k=2, not plans — re-measured at
    # k=5 (r7, same code paths, plans pinned), the 36-query common set
    # totals 12.10s vs r5's 13.85s (0.874x) and the three r6-worst
    # queries are back to parity (q09_broadcast_dim 0.300 vs r5 0.304;
    # q07_left_outer 0.321 vs 0.294; dedup_embedding_cosine 0.474).
    # Worst single-query ratio at k=5 is 1.09x, within run-to-run
    # spread. The first execution of an operator pays
    # one-off costs a steady-state job never sees again (plan cache,
    # shuffle-file reuse, page cache) — the r4 dedup_embedding_cosine
    # "+102%" was exactly this cold-run artifact (re-measured n=6: 2.29s
    # cold, then 1.23/1.11/1.04/0.89/1.03). The min is the steady-state
    # number the 100 TB comparison cares about.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "5")))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        spec = specs[name]
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            # noop sink: materializes EVERY output column (count() lets
            # Catalyst prune projected-only work — see module docstring)
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        n = spec.fn(spark, sf_dir).count()  # rows for the stderr line only
        times.sort()
        timings[name] = round(times[0], 3)
        medians[name] = round(times[len(times) // 2], 3)
        all_runs[name] = [round(t, 3) for t in times]
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    emit(
        timings,
        medians,
        all_runs,
        float(sf) if sf else None,
        runs,
        detail_path=os.path.join(REPO, "BENCH_DETAIL.json"),
    )


if __name__ == "__main__":
    main()
