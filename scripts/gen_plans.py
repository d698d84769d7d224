#!/usr/bin/env python
"""Regenerate docs/PLANS.md: physical plans of headline queries with
scale commentary. Run from the repo root."""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMMENTARY = {
    "q01_filter_project": (
        "Both predicates reach the scan as PushedFilters; ReadSchema is "
        "pruned to the 5 referenced columns."
    ),
    "q03_agg_pricing_summary": (
        "Partial HashAggregate before the exchange (map-side combine); "
        "split-BIGINT sums keep partial aggregation lossless. r15: a "
        "conditional spread_fact repartition (keyed on l_orderkey, only "
        "when the scan is narrower than cores/2) parallelizes the "
        "partial aggregate past a single-row-group local input; absent "
        "at scale."
    ),
    "q06_join3_topk": (
        "The BUILDING filter is applied below the joins; both joins "
        "shuffle on their natural keys (custkey, then orderkey) — at "
        "100 TB neither side of either join fits a broadcast, and since "
        "r15 both are MERGE-pinned so the local plan is the same SMJ "
        "shape — and TakeOrderedAndProject caps the output without a "
        "global sort."
    ),
    "q09_broadcast_dim": "Explicit broadcast: probe side never shuffles.",
    "q13_topk": "TakeOrderedAndProject: per-partition heaps, k rows to the driver.",
    "q20_asof_join": (
        "Union + tag + running-max window: the as-of join costs exactly one "
        "hash partitioning on user_id."
    ),
    "q30_small_qty_revenue": (
        "Correlated AVG subquery in decorrelated form: one per-partkey "
        "aggregate shuffle joined back to the fact; the brand filter is a "
        "broadcast semi-reduction applied before the wide join."
    ),
    "q31_waiting_suppliers": (
        "EXISTS/NOT EXISTS as left-semi + left-anti self-joins, all three "
        "lineitem branches shuffling on l_orderkey only; supplier is "
        "broadcast after the correlation filters shrink the fact side."
    ),
    "q32_dormant_customers": (
        "Scalar aggregate computed once and broadcast into the threshold "
        "filter; NOT EXISTS is a left-anti join on custkey."
    ),
    "q38_revenue_forecast": (
        "TPC-H Q6: all three predicates pushed to the scan (the discount "
        "band as exact centi-integers); single partial+final aggregate, no "
        "data-row shuffle."
    ),
    "q40_returned_items": (
        "TPC-H Q10 shape: returnflag and quarter filters reach the scans; "
        "TakeOrderedAndProject caps the top-20 without a global sort. "
        "r15: customer and lineitem sides MERGE-pinned (SF-scaling "
        "facts); nation is the only broadcast."
    ),
    "q44_disjunctive_revenue": (
        "TPC-H Q19 shape: Catalyst derives the implied per-side filters "
        "from the OR and pushes them into BOTH scans; part broadcasts so "
        "the fact table never shuffles."
    ),
    "stats_percentiles": (
        "Exact interpolated percentiles: one shuffle on the group key; "
        "the group's values are materialized for the rank lookup — the "
        "documented trade against approx_percentile's mergeable sketches."
    ),
    "q46_multires_rollup": (
        "Cascading rollup: ONE fact scan at minute grain; hour and day "
        "levels re-aggregate the previous level's ~1000x-smaller output "
        "(partial aggregates before each of the 3 level exchanges)."
    ),
    "text_heavy_hitters": (
        "Misra-Gries candidates (bounded per-partition state, no "
        "vocabulary shuffle) -> exact recount of candidates only; the "
        "wide shuffle carries candidate hits, never the full vocabulary."
    ),
    "q05b_shuffle_hash_join": (
        "Hinted ShuffledHashJoin: both fact sides exchange on orderkey "
        "but skip the per-partition sort a sort-merge join pays."
    ),
    "q37_local_supplier_volume": (
        "TPC-H Q5 shape: the ASIA restriction is applied dim-side BEFORE "
        "any fact table — supplier pre-joins nation x region('ASIA'), "
        "customer is semi-pruned to ASIA nations ahead of the fact "
        "shuffles. r15: every SF-scaling join side (customer, lineitem, "
        "filtered supplier) is MERGE-pinned — three SMJs on natural "
        "keys, BroadcastExchange only above the bounded nation/region "
        "dims."
    ),
    "q28_profit_by_nation_year": (
        "TPC-H Q9 shape: filtered part and bounded nation broadcast-"
        "hinted; unfiltered supplier joins WITHOUT a hint (SF-scaling "
        "side; a forced broadcast is an OOM at 100 TB, AQE still "
        "broadcasts while it fits)."
    ),
    "q45_dominant_suppliers": (
        "TPC-H Q20 shape: per-part totals as a window over the aggregated "
        "(partkey, suppkey) sums — one fact scan, one fact shuffle; the "
        "SQL CTE spelling would scan lineitem twice."
    ),
    "stats_profile": (
        "Column profiling in ONE pruned scan: every per-column aggregate "
        "(incl. multi COUNT(DISTINCT) via a single Expand) hangs off one "
        "FileScan reading only the 5 profiled columns; the wide row is "
        "unpivoted row-locally. At 100 TB swap exact NDV for HLL and the "
        "Expand disappears."
    ),
    "curation_chunk_documents": (
        "Chunking is embarrassingly row-local: token split, sequence of "
        "window starts, one explode — a single map stage glued to the "
        "scan, zero shuffles until a consumer asks for one."
    ),
    "dedup_canonical": (
        "Survivor selection: ranking window partitioned by component id "
        "(cluster-local keys fan out; skew bounded by the largest "
        "duplicate cluster), layered on the verified component fixpoint."
    ),
    "q51_event_funnel": (
        "Ordered funnel as conditional MINs: one map-side-combinable "
        "shuffle on user_id then a single-row global fold — no Join "
        "operator anywhere (the 3-way self-join spelling shuffles the "
        "fact three times and explodes on hot users); plan-pinned by "
        "test_q51_funnel_single_shuffle_no_join."
    ),
    "stats_entropy": (
        "Per-group Shannon entropy: two stacked aggregations, both with "
        "partial combine; the decimal-pinned ln terms make the "
        "cross-partition sum order-free so the result is bit-stable "
        "under any partitioning."
    ),
    "q52_cohort_retention": (
        "Cohort retention in ONE fact shuffle: per-user MIN week and "
        "collect_set of active weeks in the same aggregation (set size "
        "bounded by calendar weeks, not event volume), explode, then a "
        "map-side-combinable (cohort, offset) count — the naive "
        "first-week-join-back spelling pays a second full-fact shuffle "
        "and appears as a Join; this plan has none."
    ),
    "q54_rolling_active_users": (
        "Rolling 7-day distinct actives without a range join: the fact "
        "collapses to distinct (user, day) first (partial-combined), "
        "each pair explodes into its <=7 report days (bounded fanout of "
        "the collapsed set, not raw events), the day-domain guard is a "
        "broadcast LEFT SEMI. DAU and WAU are SEPARATE aggregates "
        "joined day-wise (r15): DAU is a plain count over the distinct "
        "set (no explode), WAU one countDistinct over the spans — no "
        "Expand, so only 7 copies of each pair cross the exchange "
        "instead of the double-distinct's 14. The oracle's BETWEEN "
        "join would be an O(days x pairs) theta join here."
    ),
    "dedup_incremental": (
        "Incremental batch-vs-corpus dedup: corpus side pre-aggregates "
        "to one row per fingerprint (map-side combinable) before the "
        "join, so the probe meets one row per key; at this scale AQE "
        "turns the join into a broadcast, at 100 TB it degrades "
        "gracefully to a co-partitioned SMJ on the same key. Both scans "
        "push the doc_id%5 batch split down as DataFilters."
    ),
    "text_bm25_topk": (
        "BM25 retrieval scoring: the query-term filter sits UNDER the "
        "first shuffle (only term hits move — at 100 TB the difference "
        "between shuffling every token and a few hits per doc), doc "
        "length rides the tf key as a functionally-dependent column, the "
        "3-row IDF relation broadcasts, the cross-term sum is decimal, "
        "and the cut is TakeOrderedAndProject."
    ),
    "q56_rolling_median": (
        "Holistic exact median over a bounded ROWS frame: one shuffle "
        "on the window key; per-row state is O(frame)=20 values "
        "regardless of partition size — which is exactly why the frame "
        "is ROWS-bounded, not UNBOUNDED."
    ),
    "q50_percent_rank_cume_dist": (
        "Distribution windows: one hash partitioning on the window key; "
        "the tail filter sits above the window (semantically required) "
        "so state is O(partition) like every ranking window — ReadSchema "
        "pruned to the 3 referenced columns."
    ),
    "q61_scd2_point_in_time": (
        "Point-in-time lookup WITHOUT a join: the tagged dim-change and "
        "fact streams union, shuffle once on user_id, and a running "
        "last(attr, ignorenulls) carries the in-effect version onto "
        "each fact row — the range-join spelling is O(facts x versions) "
        "per hot user before filtering; this plan has no Join operator "
        "(pinned by test_scd2_point_in_time_no_join)."
    ),
    "q62_attribution_last_touch": (
        "Last-touch attribution: same union-window form carrying both "
        "the last channel and its timestamp, so the 7-day lookback is a "
        "row-local comparison; the per-channel rollup is a map-side "
        "combinable count/sum over a handful of groups. No Join "
        "(pinned)."
    ),
    "q63_longest_streak": (
        "Gaps-and-islands: distinct (user, day) collapses the fact "
        "first (calendar-bounded per-user state), then day minus "
        "row_number labels each consecutive run — everything on the one "
        "user_id shuffle."
    ),
    "graph_triangle_count": (
        "Degree-oriented triangle counting: each edge directed "
        "low-degree -> high-degree bounds the wedge join's fan-out by "
        "sum(out-deg^2) = O(m^1.5) — the id-ordered spelling is "
        "unbounded on one hub vertex. Degree relation (O(V) rows) "
        "broadcasts; wedge build and closure check are equi-joins on "
        "the pivot and the (a, c) pair; member explode feeds a "
        "partial-combined count."
    ),
    "stats_welch_ttest": (
        "Welch t-test: ONE partial-combined aggregation over the fact "
        "yields every per-group moment sum; the baseline row joins back "
        "as a broadcast scalar and the t/df arithmetic is row-local. "
        "Decimal moment sums keep the statistic order-independent."
    ),
    "stats_chi2_independence": (
        "Chi-square independence: contingency cells from one fact "
        "aggregation; row/column marginals derive from the CELLS (never "
        "a second fact pass) and broadcast back; exact integer counts "
        "make the statistic bit-stable."
    ),
    "ts_stl_decompose": (
        "Seasonal decomposition: ONE fact scan feeds the daily rollup, "
        "which is PINNED (localCheckpoint) so the seasonal aggregate "
        "and the final join referencing it cannot re-run the full-fact "
        "pass (inlined CTEs would) — the decomposition plan itself "
        "shows zero FileScans; all windows/joins run on the day spine."
    ),
    "ts_interval_coverage": (
        "Merged-interval coverage: gaps-and-islands via a running MAX "
        "of interval ends — zero Join operators (the overlap self-join "
        "alternative is O(k^2) per user), one user_id shuffle shared by "
        "both windows and the aggregations."
    ),
    "stats_quantile_binning": (
        "Equal-frequency binning: NTILE over a range-partitioned "
        "distributed sort of the single referenced column (ReadSchema "
        "prunes to l_extendedprice), then a partial-combined per-bin "
        "aggregate; no join, one scan."
    ),
    "dedup_semantic_clusters": (
        "SemDeDup: broadcast-GEMM centroid assignment (Arrow-batched "
        "mapInPandas), one shuffle on cluster id, per-cluster pairwise "
        "cosine inside FlatMapGroupsInPandas — no join or cartesian in "
        "the plan; pairwise work is bounded by cluster size."
    ),
    "dedup_containment": (
        "Containment mining: same lossless inverted-index shape as the "
        "exact Jaccard miner — shingle-key shuffle, pair-key partial-"
        "combined aggregation, per-doc sizes joined back; the score is "
        "an integer ratio so the threshold cannot flip across engines."
    ),
    "dedup_containment_capped": (
        "Containment SCALE route (r9; r10 unforced): the hot-shingle "
        "stopword list is bounded by |postings|/cap — a bound that "
        "GROWS with the corpus — so its anti-join is UNHINTED (AQE has "
        "exact sizes for the aggregate output; plan pin asserts no "
        "forced broadcast); the capped inverted-index self-join emits "
        "at most cap rows per posting list, so the candidate-pair "
        "stream is linear in the corpus; the exact verify re-intersects "
        "FULL hashed-shingle arrays of candidate docs only "
        "(array_intersect, JVM-side) — work proportional to "
        "candidates, never corpus²."
    ),
    "dedup_minhash_incr": (
        "Incremental MinHash (r10; cap join-reduced r11): each arrival "
        "batch signs ONLY its own docs; candidates are a (band,sig) "
        "equi-join of the new band rows against the persisted index "
        "plus the new batch's own chain-guarded pairs. The degenerate-"
        "bucket cap's row_number window runs on the index AFTER a "
        "left-semi join to the arrival's distinct bucket keys — a join "
        "cannot be pushed below a window, so windowing first (pre-r11) "
        "shuffled the ENTIRE index per arrival; join-reduced, the "
        "window input is O(matching buckets) and row_number within a "
        "bucket is unaffected (bit-identity pinned). r12 closes the "
        "two remaining O(corpus) I/O terms: the index fetch is a "
        "bucket-key PRUNED scan (files clustered by (band, sig); the "
        "arrival's sorted sig list admits files by binary search "
        "against per-file sig ranges — O(matching files) once file "
        "count exceeds key count, the 100 TB regime), and the verify "
        "texts fetch via a candidate-id pruned scan on the source "
        "table instead of a full (doc_id, text) read. The arrival's "
        "own doc_ids are anti-joined out of the index side pre-cap, so "
        "a partial-failure replay mines bit-identical pairs. The "
        "exact-Jaccard verify is semi-join-reduced to candidate docs "
        "over hashed shingles, so per-batch work scales with the "
        "batch + its answer, never the corpus (docs/SCALE.md "
        "ingest_minhash_arrival row: fixed batch vs 16x->1024x "
        "corpus)."
    ),
    "ann_ivfpq_topk": (
        "IVF-PQ (r11, Jégou 2011 §IV): coarse cells + per-cell RESIDUAL "
        "PQ codes persisted as a cell-clustered lakehouse table of "
        "pure uint8 codes (no float column — the 64x compression), "
        "centroids+codebooks in commit metadata. A query builds nprobe "
        "(m x k) ADC tables per probed cell driver-side, broadcast "
        "GROUPED BY CELL so each Arrow batch evaluates only its own "
        "cells' queries (r12); the codes scan opens ONLY the probed "
        "cells' files through ONE IN-list pruned scan — a single plan "
        "branch regardless of nprobe (r12, was a union of per-cell "
        "scans); per-batch shortlist truncation, then the exact "
        "re-rank fetches just the shortlist vectors. At 100 TB query "
        "cost is ~nprobe/n_cells of the compressed corpus vs all of "
        "it for flat PQ."
    ),
    "ann_pq_topk": (
        "Product-quantization ANN (r10): one Arrow encode pass emits "
        "m=8 one-byte codes per vector (the 64x-compressed index, "
        "pinned once); the query scan reads ONLY the codes — per-query "
        "(m x k) ADC tables ride the closure, each batch scores as m "
        "gathers + a sum; the 8xK shortlist re-ranks EXACTLY through a "
        "semi-join-sized fetch of the original vectors. At 100 TB the "
        "float vectors are read once (encode) and never again."
    ),
    "text_bigram_nll": (
        "Bigram-LM scoring: adjacent pairs from an array zip (no self-"
        "join, no window); bigram/context/unigram count joins are "
        "UNHINTED — the bigram vocabulary grows with the corpus, so a "
        "forced broadcast would be the q58 OOM anti-pattern; AQE picks "
        "broadcast while small."
    ),
    "curation_dsir_weights": (
        "DSIR importance weights: the hashed-bucket model is a "
        "CONSTANT-size table (fixed B), so its join is a legitimate "
        "broadcast at any corpus scale (contrast the bigram-NLL model, "
        "which grows with the corpus and must stay unhinted); one "
        "corpus-scale shuffle total — the per-doc aggregation."
    ),
    "dedup_minhash_lsh": (
        "MinHash-LSH (r8 verify path): signature mapInPandas ships only "
        "(doc, band, sig) longs; candidate pairs are pinned once "
        "(localCheckpoint — answer-scale); the exact-Jaccard verify is "
        "semi-join-reduced to candidate docs over xxhash64'd shingle "
        "arrays, so its shuffle scales with the answer, not the corpus "
        "(the r7 exponent-1.50 cliff was this join shipping full "
        "string shingles for the whole corpus)."
    ),
    "q58_market_basket": (
        "Market basket: the fact shuffles ONCE into sorted per-basket "
        "item arrays (r14); pairs then STREAM through two chained "
        "generators — posexplode for the anchor, a sliced explode for "
        "its greater partners (r15: the r14 flatten materialized the "
        "whole O(k^2) pair array per basket row — an OOM hazard on the "
        "uncapped path, and 1.27x slower). The per-part singles joins "
        "are UNHINTED — singles grows with the corpus, and AQE picks "
        "broadcast only while measured-small. r10: the 1-row basket "
        "census rides the DAG as an unhinted broadcast scalar; a global "
        "aggregate is one row at any corpus size, so its BNLJ never "
        "grows."
    ),
}


def main() -> None:
    from crest_spark.plans.checks import simple_plan
    from crest_spark.registry import load_all
    from crest_spark.session import get_spark

    # sf0.1, not the smoke scale: at sf0.001 AQE broadcasts even the fact
    # table, so the recorded plans would not show the join strategies the
    # commentary narrates (VERDICT r4 "What's wrong" #2). But at 100 TB the
    # SCALED tables (lineitem/orders/customer/part/supplier) are far past
    # any broadcast threshold while region/nation stay 5/25 rows — so the
    # threshold is scaled DOWN with the fixture to keep the recorded
    # build-side choices the ones a 100 TB run would make. Explicit
    # broadcast() hints in query code ignore the threshold, exactly as
    # they would at scale.
    sf_dir = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.1")
    threshold = os.environ.get("PLANS_BROADCAST_THRESHOLD", "32k")
    spark = get_spark("plandoc", master="local[8]")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = io.StringIO()
    out.write("# PLANS — physical plans of headline queries (auto-generated)\n\n")
    out.write(f"Regenerate: `python scripts/gen_plans.py` (plans at `{sf_dir}`,\n")
    out.write(f"autoBroadcastJoinThreshold={threshold}: scaled down with the fixture\n")
    out.write("so the recorded build-side choices are the 100-TB ones — the scaled\n")
    out.write("TPC-H tables are all far past any real threshold there, while\n")
    out.write("region/nation are fixed-size and broadcast at every scale; explicit\n")
    out.write("broadcast() hints ignore the threshold in both worlds). Plan-shape\n")
    out.write("invariants are enforced in `tests/test_plans.py`; this file is the\n")
    out.write("human-readable record of WHY each plan is the one we want at scale.\n")
    for name, note in COMMENTARY.items():
        df = specs[name].fn(spark, sf_dir)
        out.write(f"\n## {name}\n\n{note}\n\n```\n{simple_plan(df).strip()}\n```\n")
    with open("docs/PLANS.md", "w") as fh:
        fh.write(out.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
