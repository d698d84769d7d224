"""Structured Streaming queries exposed to the correctness gate.

Each runs a genuine multi-micro-batch Structured Streaming job to
completion (availableNow trigger over a staged file replay) and returns the
final result as a batch DataFrame, with a DuckDB oracle expressing the same
logic in batch SQL — stream-vs-batch parity is Structured Streaming's
documented guarantee, and here the driver checks it per round.

Watermark/late-data/session-window/stateful variants that cannot surface
through a hash-matchable batch result live in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.functions.stable import sum4, sum4x
from crest_spark.registry import register
from crest_spark.sources.tables import load_table, table_path
from crest_spark.streaming.replay import read_stream, run_to_memory, stage_slices


@register(
    "stream_tumbling_window",
    oracle=f"""
        SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) AS win_start,
               event_type,
               COUNT(*) AS n,
               {sum4("value")} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: tumbling event-time window over an 8-micro-batch replay of
    ``events``; the streamed result must equal the batch oracle exactly."""
    src = table_path(sf_dir, "events")
    staging, schema = stage_slices(spark, src, n_slices=8, order_col="event_id")
    stream = read_stream(spark, staging, schema)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.expr(sum4x("value")).alias("sum_value"))
    )
    result = run_to_memory(
        agg, f"s1_tumbling_{abs(hash(sf_dir)) % 10**8}", staging_dir=staging
    )
    return result.select(
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("win_start", "event_type")


@register(
    "stream_sliding_window",
    oracle=f"""
        WITH starts AS (
            SELECT value, event_type,
                   UNNEST([time_bucket(INTERVAL '5 minutes', ts),
                           time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws
            FROM events
        )
        SELECT CAST(FLOOR(epoch(ws)) AS BIGINT) AS win_start,
               event_type,
               COUNT(*) AS n,
               {sum4("value")} AS sum_value
        FROM starts
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: sliding window (10 min window / 5 min slide) over the replay.
    Oracle: every event belongs to exactly two window starts (its 5-min
    bucket and the one before), unnested and re-aggregated."""
    src = table_path(sf_dir, "events")
    staging, schema = stage_slices(spark, src, n_slices=8, order_col="event_id")
    stream = read_stream(spark, staging, schema)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.expr(sum4x("value")).alias("sum_value"))
    )
    result = run_to_memory(
        agg, f"s2_sliding_{abs(hash(sf_dir)) % 10**8}", staging_dir=staging
    )
    return result.select(
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("win_start", "event_type")


@register(
    "stream_session_window",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM ordered
        )
        SELECT user_id,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n
        FROM sessions
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: session windows (30-min inactivity gap) per user, streamed.

    Oracle: gaps-and-islands in plain SQL (new session when the gap
    exceeds 30 min). Boundary semantics differ only when a gap is EXACTLY
    30:00.000000 (Spark: new session; oracle: same session) — measure-
    zero on continuous timestamps. No watermark: closed sessions would be
    evicted from the complete-mode state (bounded-state + append mode is
    exercised in tests/test_streaming.py)."""
    src = table_path(sf_dir, "events")
    staging, schema = stage_slices(spark, src, n_slices=8, order_col="event_id")
    stream = read_stream(spark, staging, schema)
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"))
    result = run_to_memory(
        agg, f"s3_session_{abs(hash(sf_dir)) % 10**8}", staging_dir=staging
    )
    return result.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("session_start"),
        "n",
    ).orderBy("user_id", "session_start")


@register(
    "stream_dedup_counts",
    oracle="""
        SELECT user_id, COUNT(*) AS n
        FROM (SELECT DISTINCT event_id, user_id FROM events)
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: streaming dropDuplicates over a replay in which every slice is
    duplicated (copies=2, at-least-once delivery simulation). The streamed
    dedup + count must equal batch DISTINCT on the original table —
    upgrading the reference's duplicate-prone re-polling source
    (``/root/reference/pkg/ingestor/ingestor.go:131-152``) to
    exactly-once semantics."""
    src = table_path(sf_dir, "events")
    staging, schema = stage_slices(
        spark, src, n_slices=4, order_col="event_id", copies=2
    )
    stream = read_stream(spark, staging, schema, files_per_trigger=2)
    deduped = stream.select("event_id", "user_id").dropDuplicates(["event_id"])
    agg = deduped.groupBy("user_id").agg(F.count("*").alias("n"))
    result = run_to_memory(
        agg, f"s4_dedup_{abs(hash(sf_dir)) % 10**8}", staging_dir=staging
    )
    return result.orderBy("user_id")


@register(
    "stream_stream_join",
    oracle="""
        WITH p AS (
            SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        s AS (
            SELECT event_id AS s_id, user_id AS s_user, ts AS s_ts
            FROM events WHERE event_type = 'signup'
        )
        SELECT p_id, s_id
        FROM p JOIN s ON p_user = s_user
                     AND s_ts <= p_ts
                     AND s_ts >= p_ts - INTERVAL 7 DAY
        ORDER BY p_id, s_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks + an event-time range
    condition (purchases joined to same-user signups within the prior 7
    days), drained over a 4-micro-batch replay. The range condition is
    what BOUNDS the join state: each side's buffered rows age out once
    the other side's watermark passes the interval — without it,
    stream-stream join state grows without bound at 100 TB/day.

    The two sides split from ONE staged replay, so micro-batches
    interleave both streams and the state store genuinely buffers
    rows across batches before their matches arrive."""
    src = table_path(sf_dir, "events")
    staging, schema = stage_slices(spark, src, n_slices=4, order_col="event_id")
    stream = read_stream(spark, staging, schema, files_per_trigger=1)
    purchases = stream.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    signups = stream.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    joined = (
        purchases.withWatermark("p_ts", "30 days")
        .join(signups.withWatermark("s_ts", "30 days"), cond, "inner")
        .select("p_id", "s_id")
    )
    result = run_to_memory(
        joined,
        f"ss_join_{abs(hash(sf_dir)) % 10**8}",
        output_mode="append",
        staging_dir=staging,
    )
    return result.orderBy("p_id", "s_id")


@register(
    "stream_static_join",
    oracle=f"""
        SELECT c.c_mktsegment,
               COUNT(*) AS n,
               {sum4("e.value")} AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the events stream joins a
    static customer dimension per micro-batch (the standard ingest-time
    enrichment pattern), then aggregates by segment; the streamed result
    must equal the batch join exactly.

    Scale posture: the static side is broadcast — each micro-batch's
    join is map-side, no stream-side shuffle for the join itself, and
    the dimension is re-resolvable per batch (Spark re-plans the static
    side per micro-batch, so a slowly-changing dim picks up changes on
    the next trigger). The only stateful shuffle is the windowless
    global aggregate, whose state is one row per (segment)."""
    src = table_path(sf_dir, "events")
    staging, schema = stage_slices(spark, src, n_slices=6, order_col="event_id")
    stream = read_stream(spark, staging, schema)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"], "inner"
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.expr(sum4x("value")).alias("sum_value")
    )
    result = run_to_memory(
        agg,
        f"s6_static_join_{abs(hash(sf_dir)) % 10**8}",
        output_mode="complete",
        staging_dir=staging,
    )
    return result.select("c_mktsegment", "n", "sum_value").orderBy(
        "c_mktsegment"
    )
