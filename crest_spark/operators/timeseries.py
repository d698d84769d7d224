"""Time-series operators: gap-based sessionization and grid gap-fill.

The reference delegates analytics upstream (``/root/reference/README.md:13``);
these are the event-stream shapes its warehouse users run on ingested
event tables, expressed as single-shuffle window/grid plans.

Scale posture: both operators shuffle once on their natural partition key
(user_id / event_type) and then run pure window/aggregate logic inside
the partition — no self-joins, no driver loops. Skewed keys are split by
AQE; the gap-fill grid is generated per key with ``sequence``, so grid
size is bounded by each key's own time span, never the global span times
key count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crest_spark.functions.stable import round4, sum4, sum4x
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

SESSION_GAP_S = 28_800  # 8 h: ~2 events/session on the driver fixtures
GRID_STEP = "15 minutes"

# Gap comparisons run on integer-second epochs in BOTH engines:
# Spark's unix_timestamp(ts) is floor(internal_micros / 1e6) — pure
# integer arithmetic, and empirically invariant across session timezone
# AND TIMESTAMP/TIMESTAMP_NTZ read types (verified by
# test_events_epoch_bit_equality). The oracle mirrors it with
# epoch_us(ts) // 1000000 — also pure integers — rather than
# FLOOR(epoch(ts)), whose double rounding near second boundaries is
# build-dependent.

_SESSION_SQL = """
    WITH ordered AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, ts_s,
               CASE WHEN ts_s - LAG(ts_s) OVER (
                        PARTITION BY user_id ORDER BY ts_s, event_id
                    ) > {gap} THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ),
    sess AS (
        SELECT user_id, event_id, ts_s,
               -- CAST: DuckDB types a window SUM over integers as HUGEINT
               -- (int128), which Arrow/pandas render as decimal128/float64 —
               -- numerically equal to Spark's int64 but serialized-hash
               -- different. BIGINT keeps both engines on int64.
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           MIN(ts_s) AS start_epoch,
           MAX(ts_s) AS end_epoch,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""


@register(
    "q33_sessionize",
    oracle=_SESSION_SQL.format(gap=SESSION_GAP_S),
    tags=("window", "time", "session"),
)
def q33_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch form of the streaming session
    window): a new session starts when a user is idle longer than the
    gap. LAG marks boundaries, a running SUM numbers sessions, one
    groupBy summarizes — the standard two-window sessionize, ONE
    shuffle on user_id total (both windows and the aggregate share the
    partitioning)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    order = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.col("ts_s") - F.lag("ts_s").over(order) > SESSION_GAP_S, 1
        ).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("new_sess").over(run))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_s").alias("start_epoch"),
            F.max("ts_s").alias("end_epoch"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


_GAPFILL_SQL = f"""
    WITH b AS (
        SELECT event_type,
               time_bucket(INTERVAL '{GRID_STEP}', ts) AS bucket,
               {sum4("value")} AS sum_value
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
        FROM b GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               UNNEST(generate_series(mn, mx, INTERVAL '{GRID_STEP}')) AS bucket
        FROM bounds
    )
    SELECT g.event_type,
           CAST(FLOOR(epoch(g.bucket)) AS BIGINT) AS bucket_epoch,
           last_value(b.sum_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_value,
           CASE WHEN b.sum_value IS NULL THEN 1 ELSE 0 END AS filled
    FROM grid g
    LEFT JOIN b ON b.event_type = g.event_type AND b.bucket = g.bucket
    ORDER BY g.event_type, bucket_epoch
"""


@register(
    "q34_gapfill",
    oracle=_GAPFILL_SQL,
    tags=("window", "time", "gapfill"),
)
def q34_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid gap-fill with last-observation-carried-forward: each
    event_type's sparse 15-minute buckets become a dense series between
    its own min and max bucket, empty buckets carrying the previous
    value (`filled` marks them).

    Plan: one aggregation on (event_type, bucket); the dense grid is
    ``sequence`` + explode off the per-key bounds (tiny); the fill is a
    last(ignorenulls) window on the same event_type partitioning — so
    the whole operator rides a single hash partitioning on event_type
    with no range join."""
    e = load_table(spark, sf_dir, "events")
    b = (
        e.groupBy(
            "event_type", F.window("ts", GRID_STEP).alias("w")
        )
        .agg(F.expr(sum4x("value")).alias("sum_value"))
        .select("event_type", F.col("w.start").alias("bucket"), "sum_value")
    )
    grid = (
        b.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr(f"INTERVAL {GRID_STEP}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            F.unix_timestamp("bucket").cast("bigint").alias("bucket_epoch"),
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value"),
            F.when(F.col("sum_value").isNull(), 1).otherwise(0).alias("filled"),
        )
        .orderBy("event_type", "bucket_epoch")
    )


# ---------------------------------------------------------------------------
# Multi-resolution rollup (hypertable continuous-aggregate shape)
# ---------------------------------------------------------------------------

_MULTIRES_SQL = """
    WITH minute AS (
        SELECT event_type,
               time_bucket(INTERVAL 1 MINUTE, ts) AS m_bucket,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(30,8))) AS sv
        FROM events GROUP BY 1, 2
    ),
    hour AS (
        SELECT event_type,
               time_bucket(INTERVAL 1 HOUR, m_bucket) AS h_bucket,
               SUM(n) AS n, SUM(sv) AS sv,
               COUNT(*) AS active_minutes
        FROM minute GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(FLOOR(epoch(time_bucket(INTERVAL 1 DAY, h_bucket))) AS BIGINT)
               AS day_epoch,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(sv), 4) AS DOUBLE) AS sum_value,
           CAST(SUM(active_minutes) AS BIGINT) AS active_minutes,
           CAST(COUNT(*) AS BIGINT) AS active_hours
    FROM hour
    GROUP BY 1, time_bucket(INTERVAL 1 DAY, h_bucket)
    ORDER BY event_type, day_epoch
"""


@register(
    "q46_multires_rollup",
    oracle=_MULTIRES_SQL,
    tags=("timeseries", "agg", "rollup"),
)
def q46_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading multi-resolution rollup (the hypertable continuous-
    aggregate shape): minute buckets from raw events, hour buckets FROM
    the minute aggregates, day buckets FROM the hour aggregates — plus
    per-level activity counts that are only expressible on the cascade
    (distinct active minutes/hours per day).

    Scale rationale: the raw table is touched ONCE, at minute grain;
    every coarser resolution re-aggregates the previous level's already
    ~1000x-reduced output, so the day rollup over 100 TB costs one fact
    scan + two metadata-scale shuffles (each level's partial aggregate
    is map-side combined before its exchange). Sums stay in
    DECIMAL(30,8) across levels so the cascade is bit-identical to a
    direct day aggregation regardless of partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    minute = (
        ev.groupBy(
            "event_type", F.date_trunc("minute", "ts").alias("m_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("sv"),
        )
    )
    hour = (
        minute.groupBy(
            "event_type", F.date_trunc("hour", "m_bucket").alias("h_bucket")
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
            F.count(F.lit(1)).alias("active_minutes"),
        )
    )
    return (
        hour.groupBy(
            "event_type", F.date_trunc("day", "h_bucket").alias("d_bucket")
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            # round the DECIMAL sum, then cast: exact half-away-from-zero
            # in both engines (rounding the double instead can split on
            # x.xxxx5 halfway values — the divergence round4 exists for)
            F.expr("CAST(ROUND(SUM(sv), 4) AS DOUBLE)").alias("sum_value"),
            F.sum("active_minutes").cast("bigint").alias("active_minutes"),
            F.count(F.lit(1)).cast("bigint").alias("active_hours"),
        )
        .select(
            "event_type",
            F.unix_timestamp("d_bucket").cast("bigint").alias("day_epoch"),
            "n_events",
            "sum_value",
            "active_minutes",
            "active_hours",
        )
        .orderBy("event_type", "day_epoch")
    )


# ---------------------------------------------------------------------------
# Grid gap-fill with LINEAR interpolation
# ---------------------------------------------------------------------------

_INTERP = """CASE
    WHEN v IS NOT NULL THEN v
    WHEN pv IS NULL THEN nv
    WHEN nv IS NULL THEN pv
    ELSE pv + (nv - pv) * (ep - pe) / (ne - pe)
END"""

_GAPFILL_INTERP_SQL = f"""
    WITH b AS (
        SELECT event_type,
               time_bucket(INTERVAL '{GRID_STEP}', ts) AS bucket,
               {sum4("value")} AS sum_value
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
        FROM b GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               UNNEST(generate_series(mn, mx, INTERVAL '{GRID_STEP}')) AS bucket
        FROM bounds
    ),
    j AS (
        SELECT g.event_type,
               CAST(FLOOR(epoch(g.bucket)) AS BIGINT) AS ep,
               CAST(b.sum_value AS DOUBLE) AS v
        FROM grid g
        LEFT JOIN b ON b.event_type = g.event_type AND b.bucket = g.bucket
    ),
    w AS (
        SELECT event_type, ep, v,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY ep
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY ep
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pe,
               first_value(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY ep
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY ep
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ne
        FROM j
    )
    SELECT event_type, ep AS bucket_epoch,
           {round4(_INTERP)} AS value_interp,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS filled
    FROM w
    ORDER BY event_type, bucket_epoch
"""


@register(
    "q34b_gapfill_interpolate",
    oracle=_GAPFILL_INTERP_SQL,
    tags=("window", "time", "gapfill", "interpolation"),
)
def q34b_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid gap-fill with LINEAR interpolation: empty buckets get
    the time-weighted blend of the surrounding known values (edges fall
    back to nearest-known) — the other half of the hypertable gap-fill
    surface next to q34's carry-forward.

    Same single event_type hash partitioning as q34: bucket aggregation,
    tiny per-key grid, then two mirrored ignorenulls windows (backward
    last + forward first) produce the bracketing (value, epoch) pairs
    and the blend is pure row-local arithmetic. Both engines interpolate
    on identical double operands (decimal sums cast down, integer epoch
    gaps), so the rounded result is bit-stable."""
    e = load_table(spark, sf_dir, "events")
    b = (
        e.groupBy("event_type", F.window("ts", GRID_STEP).alias("w"))
        .agg(F.expr(sum4x("value")).alias("sum_value"))
        .select("event_type", F.col("w.start").alias("bucket"), "sum_value")
    )
    grid = (
        b.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr(f"INTERVAL {GRID_STEP}"))
            ).alias("bucket"),
        )
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("ep")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("ep")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = grid.join(b, ["event_type", "bucket"], "left").select(
        "event_type",
        F.unix_timestamp("bucket").cast("bigint").alias("ep"),
        F.col("sum_value").cast("double").alias("v"),
    )
    known_ep = F.when(F.col("v").isNotNull(), F.col("ep"))
    w = j.select(
        "event_type",
        "ep",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_ep, ignorenulls=True).over(wb).alias("pe"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_ep, ignorenulls=True).over(wf).alias("ne"),
    )
    return w.select(
        "event_type",
        F.col("ep").alias("bucket_epoch"),
        F.expr(round4(_INTERP)).alias("value_interp"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("filled"),
    ).orderBy("event_type", "bucket_epoch")


# ---------------------------------------------------------------------------
# EWMA smoothing & rolling z-score anomalies (shared SQL template: the same
# body runs in Spark SQL and DuckDB; only the day-bucket expression and the
# table name differ). Both pre-aggregate the fact to ONE exact-integer row
# per day first, so the global ordered window that follows runs over the
# day spine — O(#days) rows (36.5k rows per century), not event volume —
# which is why a single-partition window is fine at 100 TB: the only
# full-fact work is the map-side-combinable daily groupBy.
# ---------------------------------------------------------------------------

# alpha = 1/2 EWMA over the last 14 OBSERVED days, spelled as an explicit
# lag chain with power-of-two weights: numerator and denominator are exact
# BIGINT sums (weights 2^13..2^0, daily cents), so the only float op is one
# final division — bit-identical across engines by IEEE determinism. A
# window-SUM of weighted doubles would be summation-order-dependent; the
# lag chain fixes the evaluation order in the expression tree itself.
_EWMA_NUM = " + ".join(
    f"COALESCE(LAG(cents, {j}) OVER w, 0) * {1 << (13 - j)}"
    for j in range(14)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN LAG(cents, {j}) OVER w IS NOT NULL THEN {1 << (13 - j)} ELSE 0 END)"
    for j in range(14)
)
_EWMA_SQL = """
    WITH daily AS (
        SELECT {day} AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM {events}
        GROUP BY 1
    ),
    weighted AS (
        SELECT day, cents,
               ({num}) AS num,
               ({den}) AS den
        FROM daily
        WINDOW w AS (ORDER BY day)
    )
    SELECT day,
           CAST(ROUND(CAST(CAST(cents AS DOUBLE) / 100 AS DECIMAL(30,8)), 4) AS DOUBLE) AS revenue,
           CAST(ROUND(CAST(CAST(num AS DOUBLE) / den / 100 AS DECIMAL(30,12)), 4) AS DOUBLE) AS ewma
    FROM weighted
    ORDER BY day
"""

_SPARK_DAY = "unix_timestamp(ts) DIV 86400"
_DUCK_DAY_TS = "CAST(epoch_us(ts) // 1000000 AS BIGINT) // 86400"


@register(
    "ts_ewma",
    oracle=_EWMA_SQL.format(
        day=_DUCK_DAY_TS, events="events", num=_EWMA_NUM, den=_EWMA_DEN
    ),
    tags=("timeseries", "smoothing", "window"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=1/2) of daily event
    revenue over the last 14 observed days.

    The weight of observation j days back is 2^(13-j), so numerator and
    denominator stay exact integers; partial head windows renormalize by
    the weights actually present. One full-fact shuffle (the daily
    pre-aggregation, map-side combinable); the trend window itself runs
    over the tiny day spine."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_ts_ev")
    return spark.sql(
        _EWMA_SQL.format(
            day=_SPARK_DAY, events="_ts_ev", num=_EWMA_NUM, den=_EWMA_DEN
        )
    )


# Rolling z-score anomaly detection: each day scored against the TRAILING
# 7 observed days (current day excluded — an anomalous spike must not
# inflate its own baseline). Mean and variance come from exact BIGINT
# sum/sum-of-squares moments, so z is one deterministic double expression;
# sqrt is correctly rounded by IEEE 754, making even the |z| > 2 FILTER
# decision bit-identical across engines.
_ZSCORE_SQL = """
    WITH daily AS (
        SELECT {day} AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM {events}
        GROUP BY 1
    ),
    m AS (
        SELECT day, cents,
               COUNT(cents) OVER w AS n,
               SUM(cents) OVER w AS s,
               SUM(cents * cents) OVER w AS ss
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
        SELECT day, cents, n,
               (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / SQRT((n * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * (n - 1))) AS z
        FROM m
        WHERE n = 7
          AND n * ss > s * s
    )
    SELECT day,
           CAST(ROUND(CAST(CAST(cents AS DOUBLE) / 100 AS DECIMAL(30,8)), 4) AS DOUBLE) AS revenue,
           CAST(ROUND(CAST(z AS DECIMAL(30,12)), 4) AS DOUBLE) AS zscore,
           CAST(CASE WHEN ABS(z) > 2 THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM scored
    ORDER BY day
"""


@register(
    "ts_zscore_anomaly",
    oracle=_ZSCORE_SQL.format(day=_DUCK_DAY_TS, events="events"),
    tags=("timeseries", "anomaly", "window"),
)
def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue z-scored against the mean and standard deviation of
    the trailing 7 observed days (the day being scored is excluded from
    its own baseline), with the |z| > 2 anomaly flag.
    Same scale shape as ``ts_ewma``: one daily pre-aggregation shuffle,
    then a day-spine window; the integer-moment variance makes the
    anomaly flag itself (not just the reported score) engine-exact."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_ts_ev")
    return spark.sql(_ZSCORE_SQL.format(day=_SPARK_DAY, events="_ts_ev"))


# CUSUM changepoint detection. The textbook recursion
# S_i = max(0, S_{i-1} + dev_i) is not window-expressible, but it has a
# closed prefix form: S_i = P_i - min(0, min_{j<=i} P_j) where
# P = running sum of dev — so the whole detector is two cumulative
# windows per series, no recursion, no UDF. dev is rounded to DECIMAL
# before the cumulative fold, so the running sums are exact and
# order-independent in both engines; mu/sigma come from exact BIGINT
# cent moments, making the breach flag itself engine-exact.
_CUSUM_SQL = """
    WITH daily AS (
        SELECT event_type, {day} AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM {events}
        GROUP BY event_type, {day}
    ),
    base AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(cents) AS s1, SUM(cents * cents) AS s2
        FROM daily GROUP BY event_type
    ),
    par AS (
        SELECT event_type,
               CAST(s1 AS DOUBLE) / n AS mu,
               SQRT((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (n - 1))) AS sigma
        FROM base WHERE n > 1
    ),
    dev AS (
        SELECT d.event_type, d.day, p.sigma,
               CAST(ROUND(CAST(d.cents AS DOUBLE) - p.mu
                          - CAST(0.5 AS DOUBLE) * p.sigma, 4)
                    AS DECIMAL(38,4)) AS dev
        FROM daily d JOIN par p ON d.event_type = p.event_type
    ),
    cum AS (
        SELECT event_type, day, sigma,
               SUM(dev) OVER (PARTITION BY event_type ORDER BY day) AS p
        FROM dev
    ),
    s AS (
        SELECT event_type, day, sigma,
               p - LEAST(CAST(0 AS DECIMAL(38,4)),
                         MIN(p) OVER (PARTITION BY event_type ORDER BY day)) AS cs
        FROM cum
    )
    SELECT event_type, day,
           CAST(ROUND(CAST(CAST(cs AS DOUBLE) / 100 AS DECIMAL(30,8)), 4)
                AS DOUBLE) AS cusum,
           CAST(CASE WHEN CAST(cs AS DOUBLE) > CAST(4 AS DOUBLE) * sigma
                THEN 1 ELSE 0 END AS INT) AS breach
    FROM s
    ORDER BY event_type, day
"""


@register(
    "ts_cusum_changepoint",
    oracle=_CUSUM_SQL.format(day=_DUCK_DAY_TS, events="events"),
    tags=("timeseries", "changepoint", "window"),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM upward-shift detector per event-type revenue
    series: daily totals against a mu + 0.5 sigma allowance, breach when
    the cumulative excursion passes 4 sigma — the standard
    sequential-changepoint chart, expressed without recursion via the
    prefix identity S_i = P_i - min(0, running-min P).

    Scale shape: one map-side-combinable daily pre-aggregation over the
    fact; per-series (mu, sigma) from exact integer cent moments on the
    tiny daily relation; then two cumulative windows PARTITIONED BY
    series — thousands of independent series parallelize across
    partitions, nothing global. Exactness: integer cents -> exact
    moments -> identical doubles for mu/sigma in both engines; the
    order-sensitive cumulative folds run over 4-dp DECIMAL, so S and
    the breach flag are bit-identical."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_cusum_ev")
    return spark.sql(_CUSUM_SQL.format(day=_SPARK_DAY, events="_cusum_ev"))


# Seasonal-trend decomposition (classical additive, STL's role): daily
# revenue = trend + day-of-week seasonal + remainder. All intermediate
# arithmetic is exact integers — cents x7 for the centered-MA detrend
# (7*cents - window_sum is a BIGINT identity, no division until the
# final projection) and x(7*n_dow) for the seasonal mean — so every
# reported double is ONE exact-rational-to-double conversion, rounded
# 4dp, bit-identical across engines. dow = epoch_day % 7 (pure integer;
# engine day-of-week builtins disagree on week start).
_STL_DAILY_SQL = """
    SELECT {day} AS day,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
    FROM {events}
    GROUP BY 1
"""

_STL_SQL = """
    WITH daily AS ({daily}),
    tr AS (
        SELECT day, cents, day % 7 AS dow,
               COUNT(cents) OVER w AS n7,
               SUM(cents) OVER w AS s7
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT day, cents, dow, s7,
               7 * cents - s7 AS det7      -- 7x the detrended value
        FROM tr
        WHERE n7 = 7                       -- full centered window only
    ),
    seas AS (
        SELECT dow,
               SUM(det7) AS sd7,           -- sum of 7x detrended
               COUNT(*) AS nd
        FROM det GROUP BY dow
    )
    SELECT d.day,
           CAST(ROUND(CAST(CAST(d.cents AS DOUBLE) / 100 AS DECIMAL(30,8)), 4) AS DOUBLE) AS revenue,
           CAST(ROUND(CAST(CAST(d.s7 AS DOUBLE) / 700 AS DECIMAL(30,8)), 4) AS DOUBLE) AS trend,
           CAST(ROUND(CAST(CAST(s.sd7 AS DOUBLE) / (700 * s.nd) AS DECIMAL(30,12)), 4) AS DOUBLE) AS seasonal,
           CAST(ROUND(CAST(
               (CAST(d.det7 AS DOUBLE) / 700)
               - (CAST(s.sd7 AS DOUBLE) / (700 * s.nd))
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS remainder
    FROM det d JOIN seas s ON s.dow = d.dow
    ORDER BY d.day
"""


@register(
    "ts_stl_decompose",
    oracle=_STL_SQL.format(
        daily=_STL_DAILY_SQL.format(day=_DUCK_DAY_TS, events="events")
    ),
    tags=("timeseries", "decomposition", "window"),
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    trend = 7-day centered moving average (full windows only),
    seasonal = per-day-of-week mean of the detrended series,
    remainder = what neither explains — the anomaly-detection /
    forecasting preprocessing primitive.

    One full-fact shuffle (the daily pre-aggregation, map-side
    combinable); the trend window and the 7-row seasonal join run over
    the tiny day spine, so cost at 100 TB is the daily rollup and
    nothing else. The day spine is PINNED (localCheckpoint — a few
    hundred rows at any SF) because the decomposition references it
    from both the seasonal aggregate and the final join: inlined CTEs
    would re-run the full-fact rollup once per reference
    (plan-asserted: exactly one fact scan, test_plans.py).
    Exact-integer arithmetic throughout (see _STL_SQL) keeps even the
    remainder engine-exact."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_stl_ev")
    daily = spark.sql(
        _STL_DAILY_SQL.format(day=_SPARK_DAY, events="_stl_ev")
    ).localCheckpoint(eager=False)
    daily.createOrReplaceTempView("_stl_daily")
    return spark.sql(_STL_SQL.format(daily="SELECT * FROM _stl_daily"))


# Merged-interval coverage (gaps-and-islands over half-open intervals):
# each event opens a fixed-length attention window; overlapping windows
# merge, and the per-user covered time is the sum of merged island
# lengths. The scheduling/uptime/ad-exposure primitive.
_COVERAGE_SQL = """
    WITH iv AS (
        SELECT user_id,
               {sec} AS s,
               {sec} + {dur} AS e
        FROM {events}
    ),
    marked AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               CAST(SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island,
               MIN(s) AS island_start, MAX(e) AS island_end
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_end - island_start) AS BIGINT) AS covered_s
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
"""

_COVERAGE_DUR_S = 300  # each event covers 5 minutes


@register(
    "ts_interval_coverage",
    oracle=_COVERAGE_SQL.format(
        dur=_COVERAGE_DUR_S,
        events="events",
        sec="CAST(epoch_us(ts) // 1000000 AS BIGINT)",
    ),
    tags=("timeseries", "intervals", "gaps-islands"),
)
def ts_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage per user: every event opens a 5-minute
    window, overlapping windows merge (gaps-and-islands via a running
    MAX of interval ends — the first interval of a user is island 1 by
    the NULL comparison falling to ELSE 0... see below), and the output
    is islands + total covered seconds.

    Why window-form and not a self-join: interval merging is the
    textbook case where the naive overlap self-join is O(k^2) per user;
    the running-max form is ONE shuffle on user_id + one sort, O(k log
    k) per user, and AQE splits skewed users. Integer-second epochs
    keep it engine-exact. NOTE the first-row case: MAX OVER an empty
    preceding frame is NULL, `s > NULL` is NULL, CASE falls to 0 — so
    island numbering starts at 0+...cumulative sums make the first
    island id 0; identical in both engines, and ids are internal."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_cov_ev")
    return spark.sql(
        _COVERAGE_SQL.format(
            dur=_COVERAGE_DUR_S,
            events="_cov_ev",
            sec="unix_timestamp(ts)",
        )
    )
