"""Temporal-dimension shapes over the event stream: SCD2 build,
point-in-time (bi-temporal) lookup, and marketing attribution.

The reference continuously lands change streams into warehouse tables
(``/root/reference/pkg/ingestor/ingestor.go``); these are the standard
queries a warehouse user runs ON such a change stream: turn it into a
type-2 slowly-changing dimension, join facts to the dimension version
valid AT fact time, and attribute conversions to the last preceding
touchpoint. All timestamps are compared as integer MICROSECONDS
(``unix_micros`` in Spark == ``epoch_us`` in DuckDB) so the oracle
comparison is exact and timezone-immune.

Scale note (the part that matters at 100 TB): the point-in-time and
attribution joins are NOT spelled as range joins (fact x all earlier
dim versions explodes quadratically per hot user). Both use the
union-tag + running-last window: union the two tagged streams, one
shuffle on the entity key, ``last(attr, ignorenulls)`` over the
time-ordered frame carries the current version onto every fact row.
O(n log n) per user, single shuffle, no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crest_spark.functions.stable import round4
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

_LOOKBACK_US = 7 * 86_400 * 1_000_000  # 7-day attribution window


@register(
    "q60_scd2_build",
    oracle=f"""
        SELECT user_id,
               {round4("value")} AS attr,
               epoch_us(ts) AS valid_from_us,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts
               ) AS valid_to_us,
               CAST(
                   LEAD(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts
                   ) IS NULL AS BOOLEAN
               ) AS is_current
        FROM events
        WHERE event_type = 'click'
        ORDER BY user_id, valid_from_us
    """,
    tags=("temporal", "scd2", "window"),
)
def q60_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream:
    each 'click' event is a new version of the user's attribute; its
    validity window runs until the next change (LEAD), open-ended for
    the current version.

    One window over one shuffle on the dimension key — the classic SCD2
    materialization, embarrassingly parallel per key. (user_id, ts) is
    unique in the stream, so the version order is total and the build
    is deterministic."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    return (
        ev.select(
            "user_id",
            F.expr(round4("value")).alias("attr"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.lead(F.unix_micros("ts")).over(w).alias("valid_to_us"),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .orderBy("user_id", "valid_from_us")
    )


@register(
    "q61_scd2_point_in_time",
    oracle=f"""
        WITH dim AS (
            SELECT user_id,
                   {round4("value")} AS attr,
                   epoch_us(ts) AS vf,
                   LEAD(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts
                   ) AS vt
            FROM events WHERE event_type = 'click'
        ),
        fact AS (
            SELECT user_id, epoch_us(ts) AS fact_ts_us,
                   {round4("value")} AS amount
            FROM events WHERE event_type = 'purchase'
        )
        SELECT f.user_id, f.fact_ts_us, f.amount, d.attr
        FROM fact f
        LEFT JOIN dim d
          ON d.user_id = f.user_id
         AND d.vf <= f.fact_ts_us
         AND (d.vt IS NULL OR f.fact_ts_us < d.vt)
        ORDER BY f.user_id, f.fact_ts_us
    """,
    tags=("temporal", "scd2", "asof"),
)
def q61_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (bi-temporal) lookup: every purchase fact joined
    to the dimension version valid AT fact time (NULL before the first
    version — a LEFT join, facts are never dropped).

    Spelled WITHOUT a join: union the tagged dim-change and fact
    streams, one shuffle on user_id, and a running ``last(attr,
    ignorenulls)`` over the time-ordered frame carries the in-effect
    version onto each fact row. The range-join spelling the oracle uses
    is O(facts x versions) per user before filtering; this is one sort
    per user. (user_id, ts) is unique across the stream, so no
    same-instant tie between a version change and a fact exists."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(round4("value")).alias("attr"),
        F.lit(None).cast("double").alias("amount"),
        F.lit(1).alias("is_dim"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(None).cast("double").alias("attr"),
        F.expr(round4("value")).alias("amount"),
        F.lit(0).alias("is_dim"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dim.unionByName(fact)
        .withColumn("attr", F.last("attr", ignorenulls=True).over(w))
        .where(F.col("is_dim") == 0)
        .select(
            "user_id",
            F.col("ts_us").alias("fact_ts_us"),
            "amount",
            "attr",
        )
        .orderBy("user_id", "fact_ts_us")
    )


@register(
    "q62_attribution_last_touch",
    oracle=f"""
        WITH t AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click')
        ),
        f AS (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT f.user_id, f.ts AS fts, f.value,
                   t.event_type AS channel,
                   ROW_NUMBER() OVER (
                       PARTITION BY f.user_id, f.ts ORDER BY t.ts DESC
                   ) AS rn
            FROM f
            LEFT JOIN t
              ON t.user_id = f.user_id
             AND t.ts <= f.ts
             AND epoch_us(f.ts) - epoch_us(t.ts) <= {_LOOKBACK_US}
        )
        SELECT COALESCE(channel, 'direct') AS channel,
               CAST(COUNT(*) AS BIGINT) AS conversions,
               {round4("SUM(value)")} AS revenue
        FROM j WHERE rn = 1
        GROUP BY COALESCE(channel, 'direct')
        ORDER BY channel
    """,
    tags=("temporal", "attribution", "behavioral"),
)
def q62_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution with a 7-day lookback: each
    purchase is credited to the channel ('view'/'click') of the most
    recent preceding touchpoint within the window, or 'direct' when
    none exists; output is conversions + revenue per channel.

    Same single-shuffle union-window form as the point-in-time join —
    carry BOTH the last touch channel and its timestamp down the
    per-user timeline, then a row-local lookback check decides
    'direct'. The per-channel rollup is a map-side-combinable count/sum
    over a handful of groups. The oracle's fact-x-touch range join is
    the naive spelling this form avoids."""
    ev = load_table(spark, sf_dir, "events")
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("ch"),
        F.lit(None).cast("double").alias("amount"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(None).cast("string").alias("ch"),
        F.col("value").alias("amount"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        touch.unionByName(fact)
        .withColumn("last_ch", F.last("ch", ignorenulls=True).over(w))
        .withColumn(
            "last_touch_us",
            F.last(
                F.when(F.col("ch").isNotNull(), F.col("ts_us")),
                ignorenulls=True,
            ).over(w),
        )
        .where(F.col("amount").isNotNull())
        .withColumn(
            "channel",
            F.when(
                F.col("last_ch").isNotNull()
                & (
                    F.col("ts_us") - F.col("last_touch_us")
                    <= F.lit(_LOOKBACK_US)
                ),
                F.col("last_ch"),
            ).otherwise(F.lit("direct")),
        )
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.expr(round4("SUM(amount)")).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "q63_longest_streak",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 1000000 AS BIGINT) // 86400 AS d
            FROM events
        ),
        isl AS (
            SELECT user_id, d,
                   d - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY d
                   ) AS island
            FROM days
        ),
        runs AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id, MAX(len) AS longest_streak
        FROM runs GROUP BY user_id
        ORDER BY longest_streak DESC, user_id
        LIMIT 20
    """,
    tags=("temporal", "behavioral", "window"),
)
def q63_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE active days per user (top 20) — the
    gaps-and-islands idiom: distinct (user, epoch-day), then
    ``day - row_number`` is constant exactly within a consecutive run,
    so one count per (user, island) and a max per user finds the
    streak. Two window-free aggregations plus one window, all on the
    same user_id shuffle; day domain is calendar-bounded so per-user
    state stays tiny at any event volume. Epoch-day integer arithmetic
    keeps bucket edges bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        (
            (F.unix_micros("ts") / F.lit(1_000_000)).cast("long")
            / F.lit(86_400)
        ).cast("long").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "island", F.col("d") - F.row_number().over(w)
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return (
        runs.groupBy("user_id")
        .agg(F.max("len").alias("longest_streak"))
        .orderBy(F.desc("longest_streak"), F.asc("user_id"))
        .limit(20)
    )


@register(
    "q66_attribution_position",
    oracle=f"""
        WITH t AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click')
        ),
        f AS (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT f.user_id, f.ts AS fts, f.value,
                   t.event_type AS channel, t.ts AS tts
            FROM f JOIN t
              ON t.user_id = f.user_id
             AND t.ts <= f.ts
             AND epoch_us(f.ts) - epoch_us(t.ts) <= {_LOOKBACK_US}
        ),
        sized AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY user_id, fts) AS nt,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, fts
                       ORDER BY tts, channel
                   ) AS rn
            FROM j
        ),
        credited AS (
            SELECT channel, value,
                   CASE WHEN nt = 1 THEN 1.0
                        WHEN nt = 2 THEN 0.5
                        WHEN rn = 1 OR rn = nt THEN 0.4
                        ELSE CAST(0.2 AS DOUBLE) / (nt - 2) END AS credit
            FROM sized
            UNION ALL
            SELECT 'direct' AS channel, f.value, 1.0 AS credit
            FROM f
            WHERE NOT EXISTS (
                SELECT 1 FROM t
                WHERE t.user_id = f.user_id AND t.ts <= f.ts
                  AND epoch_us(f.ts) - epoch_us(t.ts) <= {_LOOKBACK_US}
            )
        )
        SELECT channel,
               CAST(SUM(CAST(ROUND(credit, 6) AS DECIMAL(38,6)))
                    AS DOUBLE) AS conversions,
               CAST(SUM(CAST(ROUND(credit * value, 4) AS DECIMAL(38,4)))
                    AS DOUBLE) AS revenue
        FROM credited
        GROUP BY channel
        ORDER BY channel
    """,
    tags=("temporal", "attribution", "behavioral"),
)
def q66_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution with a 7-day
    lookback: each purchase splits its credit 40% / 20% / 40% across
    first / middle / last preceding touchpoints (100% for one touch,
    50/50 for two, 'direct' when none), yielding fractional conversions
    and credited revenue per channel.

    Unlike last-touch (q62), every touch in the window earns credit, so
    the purchase needs its full touch LIST — carried as a running
    collect_list over the per-user timeline (ONE shuffle, same
    union-window form as q62), then filtered to the lookback and
    credited row-locally by array position. The per-user event history
    bounds the array, the 7-day filter bounds the credited slice. The
    oracle's fact×touch range join + COUNT/ROW_NUMBER windows is the
    two-extra-shuffle spelling this form avoids. Credit sums are
    rounded-then-DECIMAL so both engines fold fractional credits
    order-independently."""
    ev = load_table(spark, sf_dir, "events")
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("ch"),
        F.lit(None).cast("double").alias("amount"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(None).cast("string").alias("ch"),
        F.col("value").alias("amount"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("ch").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # running (ts, channel) history; purchases filter it to the window.
    # orderBy includes ch so ties at one timestamp enumerate in the same
    # (tts, channel) order as the oracle's ROW_NUMBER; purchase rows
    # (null ch) sort AFTER same-instant touches so the oracle's
    # t.ts <= f.ts inclusion holds on ties.
    hist = (
        touch.unionByName(fact)
        .withColumn(
            "touches",
            F.collect_list(
                F.when(
                    F.col("ch").isNotNull(),
                    F.struct(F.col("ts_us").alias("tts"), F.col("ch")),
                )
            ).over(w),
        )
        .where(F.col("amount").isNotNull())
        .withColumn(
            "win",
            F.filter(
                "touches",
                lambda s: s["tts"] >= F.col("ts_us") - F.lit(_LOOKBACK_US),
            ),
        )
    )
    nt = F.size("win")
    credited = hist.select(
        "amount",
        nt.alias("nt"),
        F.posexplode_outer("win").alias("pos", "tch"),
    ).select(
        F.coalesce(F.col("tch.ch"), F.lit("direct")).alias("channel"),
        "amount",
        F.when(F.col("nt") <= 1, F.lit(1.0))  # one touch, or direct
        .when(F.col("nt") == 2, F.lit(0.5))
        .when(
            (F.col("pos") == 0) | (F.col("pos") == F.col("nt") - 1),
            F.lit(0.4),
        )
        .otherwise(F.lit(0.2) / (F.col("nt") - 2))
        .alias("credit"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(credit, 6) AS DECIMAL(38,6)))"
                " AS DOUBLE)"
            ).alias("conversions"),
            F.expr(
                "CAST(SUM(CAST(ROUND(credit * amount, 4) AS DECIMAL(38,4)))"
                " AS DOUBLE)"
            ).alias("revenue"),
        )
        .orderBy("channel")
    )
