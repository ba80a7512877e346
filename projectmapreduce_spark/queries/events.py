"""Streaming-shaped operators in batch form (SURVEY.md §2.9, T1–T6).

Each query here is the batch-equivalent of a Structured Streaming
operator — semantically identical to the `readStream` form (the
streaming wrappers live in ``projectmapreduce_spark.streaming`` and
share this code), but DuckDB-checkable.  Time arithmetic is exact
integer microseconds throughout (FIXTURES.md: ts is µs-precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projectmapreduce_spark.functions import dround
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "t1_tumbling_window",
    oracle="""
SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
       event_type,
       count(*)                          AS n_events,
       round(sum(value), 2)              AS total_value
FROM events
GROUP BY 1, 2
""",
    survey="T1",
    category="events",
)
def t1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate via ``F.window`` — identical
    code runs under Structured Streaming with a watermark; shuffle is
    on (window, type), cardinality-bounded."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "t2_sliding_window",
    oracle="""
SELECT time_bucket(INTERVAL '15 minutes', ts::TIMESTAMP)
         - k.k * INTERVAL '15 minutes' AS window_start,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events
CROSS JOIN (SELECT unnest(range(4)) AS k) k
GROUP BY 1
""",
    survey="T2",
    category="events",
)
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide): each event lands in 4
    overlapping windows — Spark's ``window`` explodes them natively."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "t3_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *, sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts)              AS session_start,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
    survey="T3",
    category="events",
)
def t3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30 min gap) per user via ``F.session_window`` —
    the oracle reproduces the exact merge rule with the islands
    technique.  The boundary is CLOSED: two events exactly 30 min
    apart MERGE (empirically pinned — Spark extends the session for
    diff <= gap; a new session starts only when diff > gap).  The
    sf0.01 fixture never lands on the boundary, so only the round-3
    sf1 sweep (1M second-granularity events → ~100 exact-gap pairs)
    caught the >= drift in the original oracle."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "t4_watermark_filter",
    oracle="""
WITH mx AS (SELECT max(ts) AS max_ts FROM events)
SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
       count(*)                          AS n_events
FROM events, mx
WHERE epoch_us(ts) >= epoch_us(mx.max_ts) - 259200000000
GROUP BY 1
""",
    survey="T4",
    category="events",
)
def t4_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in batch: drop rows older than
    max(ts) − 3 days, then window-aggregate — what
    ``withWatermark('ts', '3 days')`` enforces incrementally."""
    ev = scan(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.unix_micros("ts") >= F.unix_micros("max_ts") - 259_200_000_000)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "t5_stateful_dedup",
    oracle="""
SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    survey="T5",
    category="events",
)
def t5_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) — the deterministic form of
    streaming ``dropDuplicates`` state (keep-first by event time)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        scan(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "t6_stream_static_join",
    oracle="""
SELECT c.c_mktsegment,
       e.event_type,
       count(*)               AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    survey="T6",
    category="events",
)
def t6_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (events ⋈ customer dim) — under
    streaming the static side is broadcast per micro-batch."""
    ev = scan(spark, sf_dir, "events")
    c = scan(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "t9_hierarchical_rollup",
    oracle="""
SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
       event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
""",
    survey="T9,A1,A14",
    category="events",
)
def t9_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: hypertable-style hierarchical rollup — DAILY aggregates
    derived from HOURLY partial aggregates, never from raw events,
    while the oracle aggregates the raw events directly.

    This is the continuous-aggregate maintenance pattern at 100 TB:
    the raw stream is folded once into hourly partials (count /
    exact-decimal sum / min / max — all MERGEABLE states), and every
    coarser resolution re-aggregates the partials (24 rows/day/key
    instead of millions).  The check is strict: hierarchical ==
    direct exactly, which holds ONLY because the sum state is the
    order-independent decimal from the money contract — a
    double-valued partial would drift from the oracle at volume (the
    round-3 sf1 defect class).  Two tiny shuffles on truncated-time
    keys; partial aggregation makes the first map-side-combining."""
    ev = scan(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dround("value", 4).cast("decimal(20,4)")).alias("sum_dec"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return hourly.groupBy(
        F.date_trunc("day", F.col("hour")).alias("day"), "event_type"
    ).agg(
        F.sum("cnt").alias("n_events"),
        F.round(F.sum("sum_dec"), 2).cast("double").alias("total_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )


@query(
    "t10_gaps_islands",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
              THEN 1 ELSE 0 END AS new_island
  FROM events
),
numbered AS (
  SELECT *, sum(new_island) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS island_id
  FROM marked
),
islands AS (
  SELECT user_id, island_id,
         count(*) AS n_events,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
  FROM numbered
  GROUP BY user_id, island_id
)
SELECT user_id,
       count(*)         AS n_islands,
       max(n_events)    AS max_island_events,
       max(span_us)     AS max_island_span_us
FROM islands
GROUP BY user_id
""",
    survey="T10,W2,W3,A1",
    category="events",
)
def t10_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: gaps-and-islands — activity bursts separated by >10-minute
    silences, summarized per user.  This is the MANUAL islands
    surface (lag → boundary flag → running-sum island id → two-level
    aggregate) that t3's built-in ``session_window`` compiles away;
    exposing it matters because real pipelines need the island id for
    joins, not just the collapsed session row.

    Scale shape: ONE shuffle.  The window sorts within user
    partitions; the (user, island) aggregate then requires only
    co-location of equal (user, island) pairs, which the existing
    hash-partitioning on user already satisfies, so both aggregates
    and the window ride the same exchange (no second shuffle — same
    ClusteredDistribution-subsumption argument as m4's secondary
    sort).  Span is integer microseconds end-to-end; nothing floats.
    Skew note: a single pathological user serializes one partition —
    the 100 TB mitigation is the same watermarked streaming variant
    (t3/t9s) that bounds state by time."""
    ev = scan(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_island", F.when(gap_us > 600000000, 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "island_id",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = numbered.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_events").alias("max_island_events"),
        F.max("span_us").alias("max_island_span_us"),
    )


@query(
    "t11_gapfill_resample",
    oracle="""
WITH hb AS (
  SELECT user_id, date_trunc('hour', ts::TIMESTAMP) AS h, ts, value, event_id
  FROM events WHERE ts IS NOT NULL
),
agg AS (
  SELECT user_id, h, count(*)::BIGINT AS n_events FROM hb GROUP BY 1, 2
),
lastv AS (
  SELECT user_id, h, value FROM (
    SELECT user_id, h, value,
           row_number() OVER (PARTITION BY user_id, h
                              ORDER BY ts DESC, event_id DESC, value DESC) AS rn
    FROM hb) WHERE rn = 1
),
bounds AS (
  SELECT user_id, min(h) AS h0,
         least(max(h), min(h) + INTERVAL 7 DAY) AS h1
  FROM hb GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS grid_ts
  FROM bounds
),
j AS (
  SELECT g.user_id, g.grid_ts,
         coalesce(a.n_events, 0)::BIGINT AS n_events, l.value AS v
  FROM grid g
  LEFT JOIN agg  a ON a.user_id = g.user_id AND a.h = g.grid_ts
  LEFT JOIN lastv l ON l.user_id = g.user_id AND l.h = g.grid_ts
)
SELECT user_id, grid_ts, n_events,
       round(last_value(v IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY grid_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS filled_value
FROM j
""",
    survey="T11,W5,F2",
    category="events",
)
def t11_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: gap-filling resample — regularize each user's irregular
    event stream onto an hourly grid with forward-filled state (the
    time-series `resample().ffill()` every monitoring / feature-store
    pipeline runs before joining signals of different cadences).
    Empty hours appear with n_events = 0 and the LAST observed value
    carried forward; hours before a user's first observation stay
    null.

    Shape: one (user, hour) hash aggregate (count + deterministic
    last-by-(ts, event_id, value) via max_by over the ordering struct —
    map-side partials, no fact-table sort), a
    per-user in-row `sequence()` grid explosion bounded by the user's
    own [min, min + 7 days] hour span (the horizon clamp is the output
    budget: grid rows = users × horizon hours regardless of stream
    length or event volume — unclamped, a year-long stream emits 8.7k
    rows per user), a left join back, and ONE window per
    user for the forward fill (`last(ignorenulls)` — state is a single
    value per partition, never the column).  Grid rows are
    output-bytes-bound: horizon-hours × users, independent of event
    volume, so a 100 TB event store resamples to a grid whose size
    tracks the HORIZON, not the input.  Null user_id groups survive
    consistently on both engines (grouped together, joined by equality
    → never matched — same null-join semantics both sides)."""
    ev = (
        scan(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "value", "event_id", F.date_trunc("hour", "ts").alias("h"))
    )
    # max_by over a (ts, event_id, value) struct == the oracle's
    # row_number ORDER BY ts DESC, event_id DESC, value DESC pick:
    # struct comparison treats null members as smallest, matching both
    # engines' NULLS-LAST-under-DESC, and — unlike a window + rn — it
    # is a plain hash aggregate with map-side partials (no full sort
    # of the fact table, no raw-row shuffle).
    hourly = ev.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("max_by(value, struct(ts, event_id, value))").alias("v"),
    )
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.min("h").alias("h0"),
            F.least(
                F.max("h"), F.min("h") + F.expr("INTERVAL 7 DAYS")
            ).alias("h1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("grid_ts"),
        )
    )
    j = grid.join(hourly, (grid.user_id == hourly.user_id) & (grid.grid_ts == hourly.h), "left").select(
        grid.user_id, "grid_ts",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "v",
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id", "grid_ts", "n_events",
        dround(F.last("v", ignorenulls=True).over(wf), 2).alias("filled_value"),
    )
