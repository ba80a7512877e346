"""Window-function queries (SURVEY.md §2.5, W1–W5).

A window is one hash-partition shuffle + an in-partition sort; at
100 TB the partition key choice (user_id, custkey — high cardinality)
keeps groups small, and AQE splits stragglers.  Every ORDER BY below
carries a unique tiebreaker (PK) so ranks are deterministic and
hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projectmapreduce_spark.functions import dround
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "w1_ranking",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       row_number()  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()        OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC) AS rnk,
       dense_rank()  OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC) AS drnk,
       ntile(4)      OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile,
       round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC), 6) AS prank,
       round(cume_dist()    OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC), 6) AS cdist
FROM customer
""",
    survey="W1",
    category="window",
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six ranking functions; tie-sensitive ones rank over a
    bucketed key (ties share ranks → deterministic), row_number/ntile
    over a unique ordering."""
    unique_w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    tie_w = Window.partitionBy("c_mktsegment").orderBy(
        F.floor(F.col("c_acctbal") / 1000).desc()
    )
    return scan(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(unique_w).alias("rn"),
        F.rank().over(tie_w).alias("rnk"),
        F.dense_rank().over(tie_w).alias("drnk"),
        F.ntile(4).over(unique_w).alias("quartile"),
        dround(F.percent_rank().over(tie_w), 6).alias("prank"),
        dround(F.cume_dist().over(tie_w), 6).alias("cdist"),
    )


@query(
    "w2_lag_lead",
    oracle="""
SELECT event_id,
       user_id,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    survey="W2",
    category="window",
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset access: previous/next event and inter-event gap in exact
    integer microseconds (no float epoch)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = scan(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("us_since_prev"),
    )


@query(
    "w3_running_sum",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       round(avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)         AS avg_last3
FROM orders
""",
    survey="W3",
    category="window",
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative + trailing ROWS-frame aggregates.  Frame order fixes
    the summation order, so both engines sum identically."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return scan(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dround(F.sum("o_totalprice").over(cum), 2).alias("running_spend"),
        dround(F.avg("o_totalprice").over(last3), 2).alias("avg_last3"),
    )


@query(
    "w4_range_frame",
    oracle="""
SELECT event_id,
       user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW), 2) AS rolling_7d_value,
       count(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS rolling_7d_events
FROM events
""",
    survey="W4",
    category="window",
)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range (7-day) rolling frame over exact µs epoch — the
    time-series rolling aggregate without self-join blow-up."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, Window.currentRow)
    )
    return scan(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        dround(F.sum("value").over(w), 2).alias("rolling_7d_value"),
        F.count(F.lit(1)).over(w).alias("rolling_7d_events"),
    )


@query(
    "w5_first_last",
    oracle="""
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type)  OVER w AS last_type,
       round(first_value(value) OVER w, 2) AS first_value_amt,
       round(last_value(value)  OVER w, 2) AS last_value_amt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    survey="W5",
    category="window",
)
def w5_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition first/last over an unbounded frame, reduced to one
    row per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        scan(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            dround(F.first("value").over(w), 2).alias("first_value_amt"),
            dround(F.last("value").over(w), 2).alias("last_value_amt"),
        )
        .distinct()
    )


@query(
    "w6_distribution_ranks",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       ntile(4) OVER w AS price_quartile,
       round(percent_rank() OVER w, 12) AS pct_rank,
       round(cume_dist() OVER w, 12) AS cume,
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    survey="W6",
    category="window",
)
def w6_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: distribution analytics — ntile / percent_rank / cume_dist
    per priority class, the quantile-bucketing shape used to stratify
    docs by a quality score before mixture sampling.  The order key is
    made total with the primary key so every engine agrees on ties;
    the fractional ranks are rounded to 12 dp (their divisions are
    int/int but percent_rank's (rank-1)/(n-1) can hit repeating
    binary fractions — rounding both sides keeps the hash stable)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return scan(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("price_quartile"),
        dround(F.percent_rank().over(w), 12).alias("pct_rank"),
        dround(F.cume_dist().over(w), 12).alias("cume"),
    )


@query(
    "w7_windowed_distinct",
    oracle="""
SELECT event_id, user_id,
       len(list_distinct(list(event_type) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)))::BIGINT AS n_types_1d
FROM events
""",
    survey="W7,W4",
    category="window",
)
def w7_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: distinct count over a trailing event-time RANGE frame — the
    'distinct behaviors per entity in the last N hours' shape.  Spark
    has no count(DISTINCT) over windows either; the portable form both
    engines agree on is collect the frame → distinct → size.  The
    frame is exact microseconds (unix_micros vs DuckDB's interval
    arithmetic — no boundary truncation).  One hash shuffle on the
    entity key + an in-partition sort; frame state is bounded by the
    time horizon, not the partition, and high-cardinality user_id
    keeps groups small at 100 TB."""
    e = scan(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("long")
        .alias("n_types_1d"),
    )


@query(
    "w8_ordered_fold_ema",
    oracle="""
WITH per AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vals,
         count(*)::BIGINT AS n_events
  FROM events
  GROUP BY user_id
)
SELECT user_id, n_events,
       round(list_reduce(vals, (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ema
FROM per
""",
    survey="W8,A8,F5",
    category="window",
)
def w8_ordered_fold_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: per-key ordered-fold recurrence — exponential moving average
    (alpha=0.25, seeded with the first observation) of each user's
    event values in time order.  A recurrence s_t = f(s_{t-1}, x_t) is
    the one per-key sequential shape window frames CANNOT express
    (every frame aggregate is order-insensitive); the portable exact
    form is collect the ordered sequence -> left fold, which both
    engines run as the same sequential double fold (Spark
    ``aggregate``, DuckDB ``list_reduce``) — bit-identical before the
    round.  One hash shuffle on the key; per-group state is the
    group's own sequence, bounded by high-cardinality keys at 100 TB
    (the streaming twin of this shape is x5s's
    ``applyInPandasWithState``).  The deterministic (ts, event_id)
    sort key makes the fold order engine-independent."""
    e = scan(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc,
    )
    return per.select("user_id", "n_events", dround(ema, 6).alias("ema"))


@query(
    "w9_time_weighted_avg",
    oracle="""
WITH step AS (
  SELECT user_id, ts, value,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       round(
         sum(value * epoch_us(next_ts - ts)) / sum(epoch_us(next_ts - ts)),
         6
       ) AS twa
FROM step
WHERE next_ts IS NOT NULL
GROUP BY user_id
HAVING sum(epoch_us(next_ts - ts)) > 0
""",
    survey="W9,W2,A1",
    category="window",
)
def w9_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: time-weighted average — each observation weighted by how
    long it was CURRENT (value × microseconds until the next event),
    the correct mean for irregularly-sampled state (sensor readings,
    prices, queue depths); the arithmetic mean over-weights bursts.
    One lead() window (hash shuffle on the entity key + in-partition
    sort) then a keyed aggregate; weights in exact integer
    microseconds on both engines, so only the final division is
    float.  Last observation per user carries no duration (no
    successor) and is excluded from numerator AND denominator —
    mirrored by the oracle's next_ts IS NOT NULL.  Groups whose total
    duration is 0 µs (all-duplicate timestamps) are dropped on BOTH
    sides (HAVING sum > 0): otherwise Spark's non-ANSI 0/0 returns
    NULL while DuckDB's IEEE divide returns NaN — an engine-divergent
    edge with no meaningful answer anyway."""
    e = scan(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    step = e.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        step.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value") * F.col("dur_us")).alias("num"),
            F.sum("dur_us").alias("den"),
        )
        .filter(F.col("den") > 0)
        .select("user_id", "n_events", dround(F.col("num") / F.col("den"), 6).alias("twa"))
    )


@query(
    "w10_pattern_detect",
    oracle="""
WITH stepped AS (
  SELECT user_id, event_id, ts, value,
         lag(value) OVER w AS prev_value,
         CASE WHEN value > lag(value) OVER w THEN 1
              WHEN value < lag(value) OVER w THEN -1
              ELSE 0 END AS dir,
         row_number() OVER w AS rn
  FROM events
  WHERE user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
grouped AS (
  SELECT user_id, event_id, value, prev_value, dir, rn,
         rn - row_number() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
  FROM stepped
  WHERE dir IS NOT NULL
),
runs AS (
  SELECT user_id, dir, grp,
         count(*) AS run_len,
         min(rn) AS run_start_rn,
         min_by(prev_value, rn) AS first_value,
         max_by(value, rn) AS last_value,
         max_by(event_id, rn) AS last_event_id
  FROM grouped
  GROUP BY user_id, dir, grp
),
paired AS (
  SELECT user_id,
         dir, run_len, last_value, last_event_id,
         lag(dir)        OVER u AS prev_dir,
         lag(run_len)    OVER u AS prev_len,
         lag(first_value) OVER u AS prev_first,
         lag(last_value) OVER u AS prev_last,
         lag(last_event_id) OVER u AS trough_event_id
  FROM runs
  WINDOW u AS (PARTITION BY user_id ORDER BY run_start_rn)
)
SELECT user_id,
       trough_event_id,
       prev_len::BIGINT AS down_len,
       run_len::BIGINT AS up_len,
       round(prev_first - prev_last, 2) AS depth,
       round(last_value - prev_last, 2) AS recovery
FROM paired
WHERE dir = 1 AND prev_dir = -1 AND run_len >= 2 AND prev_len >= 2
ORDER BY user_id, trough_event_id
""",
    survey="W10",
    category="window",
)
def w10_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10: MATCH_RECOGNIZE-style row-pattern detection (the SQL:2016
    feature Spark lacks) re-expressed Spark-first: find every "V" in a
    user's event-value series — a run of >=2 strictly-down steps
    immediately followed by >=2 strictly-up steps — reporting the
    trough event, both run lengths, the drawdown depth (anchored at
    the pre-run PEAK via the carried lag value) and the recovery
    height.

    Pattern machinery is the classic two-layer window composition:
    (1) per-row step DIRECTION via lag, (2) gaps-islands run grouping
    (rn minus per-direction rn), (3) run aggregation, (4) adjacent-run
    pairing via lag over the per-user run sequence — i.e.
    PATTERN (DOWN{2,} UP{2,}) DEFINE DOWN AS value < PREV(value) ...
    compiled to three window passes + one aggregate.  Every ORDER BY
    carries the (ts, event_id) PK so run boundaries are deterministic;
    plateaus (equal consecutive values) form dir=0 runs that break
    adjacency, making 'strictly' exact.

    Scale: all windows partition by user_id (high cardinality, so AQE
    sees many small groups); the run aggregate groups by
    (user_id, dir, grp) — a refinement of the window partitioning —
    and the final pairing re-partitions by user_id.  No global sort,
    no collect; state per user is bounded by that user's event count,
    same as every §2.5 window."""
    e = scan(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    stepped = e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.when(F.col("value") > F.lag("value").over(w), 1)
        .when(F.col("value") < F.lag("value").over(w), -1)
        .otherwise(0)
        .alias("dir"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("dir").isNotNull())
    wd = Window.partitionBy("user_id", "dir").orderBy("rn")
    grouped = stepped.withColumn("grp", F.col("rn") - F.row_number().over(wd))
    runs = grouped.groupBy("user_id", "dir", "grp").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("rn").alias("run_start_rn"),
        F.min_by("prev_value", "rn").alias("first_value"),
        F.max_by("value", "rn").alias("last_value"),
        F.max_by("event_id", "rn").alias("last_event_id"),
    )
    u = Window.partitionBy("user_id").orderBy("run_start_rn")
    paired = runs.select(
        "user_id",
        "dir",
        "run_len",
        "last_value",
        F.lag("dir").over(u).alias("prev_dir"),
        F.lag("run_len").over(u).alias("prev_len"),
        F.lag("first_value").over(u).alias("prev_first"),
        F.lag("last_value").over(u).alias("prev_last"),
        F.lag("last_event_id").over(u).alias("trough_event_id"),
    )
    return (
        paired.filter(
            (F.col("dir") == 1)
            & (F.col("prev_dir") == -1)
            & (F.col("run_len") >= 2)
            & (F.col("prev_len") >= 2)
        )
        .select(
            "user_id",
            "trough_event_id",
            F.col("prev_len").alias("down_len"),
            F.col("run_len").alias("up_len"),
            dround(F.col("prev_first") - F.col("prev_last"), 2).alias("depth"),
            dround(F.col("last_value") - F.col("prev_last"), 2).alias("recovery"),
        )
        .orderBy("user_id", "trough_event_id")
    )


@query(
    "w11_funnel_analysis",
    oracle="""
WITH v AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS v_ts
  FROM events
),
c AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= v_ts
                      AND ts <= v_ts + INTERVAL 72 HOUR THEN ts END)
               OVER (PARTITION BY user_id) AS c_ts
  FROM v
),
p AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= c_ts
                      AND ts <= c_ts + INTERVAL 72 HOUR THEN ts END)
               OVER (PARTITION BY user_id) AS p_ts
  FROM c
),
per_user AS (
  SELECT user_id, max(v_ts) AS v_ts, max(c_ts) AS c_ts, max(p_ts) AS p_ts
  FROM p GROUP BY user_id
)
SELECT count(v_ts)::BIGINT AS n_view,
       count(c_ts)::BIGINT AS n_click,
       count(p_ts)::BIGINT AS n_purchase,
       sum(epoch_us(c_ts::TIMESTAMP) - epoch_us(v_ts::TIMESTAMP))::BIGINT AS click_lag_us,
       sum(CASE WHEN p_ts IS NOT NULL
                THEN epoch_us(p_ts::TIMESTAMP) - epoch_us(c_ts::TIMESTAMP) END)::BIGINT
           AS purchase_lag_us
FROM per_user
""",
    survey="W11",
    category="window",
)
def w11_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: ordered event-SEQUENCE matching (funnel analysis) — for
    each user, the first view, the first click within 72 h AFTER that
    view, and the first purchase within 72 h after that click; the
    funnel reports per-step user counts and exact step-latency sums.
    This is the product-analytics shape (and the windowed cousin of
    W10's pattern matching): each stage is a conditional MIN over the
    user's partition referencing the previous stage's column, so the
    whole three-stage funnel compiles to ONE shuffle on user_id and
    three window passes — never a self-join per stage (the naive
    3-way event self-join is quadratic in events-per-user; the window
    form is linear and is what survives 100 TB).

    Determinism: stage anchors are MINIMUM timestamps (tie-collapsing,
    so duplicate-ts events cannot flip the anchor), latencies are
    exact integer microseconds, and the output is a single global
    aggregate row — nothing floats."""
    e = scan(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    h72 = F.expr("INTERVAL 72 HOURS")
    v = e.withColumn(
        "v_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    c = v.withColumn(
        "c_ts",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("v_ts"))
                & (F.col("ts") <= F.col("v_ts") + h72),
                F.col("ts"),
            )
        ).over(w),
    )
    p = c.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("c_ts"))
                & (F.col("ts") <= F.col("c_ts") + h72),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = p.groupBy("user_id").agg(
        F.max("v_ts").alias("v_ts"),
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.count("v_ts").alias("n_view"),
        F.count("c_ts").alias("n_click"),
        F.count("p_ts").alias("n_purchase"),
        F.sum(F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("click_lag_us"),
        F.sum(
            F.when(
                F.col("p_ts").isNotNull(),
                F.unix_micros("p_ts") - F.unix_micros("c_ts"),
            )
        ).alias("purchase_lag_us"),
    )
