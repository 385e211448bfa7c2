"""Window functions W1-W4 (SURVEY.md §2.5) — all built-in.

Scale note: window partitions are ``partitionBy`` keys — one shuffle per
distinct partitioning; at 100 TB the key must be chosen high-cardinality
(here per-nation / per-customer), never ``Window.orderBy`` without
``partitionBy`` (single-partition global windows don't scale; global
orderings belong in O1 range-partitioned sorts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, materialize_if_wide
from ..functions.exprs import dec_money, sql_sum_money, sum_money
from ..registry import QuerySpec, spec


@spec(
    """
    SELECT c_custkey, c_nationkey,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk,
           ntile(4)      OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="W1 ranking functions (deterministic: c_custkey tie-break).",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@spec(
    """
    SELECT o_orderkey, o_custkey,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           first_value(o_orderkey) OVER w AS first_order,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="W2 analytic functions lag/lead/first over per-customer order history.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("days_since_prev"),
    )


@spec(
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           COUNT(*) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM orders
    """,
    doc="W3 running aggregate with an explicit ROWS frame (exact decimal sum).",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias(
            "running_total"
        ),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@spec(
    """
    SELECT c_custkey, c_nationkey, n_in_band
    FROM (
      SELECT c_custkey, c_nationkey,
             COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                            RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)
               AS n_in_band
      FROM customer)
    """,
    doc="W3 value-range frame: peers within +/-500 of each customer's balance.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal").rangeBetween(-500, 500)
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
    )


@spec(
    """
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    """,
    doc="W4 top-k per group (row_number filter; DuckDB QUALIFY as oracle).",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        load(spark, sf_dir, "customer")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@spec(
    """
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           ntile(7)       OVER w AS septile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="W1 distribution functions: percent_rank / cume_dist / ntile(7) per "
    "nation (deterministic tie-break).  Completes the ranking-family "
    "surface beyond window_rank's row_number/rank/dense_rank/ntile(4).  "
    "Surfaced UNROUNDED, deliberately: both engines compute the identical "
    "IEEE division of the same integer rank/count, so the raw doubles are "
    "bit-exact — while round(6) is what DIVERGES: when cume = k/n has a "
    "shortest decimal repr ending in ...5 at the 7th place (e.g. 333/640 = "
    "0.5203125), Spark rounds that shortest repr HALF_UP (-> ...13) but "
    "DuckDB rounds the binary value (just below the half) down (-> ...12) — "
    "found by sf0.1 parity sweep, round 6.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(7).over(w).alias("septile"),
    )


@spec(
    """
    SELECT o_orderkey, o_custkey,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_seen
    FROM (SELECT *,
                 CASE WHEN o_orderkey % 3 = 0
                      THEN CAST(o_totalprice AS DOUBLE) END AS v
          FROM orders)
    """,
    doc="W2+ gap fill (last-observation-carried-forward): a sparse measure "
    "(planted NULLs on 2/3 of rows) forward-fills per customer from the "
    "last non-null via IGNORE NULLS frames — the standard sparse-timeseries "
    "densification (sensor/price feeds).  Same one-shuffle window topology "
    "as W2; leading rows before the first observation stay NULL on both "
    "engines.",
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "v",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice").cast("double")),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.last("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("filled"),
        F.first("v", ignorenulls=True).over(w).alias("first_seen"),
    )


SESSION_GAP_MIN = 5


@spec(
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MIN} minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM g
    )
    SELECT user_id, sid,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc=f"W2+ batch SESSIONIZATION (gaps-and-islands, {SESSION_GAP_MIN}-min "
    "gap): lag flags session starts, a running sum numbers the islands, one "
    "aggregate closes them — the batch twin of T3's session_window, so the "
    "two surfaces are mutually checkable.  ONE exchange end-to-end: both "
    "windows share the user_id partitioning and the final (user_id, sid) "
    "aggregation is satisfied by it (subset clustering).",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond arithmetic: a cast-to-long would truncate sub-second gaps
    # and disagree with the oracle's exact INTERVAL comparison.  ts arrives
    # TIMESTAMP_NTZ; the cast is identity under the UTC session catalog.load
    # pins, and unix_micros requires the zoned type.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    g = ev.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    s = g.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return s.groupBy("user_id", "sid").agg(
        F.date_format(F.min("ts"), fmt).alias("session_start"),
        F.date_format(F.max("ts"), fmt).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@spec(
    """
    WITH v1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    c2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v1.t1 GROUP BY e.user_id),
    p3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c2.t2 GROUP BY e.user_id)
    SELECT v1.user_id,
           strftime(t1, '%Y-%m-%d %H:%M:%S') AS first_view,
           strftime(t2, '%Y-%m-%d %H:%M:%S') AS first_click,
           strftime(t3, '%Y-%m-%d %H:%M:%S') AS first_purchase
    FROM v1 LEFT JOIN c2 USING (user_id) LEFT JOIN p3 USING (user_id)
    """,
    doc="Event FUNNEL analysis (view -> click -> purchase, strictly ordered "
    "in time): per user, the first view, the first click AFTER that view, "
    "and the first purchase AFTER that click; users drop out of later "
    "stages as NULLs.  Three same-key aggregations + joins — every stage "
    "keys on user_id, so one hash partitioning serves the whole funnel and "
    "AQE collapses the co-partitioned joins.  The standard product-analytics "
    "query a lake engine must express without a sessionization service.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    # the three stage branches each scan events with their own pushed
    # event_type filter — correct below the SF-adaptive threshold (three
    # pruned scans, plan-locked pushdown unchanged), while above it the
    # funnel-relevant projection is materialized ONCE (narrow: 3 columns)
    # and every stage filters the checkpointed rows instead of re-reading
    base = materialize_if_wide(
        ev.select("user_id", "ts", "event_type"), sf_dir, "events"
    )
    v1 = (
        base.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c2 = (
        base.filter(F.col("event_type") == "click")
        .join(v1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p3 = (
        base.filter(F.col("event_type") == "purchase")
        .join(c2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v1.join(c2, "user_id", "left")
        .join(p3, "user_id", "left")
        .select(
            "user_id",
            F.date_format("t1", fmt).alias("first_view"),
            F.date_format("t2", fmt).alias("first_click"),
            F.date_format("t3", fmt).alias("first_purchase"),
        )
    )


@spec(
    """
    WITH e AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS t,
             CASE WHEN event_type = 'purchase' THEN value END AS av,
             CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS att
      FROM events
    ),
    f AS (
      SELECT event_id, user_id, t,
             last_value(av IGNORE NULLS) OVER wp AS pv,
             last_value(att IGNORE NULLS) OVER wp AS pts,
             first_value(av IGNORE NULLS) OVER wn AS nv,
             first_value(att IGNORE NULLS) OVER wn AS nts
      FROM e
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, t AS t_us,
           round(CASE WHEN pts IS NULL THEN nv
                      WHEN nts IS NULL THEN pv
                      WHEN nts = pts THEN pv
                      ELSE pv + (nv - pv) * ((t - pts) / (nts - pts)) END,
                 6) AS v_interp
    FROM f
    """,
    doc="LINEAR TIME INTERPOLATION (the densification step beyond "
    "window_gap_fill's LOCF): 'purchase' events are the observed anchor "
    "points; every other event gets the time-weighted linear blend of its "
    "bracketing anchors within the user, clamping to the nearest anchor at "
    "series edges.  Same one-exchange topology as W2 — both IGNORE-NULLS "
    "frames share the user_id partitioning and (ts, event_id) sort.  "
    "Anchor times are exact integer epoch-micros, so the blend is one "
    "identical IEEE expression tree on both engines (integer deltas cast "
    "to double, one division, one multiply-add) — no float-sum ordering "
    "anywhere.",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = F.col("event_type") == "purchase"
    e = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.when(anchor, F.col("value")).alias("av"),
        F.when(anchor, F.unix_micros(F.col("ts").cast("timestamp"))).alias("att"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    f = e.select(
        "event_id",
        "user_id",
        "t",
        F.last("av", ignorenulls=True).over(wp).alias("pv"),
        F.last("att", ignorenulls=True).over(wp).alias("pts"),
        F.first("av", ignorenulls=True).over(wn).alias("nv"),
        F.first("att", ignorenulls=True).over(wn).alias("nts"),
    )
    blend = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("pts")) / (F.col("nts") - F.col("pts"))
    )
    return f.select(
        "event_id",
        "user_id",
        F.col("t").alias("t_us"),
        F.round(
            F.when(F.col("pts").isNull(), F.col("nv"))
            .when(F.col("nts").isNull(), F.col("pv"))
            .when(F.col("nts") == F.col("pts"), F.col("pv"))
            .otherwise(blend),
            6,
        ).alias("v_interp"),
    )


@spec(
    """
    WITH first AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_ts
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week_ts FROM events
    ),
    sizes AS (
      SELECT cohort_ts, COUNT(*) AS cohort_size FROM first GROUP BY cohort_ts
    )
    SELECT strftime(f.cohort_ts, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_ts, a.week_ts) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size
    FROM act a JOIN first f USING (user_id)
    JOIN sizes s ON f.cohort_ts = s.cohort_ts
    GROUP BY f.cohort_ts, week_offset, s.cohort_size
    """,
    doc="COHORT RETENTION matrix over the event stream — the standard "
    "product-analytics rollup (users grouped by first-active week; how many "
    "of each cohort return k weeks later): one groupBy for each user's "
    "cohort week, one DISTINCT over (user, active-week), a user_id-keyed "
    "join, and one count-distinct per (cohort, offset) cell.  Every stage "
    "keys on user_id until the final cell aggregation, so one hash "
    "partitioning serves the build; the cohort-size side is cohort-count "
    "rows and broadcasts.  Counts stay exact integers — no float ratio on "
    "the contract surface, callers derive retention_pct = n_active / "
    "cohort_size themselves.  Week truncation is ISO-Monday on both "
    "engines; offsets divide exactly (both endpoints are week-truncated).",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_ts")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week_ts")
    ).distinct()
    sizes = first.groupBy("cohort_ts").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    off = (F.datediff("week_ts", "cohort_ts") / 7).cast("bigint")
    return (
        act.join(first, "user_id")
        .join(F.broadcast(sizes), "cohort_ts")
        .groupBy(
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_week"),
            off.alias("week_offset"),
            F.col("cohort_size"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select("cohort_week", "week_offset", "n_active", "cohort_size")
    )


@spec(
    """
    WITH t AS (
      SELECT event_type AS src_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst_type
      FROM events
    ),
    c AS (
      SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM t WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type
    ),
    s AS (
      SELECT src_type, CAST(SUM(n_transitions) AS BIGINT) AS src_total
      FROM c GROUP BY src_type
    )
    SELECT c.src_type, c.dst_type, n_transitions, src_total,
           CAST(n_transitions AS DOUBLE) / src_total AS p_transition
    FROM c JOIN s USING (src_type)
    """,
    doc="NEXT-EVENT TRANSITION MATRIX (first-order Markov path analysis) "
    "over per-user event streams: one lead() window keyed on user_id, one "
    "(src, dst) hash agg, and per-src totals DERIVED from the counted "
    "frame (|types|^2 rows — never a second event scan) joined back as a "
    "broadcast.  The product-analytics 'where do users go next' query and "
    "the input to Markov attribution.  p_transition is surfaced UNROUNDED: "
    "both engines divide the same exact integers, so the doubles are "
    "bit-equal (the text_sentiment_lexicon precedent).",
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).filter(F.col("dst_type").isNotNull())
    # materialize the |types|^2-row counted frame ONCE: the totals branch
    # would otherwise recompute the whole scan+window+agg subtree (broadcast
    # exchanges cannot reuse a shuffle exchange), doubling the event scan
    c = (
        t.groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .localCheckpoint(eager=True)
    )
    s = c.groupBy("src_type").agg(
        F.sum("n_transitions").cast("bigint").alias("src_total")
    )
    return c.join(F.broadcast(s), "src_type").select(
        "src_type",
        "dst_type",
        "n_transitions",
        "src_total",
        (F.col("n_transitions").cast("double") / F.col("src_total")).alias(
            "p_transition"
        ),
    )


@spec(
    f"""
    WITH attributed AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, '<direct>') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {sql_sum_money('CAST(value AS DECIMAL(12,2))', 'attributed_value')}
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY COALESCE(channel, '<direct>')
    """,
    doc="LAST-TOUCH REVENUE ATTRIBUTION: each purchase credits the user's "
    "most recent PRECEDING non-purchase event type (purchases with no "
    "prior touch attribute to '<direct>').  One user-keyed IGNORE-NULLS "
    "frame — the window_gap_fill forward-fill shape — then a per-channel "
    "aggregate; exact decimal value sums surfaced as deterministic "
    "doubles (the sum_money contract).  The marketing-analytics query a "
    "lake engine must express without an attribution service; first-touch "
    "and position-weighted variants swap the frame's aggregate only.",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("<direct>")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            sum_money(dec_money("value"), "attributed_value"),
        )
    )


@spec(
    """
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT days.d AS day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS active_7d
    FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
    doc="ROLLING 7-DAY DISTINCT ACTIVES per day (the WAU/MAU dashboard "
    "curve).  COUNT(DISTINCT) over a sliding RANGE frame is not a Spark "
    "window function, and the naive day x user-day range join is a near "
    "cartesian at scale — instead each distinct (user, day) row EXPLODES "
    "into the <= 7 observed days it contributes to (sequence + explode, "
    "map-side, constant fan-out), the observed-day grid broadcasts to "
    "prune padding days past the corpus horizon, and one count-distinct "
    "per day finishes.  Work is |user-days| * 7 narrow rows regardless of "
    "corpus size; the oracle states the same window as the declarative "
    "range join DuckDB can afford at oracle scale.",
)
def events_sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    contrib = ud.select(
        F.explode(F.expr("sequence(d, date_add(d, 6), interval 1 day)")).alias("day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_7d"))
    )


@spec(
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MIN} minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM g
    ),
    sess AS (SELECT user_id, sid, MIN(ts) AS a, MAX(ts) AS b
             FROM s GROUP BY user_id, sid),
    d AS (SELECT a AS t, 1 AS delta FROM sess
          UNION ALL SELECT b, -1 FROM sess),
    dd AS (SELECT CAST(t AS DATE) AS day, t, delta FROM d),
    tot AS (SELECT day, SUM(delta) AS dtot FROM dd GROUP BY day),
    carry AS (SELECT day, COALESCE(SUM(dtot) OVER (
                ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS c FROM tot),
    run AS (SELECT dd.day,
                   carry.c + SUM(delta) OVER (PARTITION BY dd.day
                     ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS r
            FROM dd JOIN carry USING (day))
    SELECT day, CAST(MAX(r) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY day
    """,
    doc="PEAK CONCURRENT SESSIONS per day by SWEEP LINE (difference "
    "array): each gaps-and-islands session contributes +1 at its start "
    "and -1 at its end (closed intervals: +1 sorts before -1 at equal "
    "timestamps), and the running sum of deltas IS the concurrency "
    "curve — the capacity-planning metric an interval x timeline join "
    "would need a near-cartesian to answer.  The scale trick: the "
    "running sum is NOT one global-order window (a single task at "
    "100 TB); deltas partition BY DAY for the intra-day sweep and the "
    "cross-day carry-in comes from a prefix sum over per-day TOTALS — a "
    "days-sized frame, broadcast back — the same two-phase prefix-sum "
    "shape as streaming/replay's partition offsets.  Per-day peaks are "
    "tie-order invariant (prefix maxima over a +1 run or a -1 run do "
    "not depend on the permutation), so the output is deterministic.",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    g = ev.withColumn("us", us).withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    sid = F.sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        g.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("a"), F.max("us").alias("b"))
    )
    # one explode instead of a self-union (r15): the union's two branches
    # each re-executed the whole sess lineage (scan -> two windows ->
    # group-agg, measured as 2 full passes in the plan); exploding a 2-row
    # array emits the same (+1 at start, -1 at end) delta rows in ONE pass
    # of sess at any scale.
    deltas = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("b").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("d")
    ).select("d.t", "d.delta")
    dd = deltas.withColumn("day", F.to_date(F.timestamp_micros(F.col("t"))))
    tot = dd.groupBy("day").agg(F.sum("delta").alias("dtot"))
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = tot.select(
        "day", F.coalesce(F.sum("dtot").over(wd), F.lit(0)).alias("c")
    )
    wrun = Window.partitionBy("day").orderBy(
        F.col("t"), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = dd.join(F.broadcast(carry), "day").withColumn(
        "r", F.col("c") + F.sum("delta").over(wrun)
    )
    return run.groupBy("day").agg(
        F.max("r").cast("bigint").alias("peak_concurrency")
    )


@spec(
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           first(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM events
    GROUP BY event_type, bucket
    """,
    doc="OHLC DOWNSAMPLING (the candlestick / hypertable first-last rollup): "
    "per (series, hour) open/high/low/close/count, where open and close "
    "are the first and last tick under the total (ts, event_id) order — "
    "min_by/max_by over a lexicographic struct key, so the whole resample "
    "is ONE map-side-combinable aggregation (no window, no sort): partial "
    "min/max/min_by/max_by merge associatively, making the shape exactly "
    "right at 100 TB.  Every output is a SELECTED input value, never "
    "arithmetic — zero float-parity surface.",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "bucket"
            ),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        )
    )


CUSUM_K = 60  # drift allowance (fixture mean value ~49.6 -> negative drift)
CUSUM_H = 400  # alarm threshold (~8 allowance units; 24 of 150 users alarm)


@spec(
    f"""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(value AS DECIMAL(12,2)) - CAST({CUSUM_K} AS DECIMAL(12,2))
               AS step
      FROM events
    ),
    p AS (
      SELECT user_id, ts, event_id,
             SUM(step) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pref
      FROM d
    ),
    s AS (
      SELECT user_id, ts, event_id,
             pref - LEAST(CAST(0 AS DECIMAL(12,2)),
                          COALESCE(MIN(pref) OVER (
                                     PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                                   CAST(0 AS DECIMAL(12,2)))) AS cusum
      FROM p
    ),
    a AS (
      SELECT user_id, ts, event_id, cusum,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM s WHERE cusum >= {CUSUM_H}
    )
    SELECT user_id, event_id AS alarm_event_id,
           epoch_us(ts) // 1000000 AS alarm_epoch_s,
           round(CAST(cusum AS DOUBLE), 6) AS cusum
    FROM a WHERE rn = 1
    """,
    doc="CUSUM CHANGE-POINT DETECTION (Page 1954) per event stream: the "
    f"one-sided upward cusum s_t = max(0, s_(t-1) + x_t - {CUSUM_K}) with "
    f"first alarm at s_t >= {CUSUM_H}.  The recurrence LOOKS inherently "
    "serial, but the classic prefix identity s_t = p_t - min(0, min_(i<t) "
    "p_i) with p_t = sum(x_i - k) turns it into ONE cumulative-sum window "
    "plus ONE running-min window over the same (user, ts) order — a "
    "single exchange, no iteration, no UDF — so change-point detection "
    "over billions of independent streams is two window passes at 100 TB.  "
    "All arithmetic is exact DECIMAL(12,2); the final alarm score is "
    "surfaced as round(double, 6) — the wide-decimal-to-double cast is "
    "one ulp apart across engines (DuckDB multiplies hugeint decimals by "
    "10^-s; Java rounds correctly) and round(6) absorbs it — and the "
    "alarm instant as integer epoch seconds (the timestamp-precision "
    "contract).",
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    order = [F.asc("ts"), F.asc("event_id")]
    w_all = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    zero = F.lit(0).cast("decimal(12,2)")
    step = dec_money("value") - F.lit(CUSUM_K).cast("decimal(12,2)")
    # two stacked passes over ONE (user, ts) ordering: window functions
    # cannot nest, so pref materializes as a column between them — Catalyst
    # fuses both Window nodes onto a single exchange+sort
    p = ev.select("user_id", "ts", "event_id", F.sum(step).over(w_all).alias("pref"))
    cusum = F.col("pref") - F.least(
        zero, F.coalesce(F.min("pref").over(w_prev), zero)
    )
    alarms = p.withColumn("cusum", cusum).filter(F.col("cusum") >= CUSUM_H)
    w_first = Window.partitionBy("user_id").orderBy(*order)
    return (
        alarms.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("alarm_event_id"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias(
                "alarm_epoch_s"
            ),
            F.round(F.col("cusum").cast("double"), 6).alias("cusum"),
        )
    )


TRIGRAM_TOP = 20  # most frequent 3-step journeys reported


@spec(
    f"""
    WITH t AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    c AS (
      SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM t WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, n_paths,
           CAST(ROW_NUMBER() OVER (ORDER BY n_paths DESC, e1, e2, e3)
                AS BIGINT) AS rank
    FROM c QUALIFY rank <= {TRIGRAM_TOP}
    """,
    doc="TOP EVENT-PATH TRIGRAMS (behavioral path analysis — the 3-step "
    "extension of the D14 transition matrix, enough context to separate "
    "view->click->purchase from view->click->error): two LEAD() "
    "offsets over ONE per-user (ts, event_id) window pass, then a "
    "|types|^3-bounded hash count and the deterministic top-"
    f"{TRIGRAM_TOP}.  The final rank orders the COUNTED frame (at most "
    "|types|^3 rows however large the event log), so the global window "
    "is constant-size — the only full-data work is one fused window + "
    "one map-side-combined agg.  Exact integers end to end.",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    c = t.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    wr = Window.orderBy(F.desc("n_paths"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
    return (
        c.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= TRIGRAM_TOP)
    )


EWMA_ALPHA = 0.25  # smoothing factor (exactly representable in binary)
EWMA_SPAN = 16  # truncated lookback (error bound (1-alpha)^16 ~ 1e-2 of x_0)


@spec(
    f"""
    WITH l AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING
                               AND CURRENT ROW) AS w
      FROM events
    )
    SELECT user_id, event_id,
           list_reduce(w, (s, x) -> CAST({EWMA_ALPHA} AS DOUBLE)*x
                                    + CAST({1 - EWMA_ALPHA} AS DOUBLE)*s)
             AS ewma
    FROM l
    """,
    doc="EWMA SMOOTHING (exponentially weighted moving average, the "
    "monitoring/trading-pipeline staple): s_t = a*x_t + (1-a)*s_(t-1), "
    f"truncated to the last {EWMA_SPAN} observations — the older terms' "
    f"weight is bounded by (1-a)^{EWMA_SPAN} ≈ 1% and truncation is what "
    "makes the recurrence a WINDOW FRAME instead of an unbounded serial "
    "scan: collect the frame's values (deterministic frame order) and "
    "fold them left-to-right with the literal recurrence.  Both engines "
    "run the IDENTICAL strict left fold (Spark aggregate() over the "
    "tail seeded by the head = DuckDB list_reduce), so every "
    "intermediate IEEE operation matches and the result is surfaced "
    "UNROUNDED (bit-exact; round(6) is what diverges — the "
    f"window_distribution half-repr lesson).  a = {EWMA_ALPHA} is "
    "exactly representable in binary.  One exchange; the CUSUM twin "
    "covers the exact-decimal unbounded case.",
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    fold = F.aggregate(
        F.slice(F.col("w"), F.lit(2), F.size("w") - 1),
        F.element_at(F.col("w"), 1),
        lambda s, x: F.lit(EWMA_ALPHA) * x + F.lit(1 - EWMA_ALPHA) * s,
    )
    return (
        ev.select("user_id", "event_id", arr.alias("w"))
        .select("user_id", "event_id", fold.alias("ewma"))
    )


AB_Z_CRIT = 1.96  # two-sided 95% critical value
AB_SPEND_T = 600  # high-spender threshold (~50% conversion at every SF)


@spec(
    f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(12,2))
                               ELSE CAST(0 AS DECIMAL(12,2)) END)
                       > {AB_SPEND_T}
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT (strpos('0123456789abcdef',
                     substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS arm,
             conv
      FROM u
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_b
      FROM a
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / n_a AS rate_a,
           CAST(conv_b AS DOUBLE) / n_b AS rate_b,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN NULL
                ELSE round((CAST(conv_a AS DOUBLE) / n_a
                            - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) END AS z_score,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN NULL
                ELSE abs(round((CAST(conv_a AS DOUBLE) / n_a
                                - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6)) > {AB_Z_CRIT} END
             AS significant
    FROM s
    """,
    doc="EXPERIMENT SIGNIFICANCE READOUT (two-proportion pooled z-test, the "
    "A/B-testing staple): users are hash-assigned to two arms by the "
    "split-family md5 seed (here an A/A test over the same population — "
    "the null calibration every experimentation platform runs; a real "
    "experiment swaps in its assignment column), conversion = exact-"
    f"decimal purchase spend above {AB_SPEND_T} (~50% base rate at every "
    "fixture SF — an always-true metric would make the test vacuous), "
    "and the pooled z-statistic with a two-sided 95% verdict "
    "comes out of EXACT integer counts: one user-level agg (map-side "
    "combinable), one 4-counter arm rollup, and a single identical IEEE "
    "expression tree (divisions, one correctly-rounded sqrt) over those "
    "ints — round(6) on z absorbs nothing today but guards the contract "
    "surface.  Scale: two aggregation passes, 1 row out, no window, no "
    "join — the same shape at any event-log size.",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exprs import md5_hex_val

    ev = load(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(12,2)")
    spend = F.sum(
        F.when(F.col("event_type") == "purchase", dec_money("value")).otherwise(zero)
    )
    u = ev.groupBy("user_id").agg(
        F.when(spend > AB_SPEND_T, 1).otherwise(0).alias("conv")
    )
    arm = md5_hex_val(F.col("user_id").cast("string"), 1) % 2
    a = u.select(arm.alias("arm"), "conv")
    s = a.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    # degenerate guard (all-or-none conversion, e.g. the sf0.001 fixture):
    # pooled*(1-pooled) = 0 zeroes the denominator — ANSI Spark raises,
    # DuckDB yields NaN — so both engines surface NULL identically, and
    # the lazily-evaluated CASE keeps ANSI from ever running the division
    degenerate = (
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b"))
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        F.when(degenerate, F.lit(None)).otherwise(F.round(z, 6)).alias("z_score"),
        # verdict thresholds the ROUNDED z (the ml_linear_score precedent):
        # a |z| within an ulp of the critical value must not flip across
        # engines while the rounded score is the stable contract surface
        F.when(degenerate, F.lit(None).cast("boolean"))
        .otherwise(F.abs(F.round(z, 6)) > AB_Z_CRIT)
        .alias("significant"),
    )


@spec(
    """
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS first_view_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_purchase_us
      FROM events GROUP BY user_id
    )
    SELECT CAST((first_purchase_us - first_view_us) // 3600000000 AS BIGINT)
             AS lag_hours,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u
    WHERE first_view_us IS NOT NULL AND first_purchase_us IS NOT NULL
      AND first_purchase_us >= first_view_us
    GROUP BY 1
    """,
    doc="CONVERSION-LAG HISTOGRAM (time-to-convert, the funnel-latency "
    "readout): per user, first view to first purchase, bucketed into "
    "whole hours — exact integer epoch-microsecond MINs inside one "
    "conditional aggregation (map-side combinable; no window, no join, "
    "no self-scan per stage unlike the funnel's per-stage form), then a "
    "constant-size histogram agg.  Users who never viewed, never "
    "purchased, or purchased before ever viewing are excluded by the "
    "same integer predicate on both engines.  Floor division on "
    "positive integers is identical in Spark DIV and DuckDB //.  At "
    "100 TB this is two aggregation passes whose first is keyed on the "
    "natural user partitioning.",
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("fp"),
    )
    return (
        u.filter(
            F.col("fv").isNotNull()
            & F.col("fp").isNotNull()
            & (F.col("fp") >= F.col("fv"))
        )
        .groupBy(F.expr("CAST((fp - fv) DIV 3600000000 AS BIGINT)").alias("lag_hours"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


QUERIES: dict[str, QuerySpec] = {
    "events_path_trigrams": events_path_trigrams,
    "events_conversion_lag": events_conversion_lag,
    "events_ab_test": events_ab_test,
    "ts_ewma_smooth": ts_ewma_smooth,
    "ts_cusum_changepoint": ts_cusum_changepoint,
    "events_sliding_active_users": events_sliding_active_users,
    "events_peak_concurrency": events_peak_concurrency,
    "ts_resample_ohlc": ts_resample_ohlc,
    "events_retention_cohorts": events_retention_cohorts,
    "events_transitions": events_transitions,
    "events_attribution": events_attribution,
    "window_rank": window_rank,
    "ts_interpolate_linear": ts_interpolate_linear,
    "window_distribution": window_distribution,
    "window_lag_lead": window_lag_lead,
    "window_running": window_running,
    "window_range_frame": window_range_frame,
    "window_topk_per_group": window_topk_per_group,
    "window_gap_fill": window_gap_fill,
    "window_sessionize": window_sessionize,
    "events_funnel": events_funnel,
}
