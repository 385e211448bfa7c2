"""Relational core: scans, filters, aggregates, sorts, limits, set ops and
scalar-function coverage (SURVEY.md §2.1 S8, §2.2 P6, §2.4 A1-A9, §2.6 O1-O6,
§2.7).

Everything here is built-in Catalyst-optimized DataFrame API — filters and
projections push down to the parquet scan, aggregations run partial+final
(map-side combine), sorts are range-partitioned.  At 100 TB nothing changes:
the same plans scale because no operator collects to the driver and every
shuffle is keyed by the grouping/sort columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caches import register_cache
from ..catalog import load, parallelize_small_scan
from ..functions.exprs import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    avg_money,
    charge,
    dec_money,
    dec_rate,
    disc_price,
    sql_avg_money,
    sql_sum_money,
    sum_money,
)
from ..registry import QuerySpec, spec

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape).  SURVEY §7 M0.
# ---------------------------------------------------------------------------


@spec(
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_sum_money('CAST(l_quantity AS DECIMAL(12,2))', 'sum_qty')},
           {sql_sum_money('CAST(l_extendedprice AS DECIMAL(12,2))', 'sum_base_price')},
           {sql_sum_money(SQL_DISC_PRICE, 'sum_disc_price')},
           {sql_sum_money(SQL_CHARGE, 'sum_charge')},
           {sql_avg_money('CAST(l_quantity AS DECIMAL(12,2))', 'avg_qty')},
           {sql_avg_money('CAST(l_extendedprice AS DECIMAL(12,2))', 'avg_price')},
           {sql_avg_money('CAST(l_discount AS DECIMAL(5,2))', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary over lineitem (scan S8, filter P6, hash agg A2, sort O1).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_money(dec_money("l_quantity"), "sum_qty"),
            sum_money(dec_money("l_extendedprice"), "sum_base_price"),
            sum_money(disc_price(), "sum_disc_price"),
            sum_money(charge(), "sum_charge"),
            avg_money(dec_money("l_quantity"), "avg_qty"),
            avg_money(dec_money("l_extendedprice"), "avg_price"),
            avg_money(dec_rate("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@spec(
    f"""
    SELECT l_orderkey,
           {sql_sum_money(SQL_DISC_PRICE, 'revenue')},
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate  > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Shipping-priority top-k (joins J1, agg A2, top-k O3).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("date")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_money(disc_price(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@spec(
    f"""
    SELECT n_name, {sql_sum_money(SQL_DISC_PRICE, 'revenue')}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="Local-supplier volume: 6-way join with broadcast dims (J1/J2, A2).",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(sum_money(disc_price(), "revenue"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# P6 / O1-O6: filters, sorts, limits, set ops
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    """,
    doc="P6 predicate filter; pushes to parquet scan (PushedFilters).",
)
def filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@spec(
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 100 OFFSET 500
    """,
    doc="O2 limit/offset with deterministic order (reference pagination S2 analogue).",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(500)
        .limit(100)
    )


@spec(
    """
    SELECT o_orderkey, o_totalprice, o_custkey FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="O3 top-k: Spark plans TakeOrderedAndProject (no full sort).",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@spec(
    """
    SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey
    """,
    doc="O1 global sort (range-partitioned exchange).",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    )


@spec(
    """
    SELECT k, src FROM (
      SELECT o_custkey AS k, 'orders' AS src FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT c_custkey AS k, 'customer' AS src FROM customer WHERE c_acctbal < 0
    )
    """,
    doc="O4 union all.",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("k"), F.lit("orders").alias("src"))
    )
    b = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"), F.lit("customer").alias("src"))
    )
    return a.unionByName(b)


@spec(
    """
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
    doc="O5 intersect.",
)
def intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@spec(
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
    doc="O5 except: customers with no orders.",
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    # subtract() IS SQL EXCEPT (distinct set difference); exceptAll().distinct()
    # differs whenever a value occurs more on the left than the right
    # (round-1 advice — the fixture's unique keys masked it).
    return a.subtract(b)


@spec(
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="O6 distinct (dropDuplicates on the key set compares deterministically).",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# A1-A9 aggregations
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem
    """,
    doc="A1 global count + A4 count distinct (reference's running row counts, "
    "pyrfc_read_table.py:119-122, as a distributed agg).",
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@spec(
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           {sql_sum_money('CAST(o_totalprice AS DECIMAL(12,2))', 'total')},
           {sql_avg_money('CAST(o_totalprice AS DECIMAL(12,2))', 'avg_price')},
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="A2 hash aggregate with partial+final phases (HashAggregateExec).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_money(dec_money("o_totalprice"), "total"),
            avg_money(dec_money("o_totalprice"), "avg_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


@spec(
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A4 grouped distinct aggregates (expand + two-phase agg).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
        )
        .orderBy("l_returnflag")
    )


APPROX_ND_TOL = 0.05  # HLL++ rsd=0.02 -> 5% is a ~2.5-sigma bound


@spec(
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supp,
           TRUE AS supp_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="A5 approx_count_distinct (HLL++), GROUPED tolerance form (the r8 "
    "verdict's retirement of the last rows-only A5 entry): per-returnflag "
    "exact distinct-supplier count plus a boolean asserting the grouped "
    "HLL++ estimate (rsd=0.02) lands within APPROX_ND_TOL of it.  The "
    "estimate itself has no SQL twin, but its accuracy CONTRACT does — the "
    "oracle expects TRUE per group, so a drifting estimate turns the "
    "driver row red (the agg_approx_distinct_error / D12 contract, applied "
    "per group; the global two-column form remains the _error anchor).  "
    "HLL++ is hash-seeded and deterministic per dataset, so the booleans "
    "are fixture-stable, verified TRUE at sf0.001/0.01/0.1.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("exact_supp"),
            F.approx_count_distinct("l_suppkey", 0.02).alias("__as"),
        )
    )
    within = (
        F.abs(F.col("__as") - F.col("exact_supp"))
        / F.col("exact_supp").cast("double")
        <= APPROX_ND_TOL
    )
    return g.select("l_returnflag", "exact_supp", within.alias("supp_within_tol"))


@spec(
    f"""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_within_tol,
           TRUE AS parts_within_tol
    FROM lineitem
    """,
    doc="A5 tolerance anchor, global two-column form: exact "
    "distinct counts plus booleans asserting the HLL++ estimates land within "
    f"{APPROX_ND_TOL:.0%} of them.  The sketch itself has no SQL twin, but "
    "its accuracy CONTRACT does — the oracle expects TRUE, so an HLL "
    "estimate drifting out of tolerance turns the driver row red.  "
    "Complements agg_approx_distinct (since r9 the grouped tolerance form) "
    "and the rsd-tolerance test in tests/test_approx_tolerance.py.",
)
def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # three independent single-pass aggs cross-joined (1-row frames): two
    # exact DISTINCTs in ONE agg would plan an Expand that triplicates every
    # input row; split, each is a plain 2-phase distinct over one pruned
    # column and the HLLs stay sketch-side (measured 4.9s -> ~2s at sf0.1)
    e1 = li.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    e2 = li.agg(F.countDistinct("l_partkey").alias("exact_parts"))
    ap = li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("__ao"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__ap"),
    )
    agg = e1.crossJoin(e2).crossJoin(ap)
    def within(approx: str, exact: str) -> Column:
        err = F.abs(F.col(approx) - F.col(exact)) / F.col(exact)
        return err <= APPROX_ND_TOL

    return agg.select(
        "exact_orders",
        "exact_parts",
        within("__ao", "exact_orders").alias("orders_within_tol"),
        within("__ap", "exact_parts").alias("parts_within_tol"),
    )


HLL_TOL = 0.05  # default lgConfigK=12 -> ~1.6% std error; 5% is > 3 sigma


@spec(
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS union_within_tol
    FROM events GROUP BY event_type
    """,
    doc="MERGEABLE DISTINCT-COUNT SKETCHES (Datasketches HLL, Spark 3.5+ "
    "hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-key "
    "cardinality built as PER-SHARD sketches first, then unioned — the "
    "100 TB pattern where each ingest shard or day-partition materializes "
    "a fixed-size sketch and the serving layer merges thousands of them "
    "without rescanning rows (what approx_count_distinct cannot do: its "
    "sketch state is not a first-class mergeable value).  Cross-engine "
    "contract follows agg_approx_distinct_error: the estimate itself is "
    "engine-specific, so the surfaced columns are the exact count plus a "
    "boolean asserting the unioned estimate lands within tolerance, which "
    "the oracle states as TRUE.",
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    shard = F.pmod(F.col("user_id"), F.lit(8)).alias("__shard")
    sketches = ev.groupBy("event_type", shard).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    unioned = sketches.groupBy("event_type").agg(
        F.hll_union_agg("sk").alias("sk")
    )
    est = unioned.select(
        "event_type", F.hll_sketch_estimate("sk").alias("__est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    err = (
        F.abs(F.col("__est") - F.col("exact_users"))
        / F.col("exact_users").cast("double")
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_users",
            (err <= HLL_TOL).alias("union_within_tol"),
        )
    )


KLL_TOL = 0.05  # k=200 -> ~1.65% rank error; value tol 5% on a dense range

# bounded per-(session, sf_dir) caches for the rollup-merge sketch fact
# tables (dedup._cached_persisted is the one shared memoizer implementation)
_HLL_CELL_CACHE: dict = register_cache({})
_KLL_CELL_CACHE: dict = register_cache({})


def _kll_merge_fold() -> Column:
    """Pairwise KLL merge over a collected (bounded, one-per-child-cell)
    sketch list — kll_sketch_merge_double is a scalar pair merge, so the
    fold is the per-group reduction.  ONE definition for both KLL queries
    so the merge semantics cannot drift between them."""
    return F.expr(
        "reduce(slice(sks, 2, size(sks)), sks[0],"
        " (acc, x) -> kll_sketch_merge_double(acc, x))"
    )


@spec(
    """
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6)
             AS exact_p50,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 6)
             AS exact_p90,
           TRUE AS p50_within_tol,
           TRUE AS p90_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="MERGEABLE QUANTILE SKETCHES (Datasketches KLL, Spark 4 "
    "kll_sketch_agg_double / kll_sketch_merge_double / get_quantile): "
    "per-shard sketches built under (flag, shard), merged per flag, then "
    "queried for p50/p90 — the mergeable-quantile pattern percentile_approx "
    "cannot express (its digest is not a first-class value), and the shape "
    "a 100 TB pipeline needs: day-partition sketches merge in milliseconds "
    "instead of re-sorting the history.  Contract per the approx family: "
    "exact quantiles surfaced, estimates checked within tolerance, oracle "
    "states TRUE.",
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    shard = F.pmod(F.col("l_orderkey"), F.lit(8)).alias("__shard")
    sketches = li.groupBy("l_returnflag", shard).agg(
        F.expr("kll_sketch_agg_double(CAST(l_extendedprice AS DOUBLE))").alias("sk")
    )
    # kll_sketch_merge_double is a pairwise scalar: fold the (bounded, one
    # per shard) sketch list per flag — 8 fixed-size buffers, never rows
    merged = sketches.groupBy("l_returnflag").agg(
        F.collect_list("sk").alias("sks")
    ).select("l_returnflag", _kll_merge_fold().alias("sk"))
    est = merged.select(
        "l_returnflag",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("__e50"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.9)").alias("__e90"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.round(F.percentile(price, F.lit(0.5)), 6).alias("exact_p50"),
        F.round(F.percentile(price, F.lit(0.9)), 6).alias("exact_p90"),
    )

    def within(e: str, x: str) -> Column:
        return F.abs(F.col(e) - F.col(x)) / F.col(x) <= KLL_TOL

    return exact.join(est, "l_returnflag").select(
        "l_returnflag",
        "exact_p50",
        "exact_p90",
        within("__e50", "exact_p50").alias("p50_within_tol"),
        within("__e90", "exact_p90").alias("p90_within_tol"),
    )


THETA_TOL = 0.05  # fixture sets are < k=4096, so the sketches run exact


@spec(
    """
    WITH u AS (
      SELECT user_id,
             MAX(event_type = 'view') AS has_view,
             MAX(event_type = 'purchase') AS has_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(CASE WHEN has_view OR has_purchase THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_union,
           CAST(SUM(CASE WHEN has_view AND has_purchase THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_inter,
           TRUE AS union_within_tol,
           TRUE AS inter_within_tol
    FROM u
    """,
    doc="DISTINCT-COUNT SET ALGEBRA ON SKETCHES (Datasketches Theta, Spark "
    "4 theta_sketch_agg / theta_union / theta_intersection): viewers and "
    "purchasers sketched independently, then |A∪B| AND |A∩B| estimated "
    "from the two sketches alone — the audience-overlap question HLL "
    "cannot answer (HLL unions but never intersects).  At 100 TB each "
    "segment keeps one theta sketch and arbitrary segment intersections "
    "cost sketch-sized work.  Same error-anchor contract as the HLL row; "
    "below k=4096 entries the sketches are in exact mode, so the fixture "
    "estimates equal the exact counts.",
)
def agg_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)"
        ).alias("sv"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)"
        ).alias("sp"),
    )
    est = sk.select(
        F.expr("theta_sketch_estimate(theta_union(sv, sp))").alias("__eu"),
        F.expr("theta_sketch_estimate(theta_intersection(sv, sp))").alias("__ei"),
    )
    flags = ev.groupBy("user_id").agg(
        F.max(F.col("event_type") == "view").alias("hv"),
        F.max(F.col("event_type") == "purchase").alias("hp"),
    )
    exact = flags.agg(
        F.sum((F.col("hv") | F.col("hp")).cast("bigint")).alias("exact_union"),
        F.sum((F.col("hv") & F.col("hp")).cast("bigint")).alias("exact_inter"),
    )

    def within(e: str, x: str) -> Column:
        # empty-set guard: a zero exact count would make the relative error
        # NaN and flip the boolean against the oracle's TRUE even when the
        # estimate is itself exactly zero
        rel = F.abs(F.col(e) - F.col(x)) / F.col(x).cast("double")
        return F.when(F.col(x) == 0, F.col(e) == 0).otherwise(rel <= THETA_TOL)

    return exact.crossJoin(est).select(
        "exact_union",
        "exact_inter",
        within("__eu", "exact_union").alias("union_within_tol"),
        within("__ei", "exact_inter").alias("inter_within_tol"),
    )


@spec(
    """
    SELECT event_type, day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
          FROM events)
    GROUP BY ROLLUP (event_type, day)
    """,
    doc="SKETCH PARTIAL-MERGE ACROSS ROLLUP LEVELS (the D12 sketches "
    "promoted to grouping-sets duty): ONE scan of events materializes the "
    "per-(event_type, day) HLL sketch table, and BOTH super-aggregate "
    "levels — per-type and grand-total distinct users — are derived by "
    "hll_union_agg over that persisted sketch frame, never by re-scanning "
    "rows.  This is the daily -> weekly -> total rollup a 100 TB serving "
    "layer runs: day-partition sketches are the stored fact, and every "
    "coarser cube cell costs a union of fixed 4 KB buffers (exact "
    "COUNT(DISTINCT) cannot do this — distinct counts do not add across "
    "cells).  The exact side IS computable in one extra scan via "
    "rollup()'s Expand, which anchors the estimates; contract per the A5 "
    "family: exact count + within-tolerance boolean, oracle states TRUE.  "
    "Plan-locked to exactly two scans of events (tests/test_plans.py) — "
    "a naive per-level re-aggregation would pay four.",
)
def agg_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _cached_persisted

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    # the stored fact: one sketch per (type, day) cell, persisted through
    # the shared bounded memoizer (repeated builder invocations in one
    # session — parity + dtype + plan tests, the bench — must reuse ONE
    # frame, not pin a fresh one each call) so all rollup levels merge
    # THIS frame instead of re-reading events
    base = _cached_persisted(
        _HLL_CELL_CACHE,
        spark,
        sf_dir,
        lambda: ev.groupBy("event_type", "day").agg(
            F.hll_sketch_agg("user_id").alias("sk")
        ),
    )
    nul = F.lit(None).cast("string")
    # each estimate row carries its rollup level as the grouping_id it will
    # match on the exact side (2-col rollup: cell=0, per-type=1, grand=3) —
    # null-safe key equality ALONE would let a genuine NULL event_type/day
    # in the data collide with rollup super-aggregate NULL keys and
    # double-match (ADVICE r8 item 2)
    lvl2 = base.select(
        "event_type", "day", "sk", F.lit(0).cast("bigint").alias("__gid")
    )
    lvl1 = (
        base.groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            "event_type", nul.alias("day"), "sk",
            F.lit(1).cast("bigint").alias("__gid"),
        )
    )
    lvl0 = base.groupBy().agg(F.hll_union_agg("sk").alias("sk")).select(
        nul.alias("event_type"), nul.alias("day"), "sk",
        F.lit(3).cast("bigint").alias("__gid"),
    )
    est = (
        lvl2.unionByName(lvl1)
        .unionByName(lvl0)
        .select(
            "event_type", "day", "__gid",
            F.hll_sketch_estimate("sk").alias("__est"),
        )
    )
    exact = ev.rollup("event_type", "day").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.grouping_id().alias("__gid"),
    )
    # ~(types*days + types + 1) rows on each side; broadcast the estimate
    # frame, join NULL-SAFE on keys + EXACT on grouping level
    cond = F.expr(
        "x.event_type <=> e.event_type AND x.day <=> e.day"
        " AND x.__gid = e.__gid"
    )
    return (
        exact.alias("x")
        .join(F.broadcast(est.alias("e")), cond)
        .select(
            F.col("x.event_type").alias("event_type"),
            F.col("x.day").alias("day"),
            "exact_users",
            (
                F.abs(F.col("__est") - F.col("exact_users"))
                / F.col("exact_users").cast("double")
                <= HLL_TOL
            ).alias("within_tol"),
        )
    )


@spec(
    """
    SELECT l_returnflag, l_linestatus,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6)
             AS exact_p50,
           TRUE AS p50_within_tol
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="QUANTILE-SKETCH PARTIAL-MERGE ACROSS ROLLUP LEVELS — the KLL twin "
    "of agg_hll_rollup_merge: one scan builds the per-(returnflag, "
    "linestatus) KLL sketch table; the per-flag and grand-total medians "
    "are then answered by kll_sketch_merge_double folds over that "
    "persisted frame (bounded sketch lists — one per child cell — merged "
    "pairwise, fixed-size buffers throughout).  Exact quantiles are the "
    "one aggregate that NEVER rolls up from exact per-cell results (a "
    "median of medians is not the median), which is precisely why the "
    "mergeable-sketch fact table is the 100 TB layout.  Exact anchor via "
    "rollup()+percentile in a second scan; A5-family contract (exact "
    "value + tolerance boolean, oracle TRUE); plan-locked to two lineitem "
    "scans.",
)
def agg_kll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _cached_persisted

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    price = F.col("l_extendedprice").cast("double")
    base = _cached_persisted(
        _KLL_CELL_CACHE,
        spark,
        sf_dir,
        lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
            F.expr(
                "kll_sketch_agg_double(CAST(l_extendedprice AS DOUBLE))"
            ).alias("sk")
        ),
    )
    merge_fold = _kll_merge_fold().alias("sk")
    nul = F.lit(None).cast("string")
    # grouping-level marker per estimate row, matched against the exact
    # rollup's grouping_id() — see agg_hll_rollup_merge (ADVICE r8 item 2)
    lvl2 = base.select(
        "l_returnflag", "l_linestatus", "sk",
        F.lit(0).cast("bigint").alias("__gid"),
    )
    lvl1 = (
        base.groupBy("l_returnflag")
        .agg(F.collect_list("sk").alias("sks"))
        .select(
            "l_returnflag", nul.alias("l_linestatus"), merge_fold,
            F.lit(1).cast("bigint").alias("__gid"),
        )
    )
    lvl0 = (
        base.groupBy()
        .agg(F.collect_list("sk").alias("sks"))
        .select(
            nul.alias("l_returnflag"), nul.alias("l_linestatus"), merge_fold,
            F.lit(3).cast("bigint").alias("__gid"),
        )
    )
    est = (
        lvl2.unionByName(lvl1)
        .unionByName(lvl0)
        .select(
            "l_returnflag",
            "l_linestatus",
            "__gid",
            F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("__e50"),
        )
    )
    exact = li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.percentile(price, F.lit(0.5)), 6).alias("exact_p50"),
        F.grouping_id().alias("__gid"),
    )
    cond = F.expr(
        "x.l_returnflag <=> e.l_returnflag AND x.l_linestatus <=> e.l_linestatus"
        " AND x.__gid = e.__gid"
    )
    return (
        exact.alias("x")
        .join(F.broadcast(est.alias("e")), cond)
        .select(
            F.col("x.l_returnflag").alias("l_returnflag"),
            F.col("x.l_linestatus").alias("l_linestatus"),
            "exact_p50",
            (
                F.abs(F.col("__e50") - F.col("exact_p50")) / F.col("exact_p50")
                <= KLL_TOL
            ).alias("p50_within_tol"),
        )
    )


APPROX_PCT_TOL = 0.05  # relative tolerance for approx_percentile at accuracy 10k


@spec(
    f"""
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS exact_p50,
           TRUE AS p50_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="A5+ approx_percentile tolerance anchor (the agg_approx_distinct_"
    "error pattern applied to the quantile sketch): exact per-group medians "
    "plus a boolean asserting Spark's approx_percentile (accuracy 10000) "
    f"lands within {APPROX_PCT_TOL:.0%} relative.  The KLL-style sketch has "
    "no SQL twin; its accuracy contract does — oracle expects TRUE, so "
    "sketch drift turns the driver row red.",
)
def agg_approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.percentile(price, F.lit(0.5)), 6).alias("exact_p50"),
        F.percentile_approx(price, F.lit(0.5), F.lit(10000)).alias("__approx"),
    )
    err = F.abs(F.col("__approx") - F.col("exact_p50")) / F.col("exact_p50")
    return agg.select(
        "l_returnflag", "exact_p50", (err <= APPROX_PCT_TOL).alias("p50_within_tol")
    )


@spec(
    """
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS k_and,
           l_orderkey | 15 AS k_or,
           xor(l_orderkey, l_partkey) AS k_xor,
           l_orderkey << 2 AS k_shl,
           l_orderkey >> 3 AS k_shr,
           CAST(bit_count(l_orderkey) AS INTEGER) AS k_bits
    FROM lineitem
    """,
    doc="§2.7 bitwise functions (and/or/xor/shifts/popcount) — the integer "
    "surface bucketing, sharding and bitmap-index expressions rely on.  "
    "Keys are non-negative so arithmetic vs logical right-shift agree.",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & 255").alias("k_and"),
        F.expr("l_orderkey | 15").alias("k_or"),
        F.expr("l_orderkey ^ l_partkey").alias("k_xor"),
        F.shiftleft(F.col("l_orderkey"), 2).alias("k_shl"),
        F.shiftright(F.col("l_orderkey"), 3).alias("k_shr"),
        F.bit_count("l_orderkey").cast("int").alias("k_bits"),
    )


@spec(
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
    doc="A6 rollup (grouping sets).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_money(dec_money("l_quantity"), "qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "qty",
        )
        .orderBy("rf", "ls")
    )


@spec(
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS st,
           COALESCE(o_orderpriority, 'ALL') AS pri,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY st, pri
    """,
    doc="A6 cube.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            "n",
        )
        .orderBy("st", "pri")
    )


@spec(
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS st,
           COALESCE(o_orderpriority, 'ALL') AS pri,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY st, pri
    """,
    doc="A6 explicit GROUPING SETS (neither rollup nor cube): per-status and "
    "per-priority totals in ONE pass over the fact table via Spark 4's "
    "DataFrame groupingSets — Expand duplicates each row once per set before "
    "the single hash aggregation, replacing two scans with one.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_money(dec_money("o_totalprice"), "total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            "n",
            "total",
        )
        .orderBy("st", "pri")
    )


@spec(
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_high_disc,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F')
                AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A7 filtered aggregates (sum(when(cond, x)) form).",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_disc"),
            F.sum(F.when(F.col("l_linestatus") == "F", dec_money("l_quantity")))
            .cast("double")
            .alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


@spec(
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    doc="A8 collect_list surfaced as a sorted joined string (order-stable compare).",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


@spec(
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A9 statistical aggregates (rounded: FP accumulation order differs by engine).",
)
def agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# §2.7 scalar-function coverage
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT p_partkey,
           upper(p_name) AS name_up,
           lower(p_brand) AS brand_lo,
           substring(p_type, 1, 3) AS type3,
           length(p_name) AS name_len,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, ' ', '_', 'g') AS name_us,
           (p_name LIKE '%red%') AS has_red,
           instr(p_name, 'e') AS first_e,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad
    FROM part
    """,
    doc="§2.7 string functions (lpad mirrors DDIC zero-padded N keys).",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_us"),
        F.col("p_name").like("%red%").alias("has_red"),
        F.instr(F.col("p_name"), "e").alias("first_e"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_pad"),
    )


@spec(
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_99,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
    doc="§2.7 date/time functions (DDIC D handling is in the ingest module).",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_99"
        ),
        F.add_months(F.col("o_orderdate"), 3).alias("plus3m"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@spec(
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS q_ceil,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS q_floor,
           CAST(pow(2, l_linenumber) AS DOUBLE) AS pow2,
           ((l_orderkey % 7) + 7) % 7 AS key_mod7
    FROM lineitem
    """,
    doc="§2.7 math functions (pmod expressed portably; rand excluded — nondeterministic).",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("q_ceil"),
        F.floor(F.col("l_quantity") / 7.0).alias("q_floor"),
        F.pow(F.lit(2), F.col("l_linenumber")).alias("pow2"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
    )


@spec(
    """
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           w[1] AS first_word,
           array_to_string(list_slice(w, 1, 3), ' ') AS first3,
           array_to_string(list_sort(w), ' ') AS sorted_words,
           array_to_string(list_transform(list_slice(w, 1, 5), x -> upper(x)), ' ')
             AS first5_up,
           len(list_filter(w, x -> length(x) > 4)) AS n_long,
           CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len
    FROM ws
    """,
    doc="§2.7 array functions: split/size/element_at/slice/sort/transform/filter/aggregate.",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.element_at(w, 1).alias("first_word"),
        F.array_join(F.slice(w, 1, 3), " ").alias("first3"),
        F.array_join(F.array_sort(w), " ").alias("sorted_words"),
        F.array_join(F.transform(F.slice(w, 1, 5), lambda x: F.upper(x)), " ").alias("first5_up"),
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)).alias("sum_len"),
    )


@spec(
    """
    SELECT p_partkey, p_brand AS brand_val, p_type AS type_val, 2 AS n_keys
    FROM part
    """,
    doc="§2.7 map functions: build a map, read keys/values back out "
    "(oracle states the expected output, not the map plumbing).",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@spec(
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(props->>'k' AS INTEGER) AS k_int
    FROM events
    """,
    doc="§2.7 json functions on events.props (get_json_object / from_json).",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
    )


@spec(
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_word,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS pri,
           greatest(o_totalprice, 100000.0) AS at_least_100k,
           least(o_totalprice, 100000.0) AS at_most_100k
    FROM orders
    """,
    doc="§2.7 conditionals: when/otherwise, coalesce, nullif, greatest, least.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unspecified")).alias(
            "pri"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("at_most_100k"),
    )


# ---------------------------------------------------------------------------
# Subqueries, SQL entry path, pivot (Catalyst decorrelation + parser surface).
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Correlated EXISTS subquery via the spark.sql() entry path — Catalyst "
    "decorrelates it to a left-semi join (SURVEY §4: subquery decorrelation "
    "is a zero-custom-code rewrite).",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load

    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        """
    )


@spec(
    """
    SELECT p_partkey, p_name,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price
    FROM part
    WHERE CAST(p_retailprice AS DECIMAL(12,2)) >
          (SELECT CAST(AVG(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
           FROM part)
    """,
    doc="Scalar subquery (uncorrelated aggregate) via spark.sql(): parts "
    "above the average retail price; decimal-exact threshold on both engines.",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load

    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        FROM part
        WHERE CAST(p_retailprice AS DECIMAL(12,2)) >
              (SELECT CAST(AVG(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
               FROM part)
        """
    )


@spec(
    f"""
    SELECT l_returnflag,
           {sql_sum_money("CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END", 'qty_F')},
           {sql_sum_money("CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END", 'qty_O')}
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot (groupBy().pivot() with an explicit value list — one shuffle, "
    "no value-discovery pass, the scalable form); oracle expresses the same "
    "thing as conditional aggregation.",
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec_money("l_quantity")).cast("double"))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
    )


@spec(
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 100
    """,
    doc="Unpivot/melt (pivot's inverse): three measure columns to long form "
    "via df.unpivot — a zero-shuffle narrow transform (each row expands "
    "in place); oracle states it as the UNION ALL it's equivalent to.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


@spec(
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0)   AS all_over_1k,
           bool_or(o_totalprice > 400000.0)  AS any_over_400k,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="A7+ BOOLEAN aggregates (bool_and / bool_or — SQL:2023 ANY/EVERY) "
    "plus count_if: the predicate-rollup family data-quality gates are "
    "built from (\"did every row in the partition pass?\", \"did any row "
    "trip the alarm?\").  Plain partial+final hash agg — booleans combine "
    "associatively, so map-side combine applies like any sum.",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count(F.lit(1)).alias("n"),
    )


@spec(
    """
    WITH p AS (SELECT DISTINCT o_totalprice AS price,
                               CAST(o_orderdate AS DATE) AS odate
               FROM orders)
    SELECT price, odate FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price >= a.price AND b.odate <= a.odate
        AND (b.price > a.price OR b.odate < a.odate)
    )
    """,
    doc="O6+ SKYLINE (Pareto front; Borzsony et al. 2001, and 'Integration "
    "of Skyline Queries into Spark SQL', EDBT 2023): the undominated "
    "distinct (price MAX, orderdate MIN) pairs — no other order is both "
    "at-least-as-expensive and at-least-as-early with one strict.  "
    "Spark-first TWO-PHASE: each partition computes its LOCAL skyline with "
    "a sort+sweep Arrow kernel (a local skyline always contains the global "
    "one restricted to that partition, so phase 1 is a safe superset "
    "reduction that shrinks n to ~skyline-size per partition); the small "
    "candidate union then takes one final sweep.  At 100 TB phase 1 is "
    "embarrassingly parallel map-side work and only candidates (typically "
    "thousands) reach the final pass — never the O(n^2) self-join the "
    "NOT-EXISTS oracle spells out.",
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def local_skyline(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # sort by (price DESC, odate ASC): a row is dominated iff some
            # earlier row has odate <= its odate (with equal (price, odate)
            # pairs pre-deduped, the running-min test is exact)
            pdf = pdf.sort_values(["price", "odate"], ascending=[False, True])
            run_min = pdf["odate"].cummin().shift(1)
            keep = run_min.isna() | (pdf["odate"] < run_min)
            yield pdf[keep]

    o = load(spark, sf_dir, "orders")
    pairs = o.select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("date").alias("odate"),
    ).dropDuplicates(["price", "odate"])
    schema = "price DOUBLE, odate DATE"
    candidates = pairs.mapInPandas(local_skyline, schema)
    # the candidate set is skyline-sized: one more sweep on a single task
    # (documented small-side exception, like the driver-bounded collects)
    return candidates.coalesce(1).mapInPandas(local_skyline, schema)


@spec(
    """
    WITH p AS (
      SELECT DISTINCT c_mktsegment AS seg, o_totalprice AS price,
                      CAST(o_orderdate AS DATE) AS odate
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT seg, price, odate FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.seg = a.seg AND b.price >= a.price AND b.odate <= a.odate
        AND (b.price > a.price OR b.odate < a.odate)
    )
    """,
    doc="O6+ PER-GROUP skyline (Pareto front within each market segment): "
    "the grouped variant admits a fully DECLARATIVE scalable plan — sort "
    "each group by price DESC and keep rows strictly below the running "
    "minimum date, i.e. ONE partitioned window pass (groups shuffle by "
    "segment key; no per-partition kernels, no candidate phase) — the "
    "formulation skyline_orders' GLOBAL variant cannot use because a "
    "global running-min window would collapse to one partition.  Same "
    "NOT-EXISTS oracle, per group.",
)
def skyline_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    pairs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").cast("date").alias("odate"),
        )
        .dropDuplicates(["seg", "price", "odate"])
    )
    w = (
        Window.partitionBy("seg")
        .orderBy(F.desc("price"), F.asc("odate"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_min = F.min("odate").over(w)
    return (
        pairs.withColumn("__m", run_min)
        .filter(F.col("__m").isNull() | (F.col("odate") < F.col("__m")))
        .select("seg", "price", "odate")
    )


_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE nxt AS (
      SELECT o_custkey, o_orderkey,
             lag(o_orderkey)  OVER w AS prev_key,
             lead(o_orderkey) OVER w AS next_key
      FROM orders WHERE o_custkey < 300
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    ),
    chain AS (
      SELECT o_custkey, o_orderkey AS root_key, o_orderkey, 1 AS depth, next_key
      FROM nxt WHERE prev_key IS NULL
      UNION ALL
      SELECT c.o_custkey, c.root_key, n.o_orderkey, c.depth + 1, n.next_key
      FROM chain c JOIN nxt n ON n.o_orderkey = c.next_key
      WHERE c.depth < 12
    )
    SELECT o_custkey, root_key, o_orderkey, depth FROM chain
"""


@spec(
    _RECURSIVE_CHAIN_SQL,
    doc="§3.4+ RECURSIVE CTE (Spark >= 4.0 WITH RECURSIVE): walk each "
    "customer's order chain (orders linked to their date-successors) from "
    "its root, emitting (root, order, depth) — variable-depth path "
    "traversal, the query shape hierarchies/BOMs need and plain joins "
    "cannot express at unknown depth.  IDENTICAL SQL runs on both engines "
    "(lead/lag seed + UNION ALL step; the chain forest is acyclic so "
    "UNION ALL terminates — Spark does not yet support the deduplicating "
    "UNION recursion cyclic closures need, which is why connected "
    "components stays on the iterative min-label operator).  Each "
    "recursion step is one equi-join of the shrinking frontier against "
    "the edge list — exactly the per-round dataflow "
    "dedup_connected_components hand-schedules.",
)
def sql_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The declared surface is the LITERAL SQL text (identical on both
    # engines), so the only harness-side lever is what the `orders` view
    # binds to: Spark inlines the non-recursive `nxt` CTE into the
    # UnionLoop recursion-step template (r16 plan audit: the step plan
    # carries its own scan -> filter -> Window copy of nxt, re-executed
    # on every one of the 12 iterations — plans/r16/sql_recursive_chain
    # dumps).  Materializing `nxt` itself would change the declared SQL,
    # so that stays off-limits; SF-adaptively materializing the view's
    # source keeps the text byte-identical while the per-iteration
    # re-read hits a lineage-free checkpoint instead of parquet above the
    # threshold (at bench SF: lazy, unchanged — the barrier loses to 12
    # cheap re-scans locally, the r15 rejected-experiment class).
    from ..catalog import materialize_if_wide

    materialize_if_wide(
        load(spark, sf_dir, "orders"), sf_dir, "orders"
    ).createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_CHAIN_SQL)


@spec(
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.absent')
                                 IS NOT NULL) AS BIGINT) AS n_absent
    FROM events GROUP BY event_type
    """,
    doc="§2.7+ VARIANT semi-structured type (Spark >= 4.0): props JSON "
    "parses ONCE into the binary VARIANT encoding and fields extract with "
    "typed paths (variant_get / try_variant_get) — the modern replacement "
    "for per-access get_json_object string re-parsing, and the open-format "
    "answer to shredded semi-structured columns at 100 TB.  try_variant_get "
    "on a missing path yields NULL (counted, = 0) instead of failing; the "
    "DuckDB oracle reads the same fields through its JSON functions.",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        e.select(
            "event_type",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
            F.expr("try_variant_get(parse_json(props), '$.absent', 'string')").alias(
                "absent"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count("absent").alias("n_absent"),
        )
    )


@spec(
    """
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.50), 6) AS p50,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.90), 6) AS price_p90
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="A9+ exact percentiles (SQL-standard percentile_cont linear "
    "interpolation — both engines share it, so the oracle is exact after "
    "round(6)).  Exact percentiles need the per-group sorted values; at "
    "100 TB the corpus-wide form switches to approx_percentile (the A5 "
    "HLL-style tradeoff) — here the per-flag grouping keeps sort widths "
    "bounded.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(qty, F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(qty, F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile(qty, F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile(price, F.lit(0.90)), 6).alias("price_p90"),
    )


@spec(
    """
    SELECT p_partkey,
           regexp_extract(p_name, '[a-z]+', 0) AS first_word,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]{4,}'), '|'), '')
             AS long_words,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_name, '^[a-z]') AS starts_lower
    FROM part
    """,
    doc="§2.7 regex functions beyond fn_string's extract/replace: full-match "
    "extraction, match counting, extract-all (surfaced '|'-joined — the "
    "driver-hashable form), global replace, and boolean match.  All "
    "JVM-side; both engines use re2-compatible syntax for these patterns.",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), F.lit(0))).alias(
            "n_vowels"
        ),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[a-z]{4,}"), F.lit(0)), "|"
        ).alias("long_words"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike("^[a-z]").alias("starts_lower"),
    )


HIST_BUCKETS = 20


@spec(
    f"""
    WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    b AS (
      SELECT CAST(least(floor((o_totalprice - mn) / ((mx - mn) / {HIST_BUCKETS})),
                        {HIST_BUCKETS - 1}) AS INT) AS bucket,
             mn, mx
      FROM orders, s
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           round(mn + bucket * ((mx - mn) / {HIST_BUCKETS}), 6) AS lo,
           round(mn + (bucket + 1) * ((mx - mn) / {HIST_BUCKETS}), 6) AS hi
    FROM b GROUP BY bucket, mn, mx
    """,
    doc=f"EQUI-WIDTH HISTOGRAM ({HIST_BUCKETS} buckets over o_totalprice): "
    "global min/max from one tiny aggregate ride along as a 1-row broadcast; "
    "bucketing is a stateless map expression and the histogram itself one "
    "narrow hash aggregation — two scans, no wide shuffle, the profiling "
    "shape that precedes partition/skew decisions.  All arithmetic is the "
    "identical IEEE expression tree on both engines (min/max are exact "
    "doubles, no float summation), so the bucket ids and rounded bounds are "
    "hash-exact.",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    s = o.agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / HIST_BUCKETS
    b = o.crossJoin(F.broadcast(s)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) / width),
            F.lit(HIST_BUCKETS - 1).cast("bigint"),
        )
        .cast("int")
        .alias("bucket"),
        "mn",
        "mx",
    )
    return (
        b.groupBy("bucket", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.round(F.col("mn") + F.col("bucket") * width, 6).alias("lo"),
            F.round(F.col("mn") + (F.col("bucket") + 1) * width, 6).alias("hi"),
        )
    )


# (column, kind) pairs profiled by data_profile; kind picks the min/max
# string rendering that is deterministic across engines (decimal for money,
# date for timestamps, plain cast for ints/strings).
_PROFILE_COLS = (
    ("o_custkey", "int"),
    ("o_orderdate", "date"),
    ("o_orderkey", "int"),
    ("o_orderpriority", "str"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "money"),
)


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "money":
            mn, mx = (
                f"CAST(CAST({f}({c}) AS DECIMAL(12,2)) AS VARCHAR)" for f in ("min", "max")
            )
        elif kind == "date":
            mn, mx = (f"CAST(CAST({f}({c}) AS DATE) AS VARCHAR)" for f in ("min", "max"))
        else:
            mn, mx = (f"CAST({f}({c}) AS VARCHAR)" for f in ("min", "max"))
        parts.append(
            f"SELECT '{c}' AS col_name,"
            f" CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_val, {mx} AS max_val FROM orders"
        )
    return " UNION ALL ".join(parts)


@spec(
    _profile_oracle(),
    doc="COLUMN PROFILING (per-column null count, exact distinct count, "
    "min/max) over orders — the data-quality summary a pipeline materializes "
    "before schema-contract enforcement.  Spark computes ALL columns' "
    "metrics in ONE aggregation pass (24 agg expressions over a single "
    "scan), then pivots the 1-row result to long form driver-free via an "
    "explode of per-column structs; the oracle is the readable UNION ALL "
    "of per-column aggregates.  min/max surface as strings rendered "
    "deterministically per type class (decimal(12,2) for money, DATE for "
    "timestamps, plain casts otherwise).",
)
def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the 6 count_distincts expand the scan 6x before aggregating: spread the
    # one-file fixture scan so the expand runs wide (no-op at real split
    # counts) — measured 2.3x at sf0.1
    o = parallelize_small_scan(load(spark, sf_dir, "orders"), "o_orderkey")
    aggs = []
    for c, kind in _PROFILE_COLS:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(col).alias(f"{c}__distinct"))
        if kind == "money":
            mn = F.min(col).cast("decimal(12,2)").cast("string")
            mx = F.max(col).cast("decimal(12,2)").cast("string")
        elif kind == "date":
            mn = F.min(col.cast("date")).cast("string")
            mx = F.max(col.cast("date")).cast("string")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs.append(mn.alias(f"{c}__min"))
        aggs.append(mx.alias(f"{c}__max"))
    one_row = o.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c, _ in _PROFILE_COLS
    ]
    return one_row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


@spec(
    """
    WITH e AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(hour(ts) AS INT) AS hr,
             CAST(minute(ts) // 15 AS INT) AS q15,
             value
      FROM events
    )
    SELECT day, hr, q15,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(grouping(day) + grouping(hr) + grouping(q15) AS INT) AS grain
    FROM e GROUP BY ROLLUP(day, hr, q15)
    """,
    doc="TIME-HIERARCHY ROLLUP (quarter-hour -> hour -> day -> total) over "
    "events — the batch form of a hypertable continuous aggregate: ONE scan "
    "and one ROLLUP aggregation produce every downsampling grain at once "
    "(partial aggregation is map-side, so the shuffle carries pre-combined "
    "rows; at 100 TB this replaces four separate scan+agg jobs).  `grain` "
    "counts the grouping flags (0 = finest .. 3 = grand total).  Value sums "
    "go through DECIMAL(18,6) — exact, order-independent — and surface as "
    "DOUBLE per the registry's float policy.",
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("int").alias("hr"),
        F.expr("minute(ts) div 15").cast("int").alias("q15"),
        "value",
    )
    return ev.rollup("day", "hr", "q15").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        (F.grouping("day") + F.grouping("hr") + F.grouping("q15"))
        .cast("int")
        .alias("grain"),
    )


Z_THRESHOLD = 3.0


@spec(
    f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    sv AS (
      SELECT event_type, n, s1,
             (s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1) AS var
      FROM s WHERE n > 1
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - sv.s1 / sv.n) / sqrt(sv.var) AS zval
      FROM events e JOIN sv USING (event_type)
      WHERE sv.var > 0
    )
    SELECT event_id, event_type, value, round(zval, 6) AS z
    FROM z WHERE abs(zval) >= {Z_THRESHOLD}
    """,
    doc=f"Z-SCORE ANOMALY DETECTION (|z| >= {Z_THRESHOLD} per event_type): "
    "per-group mean and sample variance come from EXACT decimal sums "
    "(sum and sum-of-squares are order-independent), the z expression is "
    "one identical IEEE tree (divisions, one multiply-subtract, one "
    "correctly-rounded sqrt), so flagged rows and rounded scores are "
    "hash-exact across engines.  Degenerate groups are EXCLUDED identically "
    "on both engines (n > 1 and var > 0): with n == 1 the n/(n-1) term is a "
    "zero division whose result is engine-specific (Spark non-ANSI NULL vs "
    "DuckDB IEEE inf/NaN with NaN-high comparison semantics), and all-equal "
    "groups yield NaN z-scores with the same divergence.  Scale: the stats "
    "aggregate is k rows "
    "(one per group) broadcast back into a map-side filter — one narrow "
    "shuffle for the stats, none for the scoring pass; the outlier-gate "
    "shape a quality pipeline runs before ingestion.",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dv).cast("double").alias("s1"),
        F.sum(dv * dv).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") / F.col("n") - mean * mean) * F.col("n") / (F.col("n") - 1)
    # degenerate-group guard (see docstring): n > 1 filters the zero
    # division, var > 0 filters all-equal groups before the sqrt
    sv = s.filter(F.col("n") > 1).withColumn("var", var).filter(F.col("var") > 0)
    z = (F.col("value") - mean) / F.sqrt(F.col("var"))
    return (
        ev.join(F.broadcast(sv), "event_type")
        .withColumn("zval", z)
        .filter(F.abs(F.col("zval")) >= Z_THRESHOLD)
        .select("event_id", "event_type", "value", F.round("zval", 6).alias("z"))
    )


def _mg_candidate_kernel(batches):
    """Per-partition Misra-Gries summary over the ``key`` column.

    Textbook MG maintained with the MERGEABLE-SUMMARIES merge rule
    (Agarwal et al., PODS 2012): each Arrow batch contributes its exact
    value counts; whenever the counter table exceeds the budget ``m`` it
    shrinks by subtracting the (m+1)-th largest count and dropping
    non-positives.  The classic bound survives merging: any key whose
    true in-partition frequency exceeds n_p/(m+1) is still present at the
    end.  Memory is O(m + batch-distinct) regardless of partition size —
    the whole point vs an exact per-partition value_counts.  ``m`` rides
    in on the constant ``d`` column (ceil(20*d/27), see the spec proof).
    """
    import pandas as pd

    counters = pd.Series(dtype="int64")
    m = None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        if m is None:
            m = max(1, (20 * int(pdf["d"].iloc[0]) + 26) // 27)
        counters = counters.add(pdf["key"].value_counts(), fill_value=0)
        if len(counters) > m:
            cut = counters.nlargest(m + 1).iloc[-1]
            counters = counters[counters > cut] - cut
    if m is not None and len(counters):
        yield pd.DataFrame({"key": counters.index.to_numpy("int64")})


@spec(
    """
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d
               FROM lineitem)
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS freq
    FROM lineitem, t
    GROUP BY l_partkey, t.n, t.d
    HAVING 20 * COUNT(*) * d > 27 * n
    """,
    doc="A5+ DISTRIBUTED HEAVY HITTERS by candidate-generate + exact-verify: "
    "a map-side Misra-Gries summary per partition (Arrow mapInPandas, NO "
    "shuffle — memory bounded by the counter budget m, not the partition's "
    "distinct count), candidates unioned and exact-recounted via a "
    "broadcast semi join, then thresholded at freq > 1.35 * n/d (mean "
    "frequency * 1.35), expressed as the pure-integer cross-multiplication "
    "20*freq*d > 27*n on BOTH engines.  LOSSLESS: a key absent from every "
    "partition's MG summary has total frequency <= sum n_p/(m+1) < n/m, and "
    "m = ceil(20*d/27) makes n/m <= 27n/(20d) = the final threshold, so "
    "the candidate union provably covers every qualifying key and the "
    "exact recount makes the output partition-layout-independent.  "
    "SCALE HONESTY: at THIS threshold (1.35x mean) losslessness forces "
    "m = ceil(20d/27) ~ 0.74d counters, so the candidate set is only "
    "modestly smaller than d — the demo pins the lossless-coverage "
    "algebra, not a large constant saving.  The savings grow directly "
    "with the threshold: at the production-typical 'freq > 10x mean' the "
    "same kernel needs m = ceil(d/10) counters and the candidate union "
    "shuffles ~d/10 keys; per-partition memory is bounded by m either "
    "way, never by the partition's distinct count.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("key"))
    # NOTE (r15 measurement): tot rides into both the candidate kernel's
    # crossJoin and the final filter; an eager localCheckpoint of the 1-row
    # frame was tried and measured SLOWER at sf0.1 (1.18-1.30 s ->
    # 1.38-1.40 s warm A/B) — the barrier costs more than the repeated
    # count-distinct at bench scale.
    tot = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("key").cast("bigint").alias("d"),
    )
    cand = (
        li.crossJoin(F.broadcast(tot))
        .mapInPandas(_mg_candidate_kernel, "key bigint")
        .distinct()
    )
    freq = (
        li.join(F.broadcast(cand), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .filter(F.lit(20) * F.col("freq") * F.col("d") > F.lit(27) * F.col("n"))
        .select(F.col("key").alias("l_partkey"), "freq")
    )


@spec(
    f"""
    WITH r AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(l_extendedprice AS DECIMAL(12,2)),
                        l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_kept,
           {sql_avg_money('p', 'trimmed_avg')},
           CAST(MIN(p) AS DOUBLE) AS trim_low,
           CAST(MAX(p) AS DOUBLE) AS trim_high
    FROM r WHERE rn > n // 20 AND rn <= n - n // 20
    GROUP BY l_returnflag
    """,
    doc="A9++ ROBUST (5%-TRIMMED) STATISTICS per group — the outlier-proof "
    "twin of agg_stats/anomaly_zscore: drop the k = n div 20 lowest and "
    "highest rows BY RANK (row_number with a total deterministic order: "
    "value, then orderkey/linenumber tie-breaks) and aggregate the "
    "remainder.  Rank-based trimming sidesteps percentile interpolation "
    "entirely, so every surviving value is an exact DECIMAL(12,2) and the "
    "trimmed mean is one decimal sum + one IEEE division — bit-equal on "
    "both engines with no round() crutch.  trim_low/trim_high are the "
    "post-trim bounds (the discrete p05/p95 winsorization clamps).  One "
    "hash exchange on the group key serves both the window and the final "
    "aggregate; per-group sort width is the partition, exactly the "
    "agg_percentiles scale story.",
)
def agg_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        dec_money("l_extendedprice").alias("p"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("p", "l_orderkey", "l_linenumber")
    wc = Window.partitionBy("l_returnflag")
    k = F.expr("n div 20")
    kept = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    )
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        avg_money(F.col("p"), "trimmed_avg"),
        F.min("p").cast("double").alias("trim_low"),
        F.max("p").cast("double").alias("trim_high"),
    )


# Identical SQL text on both engines (the sql_recursive_chain convention):
# LATERAL is ANSI and both dialects accept this form verbatim.
_LATERAL_TOPK_SQL = """
    SELECT n.n_name, t.c_name, t.bal
    FROM nation n,
    LATERAL (SELECT c_name,
                    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
"""


@spec(
    _LATERAL_TOPK_SQL,
    doc="§3.4+ correlated LATERAL subquery (SQL:1999, Spark >= 3.2): top-3 "
    "customers by balance FOR EACH nation, stated as a per-row dependent "
    "subquery — the SQL-surface twin of window_topk_per_group.  Catalyst "
    "DECORRELATES the lateral into a rank-filtered join (no per-row "
    "re-execution — the plan is the same shuffle-once window top-k, "
    "verified by the plan lock), which is exactly why the construct is "
    "usable at 100 TB while a naive nested-loop interpretation is not.  "
    "Identical SQL text runs on both engines.",
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_TOPK_SQL)


@spec(
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nk,
             CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS nnull,
             CAST(COUNT(*) FILTER (NOT (o_totalprice > 0)) AS BIGINT) AS nbadp,
             CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
                  AS BIGINT) AS nbads
      FROM orders
    ),
    orph AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'row_count_nonzero' AS check_name, n AS observed, n > 0 AS passed FROM m
    UNION ALL SELECT 'orderkey_unique', n - nk, n - nk = 0 FROM m
    UNION ALL SELECT 'custkey_complete', nnull, nnull = 0 FROM m
    UNION ALL SELECT 'totalprice_positive', nbadp, nbadp = 0 FROM m
    UNION ALL SELECT 'orderstatus_in_set', nbads, nbads = 0 FROM m
    UNION ALL SELECT 'lineitem_ref_integrity', c, c = 0 FROM orph
    """,
    doc="DATA-QUALITY CONSTRAINT SUITE (the Deequ/Great-Expectations "
    "check-report shape): completeness, key uniqueness, value range, "
    "accepted-values and referential integrity, reported as one long-form "
    "(check_name, observed violation count, passed) frame — the gate a "
    "pipeline evaluates before publishing a batch (the write-audit-publish "
    "audit step).  All five single-table checks fold into ONE aggregation "
    "pass over the orders scan (observed counts are exact integers; the "
    "1-row metrics frame explodes map-side into the report rows), and "
    "referential integrity is a LEFT ANTI count — at 100 TB that is the "
    "only extra shuffle, keyed by the join key it audits.",
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def viol(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    m = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("o_orderkey").cast("bigint").alias("nk"),
        viol(F.col("o_custkey").isNull()).alias("nnull"),
        viol(~(F.col("o_totalprice") > 0)).alias("nbadp"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("nbads"),
    )

    dups = F.col("n") - F.col("nk")
    checks = m.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("row_count_nonzero").alias("check_name"),
                    F.col("n").alias("observed"),
                    (F.col("n") > 0).alias("passed"),
                ),
                F.struct(
                    F.lit("orderkey_unique").alias("check_name"),
                    dups.alias("observed"),
                    (dups == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("custkey_complete").alias("check_name"),
                    F.col("nnull").alias("observed"),
                    (F.col("nnull") == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("totalprice_positive").alias("check_name"),
                    F.col("nbadp").alias("observed"),
                    (F.col("nbadp") == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("orderstatus_in_set").alias("check_name"),
                    F.col("nbads").alias("observed"),
                    (F.col("nbads") == 0).alias("passed"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    orph = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.lit("lineitem_ref_integrity").alias("check_name"),
            F.col("c").alias("observed"),
            (F.col("c") == 0).alias("passed"),
        )
    )
    return checks.unionByName(orph)


SKEW_RANK_PARTS = 8  # FLOOR for the distributed rank phase's range partitions
_RANK_PARTS_CAP = 2048  # offsets are collected driver-side: O(parts) rows


def _rank_parts(spark: SparkSession) -> int:
    """Range-partition count for :func:`distributed_rank`: scales with the
    cluster (``defaultParallelism`` = total executor cores) between a floor
    of ``SKEW_RANK_PARTS`` (tiny local sessions still exercise the multi-
    partition path) and a cap of ``_RANK_PARTS_CAP`` (the per-partition
    prefix offsets round-trip through the driver, so the collect stays
    bounded at <= 2048 tiny rows even on a 10k-core cluster)."""
    return min(max(SKEW_RANK_PARTS, spark.sparkContext.defaultParallelism), _RANK_PARTS_CAP)


def distributed_rank(
    df: DataFrame, order_cols: list, out: str = "i", parts: int | None = None
) -> DataFrame:
    """Exact global 1-based row_number under the TOTAL order ``order_cols``,
    computed distributed: range-partition on the order columns (materialized
    once so partition ids are stable across the two consumers), local
    row_numbers per partition, and the constant per-partition prefix
    offsets (<= ``parts`` <= 2048 rows driver-side — the replay.py offset
    precedent; see :func:`_rank_parts` for the bound) broadcast back.
    Never a single-task global window; the caller must pass a tie-free
    column list or ranks are nondeterministic.  ``parts`` defaults to the
    session's ``defaultParallelism`` (floor 8, cap 2048) so the rank phase
    keeps every core busy at cluster scale instead of a fixed-8 ceiling.
    """
    if parts is None:
        parts = _rank_parts(df.sparkSession)
    rp = (
        df.repartitionByRange(parts, *[F.asc(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        (r["__pid"], r["n"])
        for r in rp.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offs, acc = [], 0
    for pid, n in sizes:
        offs.append((pid, acc))
        acc += n
    off_df = df.sparkSession.createDataFrame(offs, "__pid int, __off bigint")
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        rp.withColumn("__lr", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(out, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )


@spec(
    """
    WITH c AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
               FROM lineitem GROUP BY 1),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, l_partkey) AS i FROM c),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS d, CAST(SUM(c) AS BIGINT) AS t,
                 CAST(SUM(CAST(i AS DECIMAL(19,0)) * c) AS DECIMAL(38,0)) AS s
          FROM r),
    t10 AS (SELECT CAST(SUM(c) AS BIGINT) AS s10 FROM
            (SELECT c FROM c ORDER BY c DESC, l_partkey LIMIT 10)),
    t1 AS (SELECT MAX(c) AS m FROM c)
    SELECT d AS n_keys, t AS total_rows,
           CAST(2 * s - (d + 1) * t AS DOUBLE) / CAST(d * t AS DOUBLE) AS gini,
           CAST(m AS DOUBLE) / t AS top1_share,
           CAST(s10 AS DOUBLE) / t AS top10_share
    FROM t, t10, t1
    """,
    doc="KEY-SKEW DIAGNOSTICS for join planning (decide salting / skew-join "
    "hints from data, not anecdotes): the Gini coefficient of the "
    "l_partkey frequency distribution plus top-1/top-10 frequency shares, "
    "in one row.  Gini needs a GLOBAL rank of per-key counts — computed "
    "distributed, not with a single-task window: counts repartitionByRange "
    "on (count, key) (materialized once so the partition ids are stable), "
    "per-partition row_numbers, and the constant partition-size prefix "
    "offsets (<= 2048 rows driver-side, the replay.py offset precedent) "
    "broadcast back to form exact global ranks.  The rank-weighted sum "
    "accumulates in DECIMAL(38,0) so the formula G = (2*sum(i*c) - "
    "(D+1)*T) / (D*T) stays exact far past bigint scale; the three final "
    "divisions are single IEEE ops on both engines.",
)
def data_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    # NOTE (r15 measurement): cnts feeds three consumers (rank / top-10 /
    # max) and re-computes per consumer; an eager localCheckpoint was tried
    # and measured SLOWER at sf0.1 (1.45-1.57 s -> 1.77-1.98 s warm A/B):
    # the materialization barrier costs more than two extra 600k-row
    # scan+aggs on 32 cores.  At 100 TB the three consumers would read a
    # persisted counts table; at bench scale recompute wins.
    cnts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = distributed_rank(cnts, ["c", "l_partkey"], out="i")
    tot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("c").cast("bigint").alias("t"),
        F.sum(F.col("i").cast("decimal(19,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("s"),
    )
    t10 = (
        cnts.orderBy(F.desc("c"), F.asc("l_partkey"))
        .limit(10)
        .agg(F.sum("c").cast("bigint").alias("s10"))
    )
    t1 = cnts.agg(F.max("c").alias("m"))
    gini = (
        F.lit(2).cast("decimal(38,0)") * F.col("s")
        - (F.col("d") + 1) * F.col("t")
    ).cast("double") / (F.col("d") * F.col("t")).cast("double")
    return (
        tot.crossJoin(F.broadcast(t10))
        .crossJoin(F.broadcast(t1))
        .select(
            F.col("d").alias("n_keys"),
            F.col("t").alias("total_rows"),
            gini.alias("gini"),
            (F.col("m").cast("double") / F.col("t")).alias("top1_share"),
            (F.col("s10").cast("double") / F.col("t")).alias("top10_share"),
        )
    )


@spec(
    """
    WITH c AS (
      SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
    FROM c
    QUALIFY row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY n DESC, l_quantity) = 1
    """,
    doc="A9+ STATISTICAL MODE per group with a DETERMINISTIC tie-break "
    "(smallest value wins): neither engine's native mode() defines tie "
    "order, so both sides state it explicitly — count per (group, value), "
    "rank by (count DESC, value), keep rank 1.  Two stages that share one "
    "group-key partitioning lineage; the value-count frame is "
    "|group x distinct-value| sized, already reduced map-side.",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("l_quantity"))
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


# Segment rule shared verbatim by both engines (scores 1..4, 4 = best).
_RFM_SEGMENT_SQL = """CASE
      WHEN r_score = 4 AND f_score = 4 THEN 'champion'
      WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
      WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      WHEN r_score <= 2 THEN 'hibernating'
      ELSE 'regular' END"""


@spec(
    f"""
    WITH rfm AS (
      SELECT o_custkey, MAX(o_orderdate) AS r, CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS m
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             CAST(NTILE(4) OVER (ORDER BY r, o_custkey) AS BIGINT) AS r_score,
             CAST(NTILE(4) OVER (ORDER BY f, o_custkey) AS BIGINT) AS f_score,
             CAST(NTILE(4) OVER (ORDER BY m, o_custkey) AS BIGINT) AS m_score
      FROM rfm
    )
    SELECT o_custkey, r_score, f_score, m_score,
           {_RFM_SEGMENT_SQL} AS segment
    FROM scored
    """,
    doc="RFM CUSTOMER SEGMENTATION (recency / frequency / monetary "
    "quartiles + rule-based segments — the classic CRM rollup): one "
    "aggregate to customer grain, then NTILE(4) per dimension under a "
    "TIE-FREE total order (metric, custkey).  The quartiles are NOT a "
    "single-task global window: each dimension's exact global rank comes "
    "from the shared distributed_rank kernel (range partitions + "
    "broadcast prefix offsets) and the NTILE tile is recovered from "
    "(rank, N) by the SQL-standard closed form — first N mod 4 tiles get "
    "one extra row — in pure integer arithmetic, bit-equal to the "
    "oracle's native NTILE.  Monetary stays DECIMAL through the ordering "
    "so ties break identically on both engines.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # NOTE (r15 measurement): rfm feeds the first rank pass AND the `n`
    # count; an eager localCheckpoint was tried and measured SLOWER at
    # sf0.1 (2.86-2.94 s -> 3.05-3.13 s warm A/B) — the materialization
    # barrier outweighs one extra orders scan+agg at bench scale.
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("r"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("m"),
    )
    ranked = distributed_rank(rfm, ["r", "o_custkey"], out="ri")
    ranked = distributed_rank(ranked, ["f", "o_custkey"], out="fi")
    ranked = distributed_rank(ranked, ["m", "o_custkey"], out="mi")
    n = rfm.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))

    def ntile4(col: str) -> str:
        # SQL-standard NTILE(4) from (rank, N) in pure integer arithmetic:
        # q = N div 4 rows per tile, the first N mod 4 tiles take one
        # extra; ceil(a/b) = (a + b - 1) div b.  q = 0 (N < 4) keeps every
        # rank on the fat branch, so the thin divisor guard never fires.
        q, r = "(nn div 4)", "(nn % 4)"
        cut = f"({r} * ({q} + 1))"
        fat = f"(({col} + {q}) div ({q} + 1))"
        thin = f"({r} + (({col} - {cut} + {q} - 1) div greatest({q}, 1)))"
        return f"CAST(CASE WHEN {col} <= {cut} THEN {fat} ELSE {thin} END AS BIGINT)"

    return ranked.crossJoin(F.broadcast(n)).selectExpr(
        "o_custkey",
        f"{ntile4('ri')} AS r_score",
        f"{ntile4('fi')} AS f_score",
        f"{ntile4('mi')} AS m_score",
    ).withColumn("segment", F.expr(_RFM_SEGMENT_SQL))


OLS_EPOCH = "1992-01-01"  # x = days since fixture epoch (small exact ints)


@spec(
    f"""
    WITH m AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(y) AS sy,
             SUM(CAST(x AS DECIMAL(12,2)) * y) AS sxy
      FROM (
        SELECT o_orderpriority,
               date_diff('day', DATE '{OLS_EPOCH}', CAST(o_orderdate AS DATE))
                 AS x,
               CAST(o_totalprice AS DECIMAL(12,2)) AS y
        FROM orders
      )
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / n, 6) AS intercept
    FROM m
    WHERE n * sxx - sx * sx <> 0
    """,
    doc="PER-GROUP OLS TREND (distributed linear-regression fit, the "
    "regr_slope/regr_intercept surface): price-over-time fit per order "
    "priority from the FIVE EXACT MOMENTS (n, sum x, sum x^2, sum y, "
    "sum xy) — x is integer days since the fixture epoch, y exact "
    "DECIMAL(12,2), so every moment is map-side-combinable integer/"
    "decimal arithmetic with no float accumulation; the closed-form "
    "slope (n*sxy - sx*sy)/(n*sxx - sx^2) and intercept then evaluate "
    "as ONE identical IEEE expression tree over those exact inputs on "
    "both engines (the native regr_* aggregates stream doubles, whose "
    "sum order — and therefore bits — differs per partitioning; the "
    "moments form is the scale-correct AND parity-correct one).  "
    "Degenerate groups (single row / constant x) zero the denominator and "
    "are excluded by the same exact-integer predicate on both engines.  "
    "This is the training step of D9 ml_linear_score: fit here, score "
    "there.  "
    "Scale: one partial-aggregated pass, k rows out; at 100 TB the same "
    "five moments fit a model per any key without a second scan.",
)
def ml_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate").cast("date"), F.lit(OLS_EPOCH).cast("date"))
    y = dec_money("o_totalprice")
    m = o.select(
        "o_orderpriority", x.alias("x"), y.alias("y"), (x * x).alias("xx")
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("xx").cast("bigint").alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(12,2)") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_exact = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den = den_exact.cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n")
    # degenerate-group guard (the anomaly_zscore precedent): a single-row or
    # constant-x group zeroes the denominator — Spark non-ANSI yields NULL,
    # DuckDB IEEE yields inf/NaN — so both engines exclude it identically
    m = m.filter(den_exact != 0)
    return m.select(
        "o_orderpriority",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


EQUIDEPTH_B = 10  # equal-frequency buckets


@spec(
    f"""
    WITH r AS (
      SELECT o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM orders
    )
    SELECT CAST((i - 1) * {EQUIDEPTH_B} // n AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM r GROUP BY 1
    """,
    doc="EQUI-DEPTH (equal-frequency) HISTOGRAM — the optimizer-statistics "
    "and data-profiling twin of D1's equi-width agg_histogram: "
    f"{EQUIDEPTH_B} buckets each holding n/{EQUIDEPTH_B} rows, with the "
    "observed value range per bucket.  Needs a GLOBAL rank under the "
    "total (price, key) order; computed through the shared "
    "distributed_rank kernel (range partitions + broadcast prefix "
    "offsets — never a single-task window), then bucket = "
    "((i-1)*B) div n in pure integer arithmetic against the "
    "1-row-broadcast total.  Bucket bounds are SELECTED input values "
    "(min/max), zero float arithmetic on the contract surface.  The "
    "oracle states the same ranks with DuckDB's single-node window — "
    "fine at oracle scale, which is exactly why the engine side must "
    "not mirror it.",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = distributed_rank(o, ["o_totalprice", "o_orderkey"], out="i")
    # row count from the BASE scan, not the ranked frame: distributed_rank
    # preserves cardinality exactly (row_number adds a column; the offset
    # join is keyed on the partition id every row carries), so both counts
    # are equal by construction — but counting `ranked` re-executes its
    # window + broadcast-join lineage over the checkpoint, while counting
    # `o` is one column-pruned scan (r15 plan audit: one full rank
    # re-evaluation removed; 12 -> ~8 Exchange nodes).
    n = o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .groupBy(
            # integer div on both engines — a double division + truncation
            # could flip an exact bucket boundary by one ulp
            F.expr(f"CAST(((i - 1) * {EQUIDEPTH_B}) DIV n AS BIGINT)").alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@spec(
    """
    WITH m AS (
      SELECT l_returnflag AS flag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q) AS sq, SUM(e) AS se, SUM(d) AS sd,
             SUM(q*q) AS sqq, SUM(e*e) AS see, SUM(d*d) AS sdd,
             SUM(q*e) AS sqe, SUM(q*d) AS sqd, SUM(e*d) AS sed
      FROM (SELECT l_returnflag,
                   CAST(l_quantity AS DECIMAL(12,2)) AS q,
                   CAST(l_extendedprice AS DECIMAL(12,2)) AS e,
                   CAST(l_discount AS DECIMAL(5,2)) AS d
            FROM lineitem)
      GROUP BY l_returnflag
    )
    SELECT flag, var_x, var_y,
           round(CAST(num AS DOUBLE)
                 / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))), 6)
             AS corr
    FROM (
      SELECT flag, 'quantity' AS var_x, 'extendedprice' AS var_y,
             n*sqe - sq*se AS num, n*sqq - sq*sq AS dx, n*see - se*se AS dy
      FROM m
      UNION ALL
      SELECT flag, 'quantity', 'discount',
             n*sqd - sq*sd, n*sqq - sq*sq, n*sdd - sd*sd FROM m
      UNION ALL
      SELECT flag, 'extendedprice', 'discount',
             n*sed - se*sd, n*see - se*se, n*sdd - sd*sd FROM m
    )
    WHERE dx <> 0 AND dy <> 0
    """,
    doc="PAIRWISE CORRELATION MATRIX (long form) per group — the "
    "data-profiling companion to the OLS fit: Pearson r for every "
    "measure pair from TEN exact decimal moments accumulated in ONE "
    "partial-aggregated pass over a single scan (the native corr() "
    "aggregate streams doubles whose sum order differs per "
    "partitioning; the moments form is exact and mergeable).  The three "
    "pair rows are projections of the same k-row agged frame — the "
    "matrix costs one scan regardless of pair count.  Final r is one "
    "identical expression tree (two correctly-rounded IEEE sqrts, one "
    "multiply, one divide) with round(6) absorbing the engines' 1-ulp "
    "wide-decimal-to-double cast difference; zero-variance pairs are "
    "excluded by the same exact-integer predicate on both engines.",
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        dec_money("l_quantity").alias("q"),
        dec_money("l_extendedprice").alias("e"),
        F.col("l_discount").cast("decimal(5,2)").alias("d"),
        F.col("l_returnflag").alias("flag"),
    )
    # materialize the k-row moments frame ONCE: the three pair projections
    # prune different column subsets, so without this each union branch
    # re-plans its own scan+agg (3 full scans — the events_transitions
    # broadcast-reuse precedent)
    m = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").alias("sq"),
        F.sum("e").alias("se"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("e") * F.col("e")).alias("see"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("e")).alias("sqe"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("e") * F.col("d")).alias("sed"),
    ).localCheckpoint(eager=True)

    def pair(vx: str, vy: str, sxy: str, sx: str, sy: str, sxx: str, syy: str):
        num = F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)
        dx = F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)
        dy = F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)
        return m.select(
            "flag",
            F.lit(vx).alias("var_x"),
            F.lit(vy).alias("var_y"),
            num.alias("num"),
            dx.alias("dx"),
            dy.alias("dy"),
        )

    pairs = (
        pair("quantity", "extendedprice", "sqe", "sq", "se", "sqq", "see")
        .unionByName(pair("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"))
        .unionByName(pair("extendedprice", "discount", "sed", "se", "sd", "see", "sdd"))
    )
    corr = F.col("num").cast("double") / (
        F.sqrt(F.col("dx").cast("double")) * F.sqrt(F.col("dy").cast("double"))
    )
    return (
        pairs.filter((F.col("dx") != 0) & (F.col("dy") != 0))
        .select("flag", "var_x", "var_y", F.round(corr, 6).alias("corr"))
    )


QUERIES: dict[str, QuerySpec] = {
    "ml_regression_trend": ml_regression_trend,
    "agg_equidepth_histogram": agg_equidepth_histogram,
    "agg_corr_matrix": agg_corr_matrix,
    "q1_pricing_summary": q1_pricing_summary,
    "agg_heavy_hitters": agg_heavy_hitters,
    "agg_trimmed_stats": agg_trimmed_stats,
    "sql_lateral_topk": sql_lateral_topk,
    "dq_constraint_report": dq_constraint_report,
    "data_skew_report": data_skew_report,
    "agg_mode_per_group": agg_mode_per_group,
    "events_rfm_segments": events_rfm_segments,
    "agg_histogram": agg_histogram,
    "anomaly_zscore": anomaly_zscore,
    "data_profile": data_profile,
    "time_bucket_rollup": time_bucket_rollup,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "filter_where": filter_where,
    "limit_offset": limit_offset,
    "topk_orders": topk_orders,
    "sort_global": sort_global,
    "union_all": union_all,
    "intersect_custkeys": intersect_custkeys,
    "except_custkeys": except_custkeys,
    "distinct_flags": distinct_flags,
    "agg_count": agg_count,
    "agg_stats": agg_stats,
    "agg_count_distinct": agg_count_distinct,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_approx_distinct_error": agg_approx_distinct_error,
    "agg_hll_sketch_union": agg_hll_sketch_union,
    "agg_hll_rollup_merge": agg_hll_rollup_merge,
    "agg_kll_quantile_merge": agg_kll_quantile_merge,
    "agg_kll_rollup_merge": agg_kll_rollup_merge,
    "agg_theta_set_ops": agg_theta_set_ops,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_filtered": agg_filtered,
    "agg_collect": agg_collect,
    "agg_statistical": agg_statistical,
    "agg_percentiles": agg_percentiles,
    "agg_approx_percentile_error": agg_approx_percentile_error,
    "fn_regex": fn_regex,
    "fn_bitwise": fn_bitwise,
    "fn_string": fn_string,
    "fn_datetime": fn_datetime,
    "fn_math": fn_math,
    "fn_array": fn_array,
    "fn_map": fn_map,
    "fn_json": fn_json,
    "fn_conditional": fn_conditional,
    "subquery_exists": subquery_exists,
    "subquery_scalar": subquery_scalar,
    "pivot_linestatus": pivot_linestatus,
    "unpivot_measures": unpivot_measures,
    "sql_recursive_chain": sql_recursive_chain,
    "fn_variant": fn_variant,
    "skyline_orders": skyline_orders,
    "skyline_per_segment": skyline_per_segment,
    "agg_boolean": agg_boolean,
}
