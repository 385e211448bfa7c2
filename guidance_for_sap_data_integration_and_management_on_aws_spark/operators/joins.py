"""Join operators J1-J9 (SURVEY.md §2.3).

The reference has no joins (its only dataflow is the single-table RFC
pipeline, /root/reference/pyrfc_read_table/pyrfc_read_table.py:56-85); this
is the declared analytics surface over the lake the guidance produces.

Scale notes (100 TB):
* dimension joins broadcast (region/nation/supplier stay small at any SF);
* fact-fact joins shuffle on the join key — Catalyst picks sort-merge, AQE
  splits skewed partitions;
* the as-of join is a single-shuffle union+window composition (no row
  explosion, no driver collect), the standard scalable formulation when the
  engine lacks a native ASOF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, parallelize_small_scan
from ..functions.exprs import SQL_DISC_PRICE, disc_price, sql_sum_money, sum_money
from ..registry import QuerySpec, spec

# ---------------------------------------------------------------------------
# J1-J7: the standard join zoo
# ---------------------------------------------------------------------------


@spec(
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 250000.0
    """,
    doc="J1 inner equi-join (sort-merge / AQE-selected).",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@spec(
    """
    SELECT n_name, r_name, COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name ORDER BY n_name
    """,
    doc="J2 broadcast hash join: explicit broadcast() of the small dims.",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .orderBy("n_name")
    )


@spec(
    """
    SELECT l_orderkey, l_linenumber, p_name
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    """,
    doc="J3 shuffled hash join via hint (same result as J1; different physical plan).",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") > 40).hint("shuffle_hash")
    return li.join(p, li.l_partkey == p.p_partkey).select("l_orderkey", "l_linenumber", "p_name")


@spec(
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000.0
    """,
    doc="J4 left outer join with a non-key condition (null-extended rows preserved).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000.0)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@spec(
    """
    SELECT e.user_id AS uk, c.c_custkey AS ck, c.c_name
    FROM (SELECT DISTINCT user_id FROM events) e
    FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 300) c
      ON e.user_id = c.c_custkey
    """,
    doc="J4 full outer join.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id").distinct()
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name")
    )
    return e.join(c, e.user_id == c.c_custkey, "full").select(
        F.col("user_id").alias("uk"), F.col("c_custkey").alias("ck"), "c_name"
    )


@spec(
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="J5 left semi join.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@spec(
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J6 left anti join.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@spec(
    """
    SELECT n_name, r_name
    FROM nation CROSS JOIN region
    WHERE n_regionkey <> r_regionkey
    """,
    doc="J7 cross join + theta (non-equi) predicate.",
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.crossJoin(r).filter(F.col("n_regionkey") != F.col("r_regionkey")).select(
        "n_name", "r_name"
    )


@spec(
    """
    SELECT b.band_id, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM lineitem l
    JOIN (VALUES (0, 0.0, 20000.0), (1, 20000.0, 45000.0), (2, 45000.0, 70000.0),
                 (3, 70000.0, 120000.0)) AS b(band_id, lo, hi)
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band_id ORDER BY b.band_id
    """,
    doc="J8 range/interval join: broadcast nested-loop against a small band table "
    "(the scalable strategy: broadcast the interval side, never shuffle the fact).",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0, 0.0, 20000.0), (1, 20000.0, 45000.0), (2, 45000.0, 70000.0), (3, 70000.0, 120000.0)],
        "band_id INT, lo DOUBLE, hi DOUBLE",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("band_id")
    )


# ---------------------------------------------------------------------------
# J9: as-of join.  Spark has no native ASOF (as of 4.x) — composition below.
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` for the same key (nulls if none).

    Single-shuffle union+window formulation: tag both sides, sort within key
    by (time, tag) and carry the latest right payload forward with
    ``last(ignorenulls=True)``.  Right rows sort before left rows at equal
    times (tag 0 < 1), so an exactly-simultaneous right row matches.
    Scales: one exchange on the key, sort-merge within partitions, no row
    explosion (vs. the naive range-join + row_number which explodes on long
    histories).
    """
    lcols = left.columns
    r2 = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l2 = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols],
        *[F.col(c) for c in lcols],
    )
    u = r2.unionByName(l2)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}") for c in payload_cols]
    )
    return filled.filter(F.col("__tag") == 1).select(
        *lcols, *[F.col(f"__asof_{c}").alias(c) for c in payload_cols]
    )


@spec(
    """
    WITH od AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           od.o_orderkey AS last_orderkey,
           CAST(od.o_orderdate AS DATE) AS last_orderdate
    FROM events e
    ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    """,
    doc="J9 as-of join: latest order per user at event time; oracle is DuckDB's "
    "native ASOF JOIN (independent implementation check). Orders deduped to one "
    "per (custkey, date) so the match is deterministic.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").cast("date").alias("last_orderdate"),
    )


@spec(
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-mitigated equi-join, driver-visible: events->customer through "
    "salted_join (deterministic per-row salt on the fact side, dim "
    "replicated once per salt, join key widened to (key, salt)), then "
    "per-segment totals.  Salting is VALUE-NEUTRAL — the oracle is the "
    "plain join — while spreading any hot key over n_salts reducers before "
    "the shuffle, the explicit pre-shuffle twin of AQE's skew-join split "
    "(SURVEY §4 'salting for skew'; mechanics also unit-tested in "
    "tests/test_skew.py).",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "value")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, "user_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


IVAL_DAYS = 30  # interval length AND band width (each interval spans <= 2 bands)


@spec(
    f"""
    WITH a AS (SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS s,
                      CAST(o_orderdate AS DATE) + {IVAL_DAYS} AS e
               FROM orders WHERE o_orderkey % 50 = 0),
    b AS (SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS s,
                 CAST(o_orderdate AS DATE) + {IVAL_DAYS} AS e
          FROM orders WHERE o_orderkey % 77 = 0)
    SELECT a.a_key, b.b_key,
           CAST(date_diff('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)) AS BIGINT)
             AS overlap_days
    FROM a JOIN b ON a.s < b.e AND b.s < a.e
    """,
    doc="J8+ INTERVAL-OVERLAP join ([s, e) x [s, e), the shape J8's "
    "point-in-band broadcast cannot cover when BOTH sides are large): each "
    f"interval explodes to the {IVAL_DAYS}-day band(s) it touches (<= 2 "
    "here since interval length == band width), the join is an EQUI-join "
    "on the band id with the exact overlap predicate as a residual, and "
    "pairs that meet in two bands dedup once.  At 100 TB both sides "
    "shuffle by band — never a cross product; band width tunes the "
    "duplication-vs-selectivity tradeoff exactly like LSH banding.  The "
    "oracle is the direct nested-loop formulation, so the banded rewrite "
    "is checked value-for-value against the naive semantics.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")

    def side(mod: int, key_alias: str) -> DataFrame:
        return o.filter(F.col("o_orderkey") % mod == 0).select(
            F.col("o_orderkey").alias(key_alias),
            od.alias("s"),
            F.date_add(od, IVAL_DAYS).alias("e"),
        )

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        day = F.datediff(F.col("s"), F.lit("1970-01-01").cast("date"))
        end_day = F.datediff(F.col("e"), F.lit("1970-01-01").cast("date"))
        bands = F.sequence(
            F.floor(day / IVAL_DAYS), F.floor((end_day - 1) / IVAL_DAYS)
        )
        return df.select(
            F.col(f"{prefix}_key"),
            F.col("s").alias(f"{prefix}_s"),
            F.col("e").alias(f"{prefix}_e"),
            F.explode(bands).alias("band"),
        )

    a = banded(side(50, "a_key"), "a")
    b = banded(side(77, "b_key"), "b")
    pairs = (
        a.join(b, "band")
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .dropDuplicates(["a_key", "b_key"])
    )
    return pairs.select(
        "a_key",
        "b_key",
        F.datediff(
            F.least("a_e", "b_e"), F.greatest("a_s", "b_s")
        ).cast("bigint").alias("overlap_days"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction (the runtime-filter pattern Spark's
# InjectRuntimeFilter applies automatically when statistics allow; built
# explicitly here so the reduction is deterministic and plan-visible)
# ---------------------------------------------------------------------------

BLOOM_WORDS = 4096  # 2^18 bits in 64-bit words: a 32 KB task-closure bitmap
BLOOM_BITS = BLOOM_WORDS * 64
BLOOM_K = 3  # hash probes per key


def bloom_build(keys: DataFrame, col: str) -> list[int]:
    """Aggregate a Bloom bitmap over ``keys[col]`` as BLOOM_WORDS 64-bit
    words: each key sets BLOOM_K bits (seeded xxhash64 positions); words
    merge with bit_or — a single narrow aggregation whose output is BOUNDED
    (BLOOM_WORDS rows) regardless of key count, so the driver collect stays
    32 KB at any corpus size."""
    pos = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(s), F.col(col)), F.lit(BLOOM_BITS))
            for s in range(BLOOM_K)
        ]
    )
    rows = (
        keys.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # call_function: the DataFrame shiftleft binding only takes a
            # Python-int shift; the SQL function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    words = [0] * BLOOM_WORDS
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(words: list[int], key: F.Column) -> F.Column:
    """Pure-expression Bloom probe: all BLOOM_K bit positions set.  The
    bitmap rides as ONE array literal (no join, no broadcast variable), so
    the predicate evaluates scan-side inside whole-stage codegen.

    The literal is built as ONE SQL `array(...)` parse instead of
    ``F.lit(words)``: PySpark's lit() on a Python list issues one py4j
    round-trip per element, which at BLOOM_WORDS=4096 words costs 2.4-4.5 s
    of DRIVER time per query build (measured r15; the single parse is
    ~7 ms, 340x less).  Catalyst constant-folds both forms to the same
    ArrayType(LongType) literal, so the executed plan — and the result —
    is unchanged."""
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    return _bloom_probe(arr, key)


def _bloom_probe(arr: F.Column, key: F.Column) -> F.Column:
    """The probe arithmetic over a prebuilt bitmap-array column — factored
    out so tests can assert the SQL-text literal above probes identically
    to an ``F.lit(words)``-built literal (r15 advice: the f"{w}L" rendering
    of negative / Long.MinValue words is parser-facing surface)."""
    cond = F.lit(True)
    for s in range(BLOOM_K):
        p = F.pmod(F.xxhash64(F.lit(s), key), F.lit(BLOOM_BITS))
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


@spec(
    f"""
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_sum_money(SQL_DISC_PRICE, 'revenue')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY month
    """,
    doc="J1+ BLOOM-PREFILTERED join (explicit runtime-filter/semi-join "
    "reduction): urgent orders build a fixed 32 KB Bloom bitmap (one "
    "bounded aggregation, never a per-key collect), the LINEITEM scan "
    "drops non-matching rows INSIDE its scan stage via a pure-expression "
    "probe, and only survivors reach the join shuffle.  False positives "
    "are eliminated by the residual exact equi-join, so the rewrite is "
    "semantics-transparent and the oracle is the plain join.  At 100 TB "
    "this is the difference between shuffling the whole fact table and "
    "shuffling the ~1/5 that can match — the hand-built form of Spark's "
    "InjectRuntimeFilter, deterministic and plan-locked "
    "(tests/test_plans.py: the probe sits below the join Exchange).  Cost "
    "threshold (why engines gate runtime filters on size estimates): the "
    "probe costs ~3 hashes/row, which only pays when the avoided shuffle "
    "is large — at fixture scale the demo costs more than it saves, by "
    "design the same breakeven InjectRuntimeFilter's heuristics encode.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    words = bloom_build(o, "o_orderkey")
    li = load(spark, sf_dir, "lineitem").filter(
        bloom_might_contain(words, F.col("l_orderkey"))
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        sum_money(disc_price(), "revenue"),
    )


@spec(
    """
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           a.c_name AS name_a, b.c_name AS name_b
    FROM customer a JOIN customer b
      ON length(a.c_name) = length(b.c_name) AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="FUZZY (edit-distance) SELF-JOIN via deletion-neighborhood blocking "
    "(the SymSpell scheme): each name emits its |s| one-character-deletion "
    "signatures keyed by (position, signature); two same-length names within "
    "edit distance 1 differ in exactly one position (a length-preserving "
    "single edit must be a substitution), so they share the deletion "
    "signature at that position — the blocking is LOSSLESS and the naive "
    "quadratic oracle is exact.  Scale: the signature expansion is linear "
    "(|s| rows per name), candidates come from an equi-join on the signature "
    "key whose block sizes are alphabet-bounded, and the verify filter runs "
    "only on candidates — no all-pairs product at any corpus size (the "
    "pattern entity-resolution pipelines use for name/address matching).  "
    "Half-segment PassJoin blocking was rejected: shared prefixes "
    "('Customer#...') would collapse it to one giant block.",
)
def join_fuzzy_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # signature explode + join are the CPU cost: spread the one-file fixture
    # scan across the shuffle width (no-op at production split counts)
    c = parallelize_small_scan(
        load(spark, sf_dir, "customer").select("c_custkey", "c_name"), "c_custkey"
    )
    sigs = c.select(
        "c_custkey",
        "c_name",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(c_name)),"
                " i -> concat(substring(c_name, 1, i - 1), substring(c_name, i + 1)))"
            )
        ).alias("pos", "sig"),
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return cands.filter(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1)


ASOF_TOL_DAYS = 7  # staleness horizon for the tolerance variant


@spec(
    f"""
    WITH od AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    j AS (
      SELECT e.event_id, e.user_id, e.ts,
             od.o_orderkey, od.o_orderdate
      FROM events e
      ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    )
    SELECT event_id, user_id,
           CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE))
                     <= {ASOF_TOL_DAYS}
                THEN o_orderkey END AS last_orderkey,
           CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE))
                     <= {ASOF_TOL_DAYS}
                THEN CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                    CAST(ts AS DATE)) AS BIGINT)
           END AS days_stale
    FROM j
    """,
    doc="J9+ AS-OF JOIN WITH TOLERANCE (the pandas merge_asof(tolerance=...) "
    f"/ kdb wj contract): the latest order per user at event time counts "
    f"only when it is at most {ASOF_TOL_DAYS} days old — older matches "
    "null out, the staleness-horizon rule every feature-store lookup "
    "applies so a years-old record can never leak into a training row.  "
    "Same single-shuffle union+window kernel as join_asof (the tolerance "
    "is a post-fill expression, zero extra exchanges); oracle = DuckDB's "
    "native ASOF JOIN with the same CASE applied on top.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    j = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    stale = F.datediff(F.to_date("ts"), F.col("o_orderdate").cast("date"))
    fresh = stale <= ASOF_TOL_DAYS
    return j.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("o_orderkey")).alias("last_orderkey"),
        F.when(fresh, stale.cast("bigint")).alias("days_stale"),
    )


QUERIES: dict[str, QuerySpec] = {
    "join_asof_tolerance": join_asof_tolerance,
    "join_salted_skew": join_salted_skew,
    "join_fuzzy_neighbors": join_fuzzy_neighbors,
    "join_inner": join_inner,
    "join_broadcast": join_broadcast,
    "join_shuffle_hash": join_shuffle_hash,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_cross_theta": join_cross_theta,
    "join_range_bands": join_range_bands,
    "join_interval_overlap": join_interval_overlap,
    "join_bloom_prefilter": join_bloom_prefilter,
    "join_asof": join_asof,
}

# ---------------------------------------------------------------------------
# Skew mitigation: salted join (SURVEY "salting for skew"; AQE's skew-join
# split is the automatic path — this is the explicit one for keys so hot a
# single salt range must be spread *before* the shuffle).
# ---------------------------------------------------------------------------


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the fact side's hot keys would skew the shuffle:
    the fact side gets a deterministic per-row salt in [0, n_salts), the dim
    side is replicated once per salt, and the join key becomes (key, salt) —
    spreading each hot key over ``n_salts`` reducers.  Dim replication costs
    n_salts x |dim|, so use it for dimension-sized right sides only; for
    fact-fact skew prefer AQE's skew-join splitting (enabled in session.py).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")

