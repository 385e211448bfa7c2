"""Scaling-law tests for the bucketed similarity paths.

r03 measurement: at 10x the corpus with sign-LSH bits PINNED, ann_lsh_topk
cost ~28x and dedup_embedding_cosine ~14x — within-bucket pairwise work is
Sum_b n_b^2 ~ n^2 / 2^bits, i.e. QUADRATIC once bucket count stops scaling.
The knob is `auto_sign_bits`: hold expected occupancy constant and the total
pairwise work is O(n x occupancy), linear.

Work is asserted as candidate-pair COUNTS (pure aggregation over bucket
occupancies — deterministic and cheap), never wall-clock.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
from guidance_for_sap_data_integration_and_management_on_aws_spark.functions.vector import (
    as_double,
    sign_bucket,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.dedup import (
    embedding_near_dup_pairs,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.similarity import (
    auto_sign_bits,
)


def _vectors(spark, sf_dir, copies: int = 1):
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    if copies == 1:
        return v
    mx = v.agg(F.max("vec_id")).first()[0] + 1
    out = v
    for i in range(1, copies):
        out = out.unionByName(v.withColumn("vec_id", F.col("vec_id") + F.lit(i * mx)))
    return out


def _pair_work(v, bits: int) -> int:
    """Within-bucket ordered candidate pairs = Sum_b n_b * (n_b - 1)."""
    occ = (
        v.select(sign_bucket(F.col("e"), bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return occ.agg(F.sum(F.col("n") * (F.col("n") - 1))).first()[0]


def test_pinned_bits_go_quadratic_adaptive_bits_stay_linear(spark, sf_dir):
    v1 = _vectors(spark, sf_dir)
    n1 = v1.count()
    v10 = _vectors(spark, sf_dir, copies=10)
    w1 = _pair_work(v1, 4)

    # pinned bits: 10x data -> ~100x pair work (quadratic; exact-duplicate
    # copies share buckets at any resolution, so the blowup is full-strength)
    w10_pinned = _pair_work(v10, 4)
    assert w10_pinned > 50 * w1

    # adaptive bits targeting the SAME occupancy the 1x corpus had at 4 bits:
    # per-vector candidate work stays within ~2x of the 1x figure, i.e. total
    # work scales ~linearly.  (The floor is the 10 exact copies of each
    # vector, which genuinely belong together in any near-dup blocking.)
    bits10 = auto_sign_bits(10 * n1, target=max(n1 // 16, 1))
    assert bits10 > 4
    w10_adaptive = _pair_work(v10, bits10)
    assert w10_adaptive / (10 * n1) <= 2 * max(w1 / n1, 9)


def test_fixed_k_codebook_constant_across_corpus_scale(spark, sf_dir):
    """r5 verdict #1: IVF centroid / PQ codebook cardinality must NOT grow
    with the corpus (the old vec_id %% 61 rule made k ~ n/61 — a quadratic
    assignment cost and an unbounded driver collect at 100x).  The fixed-k
    md5-ordered sample keeps the collect at exactly k rows at any scale, and
    assignment cost O(n*k*d) linear in n."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.similarity import (
        IVF_K,
        PQ_CB_K,
        _pq_codebook,
        seed_vectors,
    )

    v1 = _vectors(spark, sf_dir)
    v10 = _vectors(spark, sf_dir, copies=10)
    assert seed_vectors(v1, IVF_K).count() == IVF_K
    assert seed_vectors(v10, IVF_K).count() == IVF_K  # constant at 10x
    assert _pq_codebook(spark, v1, sf_dir + '#x1').shape[0] == PQ_CB_K
    assert _pq_codebook(spark, v10, sf_dir + '#x10').shape[0] == PQ_CB_K  # constant at 10x
    # deterministic: the digest-ordered sample is a pure function of vec_ids
    s1 = sorted(r["cid"] for r in seed_vectors(v1, IVF_K).collect())
    assert s1 == sorted(r["cid"] for r in seed_vectors(v1, IVF_K).collect())


def test_more_bits_yield_subset_of_pairs(spark, sf_dir):
    """Raising the resolution only SPLITS buckets (each bit subdivides), so
    the adaptive path returns a subset of the pinned-bits pairs — the
    recall/cost tradeoff is one-sided, never wrong-answers."""
    v = _vectors(spark, sf_dir)
    p4 = {
        (r["va"], r["vb"])
        for r in embedding_near_dup_pairs(v, bits=4, threshold=0.30).collect()
    }
    p8 = {
        (r["va"], r["vb"])
        for r in embedding_near_dup_pairs(v, bits=8, threshold=0.30).collect()
    }
    assert p8 <= p4
    assert p8  # the exact-dup structure keeps plenty of pairs co-bucketed


def test_interval_band_candidates_linear_in_time_extent(spark, sf_dir):
    """join_interval_overlap's scale claim (r5 verdict item 6): candidate
    volume is Sum_band n_a(b) * n_b(b).  10x the data spread over 10x the
    time extent (same density) must yield ~10x the candidates — linear —
    and every interval must touch <= 2 bands (the duplication bound that
    keeps the banded shuffle narrow)."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.joins import (
        IVAL_DAYS,
    )

    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    base = o.select(F.col("o_orderkey").alias("k"), od.alias("s"))
    raw_span = base.agg(
        (F.datediff(F.max("s"), F.min("s")) + IVAL_DAYS + 1).alias("d")
    ).first()["d"]
    # band-aligned shift: copies tile onto disjoint band ranges, so the
    # 10x-extent candidate count is EXACTLY 10x (no cross-copy band sharing)
    span = ((raw_span // IVAL_DAYS) + 2) * IVAL_DAYS

    def extent_copies(n: int):
        # k is kept verbatim (it drives the %50 / %77 side membership, so
        # every copy must contribute the identical A/B composition); only
        # the dates shift
        out = base
        for i in range(1, n):
            out = out.unionByName(base.select("k", F.date_add("s", i * span).alias("s")))
        return out.withColumn("e", F.date_add("s", IVAL_DAYS))

    def candidates(df) -> tuple[int, int]:
        day = F.datediff(F.col("s"), F.lit("1970-01-01").cast("date"))
        end_day = F.datediff(F.col("e"), F.lit("1970-01-01").cast("date"))
        bands = F.sequence(F.floor(day / IVAL_DAYS), F.floor((end_day - 1) / IVAL_DAYS))
        banded = df.select("k", F.size(bands).alias("nb"), F.explode(bands).alias("band"))
        max_bands = banded.agg(F.max("nb")).first()[0]
        na = banded.filter(F.col("k") % 50 == 0).groupBy("band").agg(F.count(F.lit(1)).alias("na"))
        nb_ = banded.filter(F.col("k") % 77 == 0).groupBy("band").agg(F.count(F.lit(1)).alias("nb_"))
        tot = na.join(nb_, "band").agg(F.sum(F.col("na") * F.col("nb_"))).first()[0] or 0
        return int(tot), int(max_bands)

    c1, mb1 = candidates(extent_copies(1))
    c10, mb10 = candidates(extent_copies(10))
    assert mb1 <= 2 and mb10 <= 2  # duplication bound: length == band width
    assert c1 > 0
    # linear in extent: 10 disjoint copies -> exactly 10x (no cross-copy bands)
    assert c10 == 10 * c1


def test_incremental_dedup_shuffles_only_the_batch(spark, sf_dir):
    """dedup_incremental's scale claim: the corpus side is bucketed storage
    and contributes ZERO Exchange; scaling the corpus 10x must not add a
    single Exchange to the plan (only the batch side shuffles, and the
    batch is unchanged)."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import (
        scratch_table,
    )

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("norm_key")
    )
    batch = d.filter(F.col("doc_id") % 5 == 0)
    mx = d.agg(F.max("doc_id")).first()[0] + 1

    def plan_exchanges(copies: int) -> int:
        corpus = d.filter(F.col("doc_id") % 5 != 0)
        grown = corpus
        for i in range(1, copies):
            grown = grown.unionByName(
                corpus.select(
                    (F.col("doc_id") + i * mx).alias("doc_id"),
                    F.md5(F.concat(F.lit(str(i)), "norm_key")).alias("norm_key"),
                )
            )
        tbl = scratch_table(spark, f"scale_corpus_{copies}x", sf_dir)
        grown.write.bucketBy(8, "norm_key").sortBy("norm_key").mode(
            "overwrite"
        ).saveAsTable(tbl)
        joined = batch.join(spark.table(tbl).select("norm_key"), "norm_key", "left_anti")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    e1 = plan_exchanges(1)
    e10 = plan_exchanges(10)
    assert e1 == e10  # corpus growth adds no shuffle
    assert e1 <= 1  # at most the batch-side exchange


def test_fuzzy_join_candidates_linear_in_corpus(spark, sf_dir):
    """join_fuzzy_neighbors' scale claim: deletion-signature blocking keeps
    candidate volume LINEAR in the corpus.  Signature rows are exactly
    n x |name| (linear by construction); the candidate count is
    Sum_key n_k*(n_k-1)/2 over (pos, sig) blocks, whose block sizes are
    alphabet-bounded — growing the corpus 10x (disjoint id ranges) must
    grow candidates ~10x, not 100x."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    mx = c.agg(F.max("c_custkey")).first()[0] + 1

    def candidates(copies: int) -> int:
        grown = c
        for i in range(1, copies):
            # fresh disjoint id range -> fresh names, same distribution
            grown = grown.unionByName(
                c.select(
                    (F.col("c_custkey") + i * mx).alias("c_custkey"),
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad((F.col("c_custkey") + i * mx).cast("string"), 9, "0"),
                    ).alias("c_name"),
                )
            )
        sigs = grown.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(1, length(c_name)),"
                    " i -> concat(substring(c_name, 1, i - 1), substring(c_name, i + 1)))"
                )
            ).alias("pos", "sig")
        )
        occ = sigs.groupBy("pos", "sig").agg(F.count(F.lit(1)).alias("n"))
        return occ.agg(F.sum(F.col("n") * (F.col("n") - 1))).first()[0] // 2

    n1 = c.count()
    c1 = candidates(1)
    c10 = candidates(10)
    # the alphabet bound: a block at (pos, sig) holds only strings agreeing
    # everywhere but pos, so block size <= |digit alphabet| = 10 and each
    # string has <= 9 candidates per position -> candidates <= n * 9 * L / 2.
    # That is the LINEAR law (denser id spaces saturate toward it, which is
    # why a naive c10 <= 10*c1 check fails at tiny n); quadratic blocking
    # would be ~n^2/2 per shared-prefix block, orders of magnitude above.
    L = len("Customer#000000000")
    for n, cand in ((n1, c1), (10 * n1, c10)):
        assert cand <= n * 9 * L / 2, (n, cand)
    assert c10 < (10 * n1) ** 2 / 20  # nowhere near the all-pairs regime


def test_incremental_topk_work_independent_of_corpus(spark, sf_dir):
    """ann_incremental_topk's scale claim: the per-tick MERGE INPUT is
    |Q| x (k + |batch|) rows, INDEPENDENT of the old-corpus size — the old
    corpus contributes only its maintained top-k state, never a rescore.
    Measured (not assumed): replicate the builder's stages, grow the old
    corpus 10x with the batch unchanged, and Spark-count the rows entering
    the final top-k merge at both sizes.  Fails if the served state ever
    scales with the corpus (e.g. topk returning more than k per query) or
    if batch scoring picks up corpus-sized input."""
    from pyspark.sql import Window

    from guidance_for_sap_data_integration_and_management_on_aws_spark.functions.vector import cosine
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.similarity import (
        INC_K,
        INC_MOD,
        N_QUERIES,
    )

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("e")
    )
    batch = v.filter(F.col("vec_id") % INC_MOD == 0)
    q = v.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("vec_id") % INC_MOD != 0)
    ).select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"))
    mx = v.agg(F.max("vec_id")).first()[0] + 1
    # NB: grown ids do NOT preserve % INC_MOD residues (grow_off ≡ 1 mod
    # INC_MOD shifts copy i's residues by i) — harmless here because the
    # old partition is filtered BEFORE growing, so nothing re-derives
    # batch/old membership from the grown frame's residues
    grow_off = mx * INC_MOD + 1

    def score(side):
        return (
            F.broadcast(q)
            .join(side, F.col("qid") != F.col("vec_id"))
            .select("qid", F.col("vec_id").alias("neighbor_id"),
                    F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cos_sim"))
        )

    def topk(scored):
        w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= INC_K)
            .drop("__rn")
        )

    def merge_input_rows(copies: int) -> int:
        old = v.filter(F.col("vec_id") % INC_MOD != 0)
        for i in range(1, copies):
            old = old.unionByName(
                v.filter(F.col("vec_id") % INC_MOD != 0).withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * grow_off)
                )
            )
        served = topk(score(old))  # the maintained state: |Q| x k rows
        return served.unionAll(score(batch)).count()

    n1 = merge_input_rows(1)
    n10 = merge_input_rows(10)
    q_n, batch_n = q.count(), batch.count()
    assert q_n > 0 and batch_n > 0
    assert n1 == q_n * (INC_K + batch_n)
    assert n10 == n1  # 10x old corpus: identical per-tick merge volume


def test_snapshot_diff_join_input_scales_with_dirty_buckets(spark, sf_dir):
    """lake_snapshot_diff's scale claim: the row-level diff join reads only
    rows in DIRTY buckets.  The registered fixture rules change ~3% of keys
    (dense enough to dirty most of 256 buckets), so measure the claim with
    a SPARSE change set: restate one key in ~2000.  Dirty buckets must be a
    small fraction of 256 and the gated row count a small fraction of the
    table — fails if the gate ever degrades to a full-table join."""
    a = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sparse = 1999
    b = a.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % sparse == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")),
    )
    bucket = F.pmod(F.xxhash64("o_orderkey"), F.lit(256))

    def digests(df):
        fp = F.xxhash64("o_orderkey", "o_totalprice")
        return df.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(fp).alias("digest")
        )

    da = digests(a).withColumnRenamed("digest", "ha").withColumnRenamed("n", "na")
    db = digests(b).withColumnRenamed("digest", "hb").withColumnRenamed("n", "nb")
    dirty = (
        da.join(db, "bucket", "full")
        .filter((F.col("ha") != F.col("hb")) | (F.col("na") != F.col("nb")))
        .select("bucket")
    )
    total = a.count()
    n_changed = a.filter(F.col("o_orderkey") % sparse == 0).count()
    n_dirty = dirty.count()
    gated = a.withColumn("bucket", bucket).join(dirty, "bucket").count()
    # every change dirties at most one bucket; the gate reads only those
    assert n_dirty <= n_changed
    assert n_dirty < 256 / 4, (n_dirty, n_changed)
    assert gated <= total * (n_dirty / 256) * 2 + 64, (gated, total, n_dirty)


def test_zorder_interleave_matches_reference_bijection():
    """The shared shift-or-mask constants must implement an exact 16+16 -> 32
    bit Morton interleave: cross-check the SQL formula (DuckDB evaluation,
    the oracle's engine) against a bit-by-bit Python reference, and invert
    it by bit de-interleave to prove no information is lost."""
    import random

    import duckdb

    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.ingest import (
        _sql_spread16,
    )

    def ref_interleave(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = random.Random(7)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    # beyond the 16-bit domain the kernel must CLAMP (mask) first — before
    # the round-7 fix, bit 16+ garbage OR'd into kept lanes identically on
    # both engines, invisible to the parity gate
    pts += [(1 << 16, 0), (65536 + 5, 7), ((1 << 20) + 3, (1 << 17) + 9)]
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    got = con.execute(
        f"SELECT x, y, ({_sql_spread16('x')} | ({_sql_spread16('y')} << 1)) FROM pts"
    ).fetchall()
    for x, y, z in got:
        assert z == ref_interleave(x, y), (x, y, z)
        # de-interleave inverts onto the clamped domain: even bits -> x,
        # odd bits -> y (ref_interleave reads only bits 0-15, so it IS the
        # masked reference)
        xx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        yy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (xx, yy) == (x & 0xFFFF, y & 0xFFFF)


def _docs(spark, sf_dir, copies: int = 1):
    d = load(spark, sf_dir, "documents")
    if copies == 1:
        return d
    mx = d.agg(F.max("doc_id")).first()[0] + 1
    out = d
    for i in range(1, copies):
        out = out.unionByName(d.withColumn("doc_id", F.col("doc_id") + F.lit(i * mx)))
    return out


def test_distributed_rank_driver_state_constant_across_scale(spark, sf_dir):
    """The rank kernel's only driver-side state is the per-partition offset
    list — bounded by _rank_parts(spark) at ANY input size (the r5 fixed-k
    lesson applied to ranking): at 10x the rows the broadcast frame is the
    same <= min(max(8, defaultParallelism), 2048) rows, and ranks stay an
    exact permutation of 1..n."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
        _RANK_PARTS_CAP,
        SKEW_RANK_PARTS,
        _rank_parts,
        distributed_rank,
    )

    o1 = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    mx = o1.agg(F.max("o_orderkey")).first()[0] + 1
    o10 = o1
    for i in range(1, 10):
        o10 = o10.unionByName(
            o1.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * mx))
        )
    for frame in (o1, o10):
        n = frame.count()
        ranked = distributed_rank(frame, ["o_totalprice", "o_orderkey"], out="i")
        stats = ranked.agg(
            F.min("i"), F.max("i"), F.count(F.lit(1)), F.countDistinct("i")
        ).first()
        assert tuple(stats) == (1, n, n, n)
        # the driver collect inside the kernel is the offset list only:
        # structurally bounded by the parallelism-derived constant (floor 8,
        # cap 2048), not the data
        parts = _rank_parts(spark)
        assert SKEW_RANK_PARTS <= parts <= _RANK_PARTS_CAP
        assert parts == min(
            max(8, spark.sparkContext.defaultParallelism), _RANK_PARTS_CAP
        )


def test_oov_vocab_broadcast_constant_across_corpus_scale(spark, sf_dir):
    """The OOV audit's broadcast side is the top-N vocabulary CUT — exactly
    OOV_VOCAB_N rows (or the distinct-word count if smaller) at 1x and at
    10x the corpus; the full token stream is never collected or shuffled
    for membership."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.text import (
        OOV_VOCAB_N,
    )

    for copies in (1, 10):
        d = _docs(spark, sf_dir, copies)
        e = d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        n_words = e.select("word").distinct().count()
        cut = (
            e.groupBy("word")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("word"))
            .limit(OOV_VOCAB_N)
            .count()
        )
        assert cut == min(OOV_VOCAB_N, n_words)


def test_negative_sampling_output_independent_of_corpus(spark, sf_dir):
    """Drawn negatives scale with anchors x quota, NOT the corpus: a 10x
    corpus yields the same per-anchor draw count (and the same TOTAL row
    count), because the per-anchor partial-limit window truncates at
    NEG_PER_QUERY whatever the candidate volume."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.similarity import (
        NEG_PER_QUERY,
        N_QUERIES,
        ann_negative_sampling,
    )
    from pyspark.sql import Window

    base = ann_negative_sampling.builder(spark, sf_dir)
    assert base.count() == N_QUERIES * NEG_PER_QUERY
    # 10x corpus, same anchors (vec_id < N_QUERIES unchanged by the shift)
    v = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    mx = v.agg(F.max("vec_id")).first()[0] + 1
    v10 = v
    for i in range(1, 10):
        v10 = v10.unionByName(v.withColumn("vec_id", F.col("vec_id") + F.lit(i * mx)))
    q = v10.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    h = F.md5(
        F.concat(F.col("qid").cast("string"), F.lit("_"), F.col("vec_id").cast("string"))
    )
    cand = F.broadcast(q).join(v10, F.col("label") != F.col("qlabel")).select(
        "qid", h.alias("h"), F.col("vec_id").alias("neg_id")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("h"), F.asc("neg_id"))
    out10 = cand.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= NEG_PER_QUERY
    )
    assert out10.count() == N_QUERIES * NEG_PER_QUERY


def test_ewma_frame_bounded_at_any_stream_length(spark, sf_dir):
    """The per-row collected frame is capped at EWMA_SPAN values however
    long the stream — the window is ROWS-bounded, so shuffle width and
    per-row fold cost are constants."""
    from pyspark.sql import Window
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.windows import (
        EWMA_SPAN,
    )

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), Window.currentRow)
    )
    mx = (
        ev.select(F.size(F.collect_list("value").over(w)).alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert mx <= EWMA_SPAN


def test_sketch_rollup_fact_table_constant_across_corpus_scale(spark, sf_dir):
    """D34's scale claim: the rollup-merge sketch fact table has one row per
    (event_type, day) CELL, so its size — and every super-aggregate level's
    merge input — is fixed by the key domain, independent of corpus rows.
    10x the events (replicated with shifted user ids so distinct counts
    genuinely grow) must leave the cell count unchanged while the leaf
    cells keep absorbing rows into the same fixed 4 KB sketch buffers."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    mx = ev.agg(F.max("user_id")).first()[0] + 1
    ev10 = ev
    for i in range(1, 10):
        ev10 = ev10.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * mx))
        )

    def cells(frame):
        return (
            frame.groupBy("event_type", "day")
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .count()
        )

    n1, n10 = cells(ev), cells(ev10)
    assert n1 == n10, (n1, n10)  # fact-table size = key domain, not corpus
    # and the merged grand total still tracks the (10x larger) truth
    est10 = (
        ev10.groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    exact10 = ev10.select("user_id").distinct().count()
    assert abs(est10 - exact10) / exact10 <= 0.05
