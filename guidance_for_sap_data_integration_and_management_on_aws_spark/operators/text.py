"""Text-analysis operators for training-data pipelines (SURVEY §2.9 L4 +
the mandated text ops: language-ID, quality scoring, token counting,
fingerprinting, SimHash).

All hot paths are built-in Catalyst expressions over the ``documents`` table
— split/explode/higher-order array functions, no Python in the row path — so
they scale to 100 TB of text: tokenization is per-row (no shuffle), the
per-word aggregations shuffle on high-cardinality keys, and fingerprints are
fixed-width per-doc reductions.

Cross-engine hashing uses md5 hex digits decoded positionally
(functions.exprs.md5_byte) so the DuckDB oracle computes bit-identical
values — engine-native hash() functions differ and would not be checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, materialize_if_wide, parallelize_small_scan
from ..functions.exprs import (
    md5_byte,
    md5_h16,
    md5_h32,
    sql_md5_byte,
    sql_md5_h16_from,
    sql_md5_h32_from,
)
from ..registry import QuerySpec, spec

# Tiny deterministic English stopword list for the n-gram/stopword heuristic.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def _words() -> Column:
    return F.split(F.col("text"), " ")


def _sql_stoplist() -> str:
    return "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


@spec(
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_bpe_ish
    FROM documents
    """,
    doc="L4 token counting: whitespace tokens + a BPE-ish regex token count.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)).alias("n_bpe_ish"),
    )


@spec(
    f"""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           CAST(n_chars AS DOUBLE) / len(w) AS avg_token_len,
           CAST(len(list_filter(w, x -> list_contains({_sql_stoplist()}, x))) AS DOUBLE)
             / len(w) AS stopword_ratio,
           CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
           (len(w) BETWEEN 20 AND 1000)
             AND (CAST(len(list_distinct(w)) AS DOUBLE) / len(w) > 0.1) AS quality_pass
    FROM t
    """,
    doc="L4 quality scoring: length / stopword / uniqueness ratios and a "
    "pass-fail gate (the usual pretraining-corpus filters).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = _words()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n = F.size(w)
    uniq = F.size(F.array_distinct(w))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (F.col("n_chars").cast("double") / n).alias("avg_token_len"),
        (
            F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double") / n
        ).alias("stopword_ratio"),
        (uniq.cast("double") / n).alias("uniq_ratio"),
        (n.between(20, 1000) & (uniq.cast("double") / n > 0.1)).alias("quality_pass"),
    )


@spec(
    f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id, lang,
           CAST(len(list_filter(w, x -> list_contains({_sql_stoplist()}, x))) AS DOUBLE)
             / len(w) AS en_stop_frac,
           CAST(len(list_filter(w, x -> list_contains({_sql_stoplist()}, x))) AS DOUBLE)
             / len(w) >= 0.08 AS pred_en
    FROM t
    """,
    doc="L4 language-ID heuristic: EN-stopword fraction thresholded "
    "(an n-gram/stopword heuristic — no external models in-container).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = _words()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    frac = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double") / F.size(w)
    return d.select(
        "doc_id",
        "lang",
        frac.alias("en_stop_frac"),
        (frac >= 0.08).alias("pred_en"),
    )


@spec(
    f"""
    WITH tok AS (
      SELECT doc_id, w, CAST(ord AS BIGINT) AS pos
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS ord
            FROM documents)
    )
    SELECT doc_id,
           CAST(SUM({sql_md5_byte('w', 0)} * ((pos % 31) + 1)) % 1000000007
                AS BIGINT) AS fingerprint
    FROM tok GROUP BY doc_id
    """,
    doc="L4 document fingerprint: position-weighted rolling hash over tokens "
    "(md5-byte token values so the oracle computes the identical fingerprint).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.posexplode(_words()).alias("pos0", "w")).select(
        "doc_id", F.col("w"), (F.col("pos0") + 1).cast("bigint").alias("pos")
    )
    val = md5_byte(F.col("w"), 0).cast("bigint")
    return tok.groupBy("doc_id").agg(
        (F.sum(val * ((F.col("pos") % 31) + 1)) % F.lit(1000000007)).alias("fingerprint")
    )


def _simhash_bits() -> int:
    return 16


@spec(
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    dig AS (SELECT doc_id, md5(w) AS m FROM tok),
    hv AS (SELECT doc_id, {sql_md5_h16_from('m')} AS h FROM dig),
    contrib AS (
      SELECT doc_id,
             {', '.join(
                 f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 "
                 f"THEN 1 ELSE -1 END) AS s{b}" for b in range(16)
             )}
      FROM hv GROUP BY doc_id
    )
    SELECT doc_id,
           {' + '.join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))}
             AS simhash
    FROM contrib
    """,
    doc="SimHash-16 fingerprint per document over distinct tokens — near-dup "
    "candidates share fingerprints.  Portable md5-derived bits (ONE digest "
    "per token: the 16 bits all come from conv(substring(md5(w),1,4),16,10), "
    "vs the two 2-digest byte extractions this replaces — the r3 verdict's "
    "2.5x cost flag); the oracle materializes the same single digest and "
    "decodes it positionally, so both engines compute the identical value.",
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_words()).alias("w")).distinct()
    hv = tok.select("doc_id", md5_h16(F.col("w")).alias("h"))
    sums = hv.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_simhash_bits())
        ]
    )
    fp = None
    for b in range(_simhash_bits()):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("bigint").alias("simhash"))


@spec(
    """
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    """,
    doc="U4-flavored corpus word count: one row in, many out (explode), then "
    "a high-cardinality-key aggregation — the canonical map-side-combine shape.",
)
def text_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@spec(
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    ) WHERE rn <= 50
    """,
    doc="Training-corpus stratified sampling: a fixed per-source quota drawn "
    "by a DETERMINISTIC pseudo-random order (md5 of the key — identical in "
    "both engines, reshuffle-stable, no RNG state).  One shuffle on the "
    "stratum key; at 100 TB per-stratum top-k pushes partial limits "
    "map-side the same as topk_orders.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 50)
        .select("doc_id", "source")
    )


@spec(
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (SELECT doc_id, unnest(toks) AS word,
                 generate_subscripts(toks, 1) AS pos
          FROM w),
    v AS (SELECT word,
                 row_number() OVER (ORDER BY count(*) DESC, word) AS wid
          FROM e GROUP BY word)
    SELECT e.doc_id,
           string_agg(v.wid, ',' ORDER BY e.pos) AS token_ids,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM e JOIN v USING (word)
    GROUP BY e.doc_id
    """,
    doc="VOCABULARY BUILD + NUMERICALIZATION (the tokenize-to-ids step of "
    "training prep): the corpus vocabulary is ranked by frequency "
    "(deterministic word tie-break) and every document's token sequence is "
    "rewritten as the comma-joined id sequence, order-preserving.  Scale: "
    "the vocabulary aggregation is bounded by |vocab| (map-side combined); "
    "ids come from the shared distributed_rank kernel (range partitions + "
    "broadcast prefix offsets — never a single-task global window, because "
    "a web-scale corpus has billions of word types), and the encode pass is "
    "a hash join on word — NOT a vocab broadcast, which would also grow "
    "with |types| — followed by one doc-keyed re-assembly aggregation.  At "
    "100 TB this is exactly the two-pass shape a real tokenizer-id pipeline "
    "uses (build vocab once, then an encode join).  Position order is "
    "pinned on both engines (array_sort on the (pos, id) structs / "
    "string_agg ORDER BY pos), so the id string is hash-exact.",
)
def text_numericalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import distributed_rank

    d = load(spark, sf_dir, "documents")
    e = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")

    freqs = (
        e.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("__nf", -F.col("freq"))
    )
    # rank on (-freq asc, word asc) == (freq desc, word asc); tie-free.
    vocab = distributed_rank(freqs, ["__nf", "word"], out="wid").select("word", "wid")
    joined = e.join(vocab, "word")
    ids_in_order = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "wid"))),
        lambda x: x["wid"].cast("string"),
    )
    return joined.groupBy("doc_id").agg(
        F.array_join(ids_in_order, ",").alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


SENT_POS = ("fast", "big")
SENT_NEG = ("slow", "small")


@spec(
    f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, w -> w IN {SENT_POS!r})) AS BIGINT) AS n_pos,
             CAST(len(list_filter(toks, w -> w IN {SENT_NEG!r})) AS BIGINT) AS n_neg
      FROM t
    )
    SELECT doc_id, lang, n_pos, n_neg,
           (n_pos - n_neg) / CAST(n_tokens AS DOUBLE) AS polarity,
           CASE WHEN n_pos > n_neg THEN 'pos'
                WHEN n_pos < n_neg THEN 'neg'
                ELSE 'neutral' END AS label
    FROM c
    """,
    doc="LEXICON SENTIMENT SCORING (the Spark-sentiment-at-scale shape of "
    "EDBT 2016's Twitter pipeline): polarity = (pos-hits - neg-hits) / "
    "tokens against a broadcast-sized lexicon, entirely map-side — tokenize, "
    "two list_filter counts, one exact integer subtraction and one IEEE "
    "division per document; zero shuffles, zero UDFs.  A production lexicon "
    "(thousands of terms) would join a frequency-weighted term table "
    "(the text_unigram_logprob topology) instead of inlining the IN list; "
    "the dataflow is identical.",
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    n_pos = F.size(F.filter(toks, lambda w: w.isin(*SENT_POS))).cast("bigint")
    n_neg = F.size(F.filter(toks, lambda w: w.isin(*SENT_NEG))).cast("bigint")
    return d.select(
        "doc_id",
        "lang",
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        # surfaced UNROUNDED: both engines evaluate the identical IEEE
        # division on exact small integers, so the doubles are bit-equal;
        # round(x, 6) would re-introduce the Spark-vs-DuckDB half-repr flip
        # class fixed for window_distribution in round 6
        ((n_pos - n_neg) / F.size(toks).cast("double")).alias("polarity"),
        F.when(n_pos > n_neg, "pos")
        .when(n_pos < n_neg, "neg")
        .otherwise("neutral")
        .alias("label"),
    )


WEIGHTED_QUOTA = 20  # weighted-sample size per stratum


@spec(
    f"""
    WITH m AS (
      SELECT doc_id, source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS mh
      FROM documents
    ),
    p AS (
      SELECT doc_id, source, n_chars,
             CAST(n_chars AS DOUBLE) * 4294967296.0
               / (CAST({sql_md5_h32_from('mh')} AS DOUBLE) + 0.5) AS pri
      FROM m
    )
    SELECT doc_id, source, n_chars, round(pri, 4) AS priority
    FROM p
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY pri DESC, doc_id) <= {WEIGHTED_QUOTA}
    """,
    doc="WEIGHTED corpus sampling via PRIORITY SAMPLING (Duffield-Lund-"
    "Thorup): each doc draws priority w/u with weight w = n_chars and "
    "u = (h+0.5)/2^32 from the portable md5 seed; the per-stratum top-"
    f"{WEIGHTED_QUOTA} priorities are the sample — longer documents "
    "proportionally likelier, the token-budget-proportional draw a "
    "training-mix pipeline uses.  Deterministic and engine-exact: the "
    "priority is one identical IEEE expression (multiply + divide on exact "
    "integers — no ln/pow, whose library rounding differs across engines), "
    "seeded by the same digest both engines compute.  Scale: priorities are "
    "map-side; the per-stratum top-k is the topk_orders partial-limit "
    "topology — one shuffle on the stratum key.",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    h = md5_h32(F.col("doc_id").cast("string"))
    p = d.withColumn(
        "pri",
        F.col("n_chars").cast("double")
        * F.lit(4294967296.0)
        / (h.cast("double") + F.lit(0.5)),
    )
    w = Window.partitionBy("source").orderBy(F.desc("pri"), F.asc("doc_id"))
    return (
        p.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= WEIGHTED_QUOTA)
        .select("doc_id", "source", "n_chars", F.round("pri", 4).alias("priority"))
    )


PACK_BUDGET = 2048  # tokens per training pack
N_PACK_SHARDS = 16  # deterministic sub-splits per source (scale: the unit of
# window parallelism; at 100 TB raise to O(corpus / executor-memory))


@spec(
    f"""
    WITH t AS (
      SELECT doc_id, source, doc_id % {N_PACK_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY source, shard
                                             ORDER BY doc_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0) AS prior
      FROM t
    ),
    l AS (SELECT *, prior // {PACK_BUDGET} AS local_pack FROM c),
    pc AS (SELECT source, shard, MAX(local_pack) + 1 AS n_packs
           FROM l GROUP BY 1, 2),
    o AS (
      SELECT source, shard,
             COALESCE(SUM(n_packs) OVER (PARTITION BY source ORDER BY shard
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS pack_offset
      FROM pc
    )
    SELECT l.doc_id, l.source, CAST(l.n_tokens AS INTEGER) AS n_tokens,
           CAST(o.pack_offset + l.local_pack AS BIGINT) AS pack_id
    FROM l JOIN o USING (source, shard)
    """,
    doc="Training-batch sequence packing, HIERARCHICAL: greedy "
    f"{PACK_BUDGET}-token packing runs within (source, shard) — shard is a "
    f"deterministic doc_id split into {N_PACK_SHARDS} sub-streams — and "
    "shard-local pack ids are then offset by the exclusive running sum of "
    "per-shard pack counts, so ids stay dense per source.  Greedy packing "
    "is order-serial by nature; the flat per-source window form computes "
    "its prefix sum in ONE task per source (with ~10 sources, 100 TB "
    "funnels through ~10 tasks and one partition must hold a whole "
    "source).  Here the corpus-wide window parallelism is sources x "
    f"{N_PACK_SHARDS} and no partition holds more than 1/{N_PACK_SHARDS} "
    "of a source; the offset pass aggregates to one tiny row per (source, "
    "shard) [exchange-reused, no second corpus scan] and broadcasts back.  "
    "Cost: a shard's tail pack may be underfull (bounded waste of "
    f"{N_PACK_SHARDS}-1 partial packs per source) — the standard "
    "distributed-packing tradeoff.",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    t = d.select(
        "doc_id",
        "source",
        (F.col("doc_id") % N_PACK_SHARDS).alias("shard"),
        n.alias("n_tokens"),
    ).filter(F.col("source").isNotNull() & F.col("shard").isNotNull())
    # ^ no-op on the data (inner join below drops null keys anyway), but it
    # makes the window branch and the pack-count branch canonicalize to the
    # SAME subtree, so ReuseExchange collapses them to one corpus scan —
    # without it the join pushes IsNotNull into only one branch and the
    # counts side re-scans + re-sorts the whole corpus (asserted in
    # tests/test_plans.py).
    w_local = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    local = t.withColumn("local_pack", F.floor(prior / PACK_BUDGET))
    # one row per (source, shard); Spark reuses the window's exchange here,
    # so this branch does not rescan the corpus
    counts = local.groupBy("source", "shard").agg(
        (F.max("local_pack") + 1).alias("n_packs")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "pack_offset", F.coalesce(F.sum("n_packs").over(w_off), F.lit(0))
    ).select("source", "shard", "pack_offset")
    return local.join(F.broadcast(offsets), ["source", "shard"]).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (F.col("pack_offset") + F.col("local_pack")).cast("bigint").alias("pack_id"),
    )


DECON_NGRAM = 8  # shingle width for eval-overlap decontamination
EVAL_MOD = 97  # deterministic stand-in eval set: doc_id % 97 == 0


def _word_shingles(words: Column, k: int) -> Column:
    """All k-word shingles of a token array as strings (empty array when the
    doc is shorter than k — F.sequence(1, n-k+1) would run DESCENDING for
    n < k, so the guard is load-bearing)."""
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


@spec(
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - {DECON_NGRAM})) AS i
            FROM w),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i + 1 AS INT) : CAST(i + {DECON_NGRAM} AS INT)], ' ') AS sh
      FROM idx
    ),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
    h AS (
      SELECT tr.doc_id, COUNT(*) AS n_shingles, COUNT(ev.sh) AS n_hits
      FROM tr LEFT JOIN ev USING (sh) GROUP BY tr.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN h USING (doc_id)
    WHERE d.doc_id % {EVAL_MOD} <> 0
    """,
    doc="Training-corpus DECONTAMINATION: flag training documents sharing any "
    f"{DECON_NGRAM}-gram with the eval set (deterministic stand-in: doc_id % "
    f"{EVAL_MOD} == 0), the standard benchmark-leakage scrub before "
    "pretraining.  Scale shape: eval shingles are DISTINCT and broadcast "
    "(benchmark sets are tiny vs a 100 TB corpus), training shingles explode "
    "per-row with no shuffle, and the only exchange is the per-doc hit "
    "aggregation — contaminated docs then drop via one scan-side filter.",
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # shingle construction is CPU-bound on a (locally) single-split scan;
    # the exploded frame feeds BOTH the eval and training branches — each
    # lazy reference re-runs scan -> shingle-explode, so above the
    # SF-adaptive threshold the frame is materialized once (CPU of the
    # shingle build dominates its narrow (doc_id, sh) rows at scale)
    sh = materialize_if_wide(
        parallelize_small_scan(d, "doc_id").select(
            "doc_id",
            F.explode(
                F.array_distinct(_word_shingles(_words(), DECON_NGRAM))
            ).alias("sh"),
        ),
        sf_dir,
        "documents",
    )
    ev = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select("sh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tr = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    h = (
        tr.join(F.broadcast(ev), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_hits"),
        )
    )
    return (
        d.filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id")
        .join(h, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


REP_NGRAM = 3  # repetition gate: duplicate 3-gram fraction
REP_MAX_RATIO = 0.2


@spec(
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {REP_NGRAM}
                  THEN list_transform(generate_series(1, len(toks) - {REP_NGRAM - 1}),
                                      i -> array_to_string(toks[i : i + {REP_NGRAM - 1}], ' '))
                  ELSE [] END AS grams
      FROM w
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
           END AS rep_ratio,
           len(grams) > 0
             AND 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                 <= {REP_MAX_RATIO} AS rep_pass
    FROM g
    """,
    doc=f"L4 repetition-quality gate: duplicate-{REP_NGRAM}-gram fraction per "
    "document (1 - distinct/total), thresholded — the standard boilerplate/"
    "looping-text filter in pretraining curation.  Pure per-row Catalyst "
    "array expressions: NO shuffle, no Python; scales as a map-only pass.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row n-gram building is CPU-bound; spread a single-split scan
    # (no-op at production split counts — the op itself stays shuffle-free)
    d = parallelize_small_scan(load(spark, sf_dir, "documents"), "doc_id")
    # Build the gram array in ONE aliased projection: higher-order-function
    # expressions are interpreted (CodegenFallback), so letting every output
    # column re-derive `grams` multiplies the dominant per-row cost ~4x.
    # The gram COUNT needs no gram strings at all (it is max(n_tokens-k+1, 0));
    # only the distinct count touches the built array.  CollapseProject keeps
    # the two projections separate because the non-cheap alias is referenced
    # more than once.
    n_tok = F.size(_words())
    base = d.select(
        "doc_id",
        F.greatest(n_tok - (REP_NGRAM - 1), F.lit(0)).cast("bigint").alias("n_grams"),
        F.size(F.array_distinct(_word_shingles(_words(), REP_NGRAM)))
        .cast("bigint")
        .alias("n_distinct"),
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams"),
    )
    return base.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        ratio.alias("rep_ratio"),
        ((F.col("n_grams") > 0) & (ratio <= REP_MAX_RATIO)).alias("rep_pass"),
    )


CHUNK_SIZE = 32  # tokens per training chunk
CHUNK_STRIDE = 24  # overlap = CHUNK_SIZE - CHUNK_STRIDE


@spec(
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) - 1) // {CHUNK_STRIDE})) AS i
            FROM w),
    c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             CAST(1 + i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
             toks[CAST(1 + i * {CHUNK_STRIDE} AS INT)
                  : CAST(i * {CHUNK_STRIDE} + {CHUNK_SIZE} AS INT)] AS chunk
      FROM idx
    )
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(len(chunk) AS INTEGER) AS n_chunk_tokens,
           sha256(array_to_string(chunk, ' ')) AS chunk_sha256
    FROM c
    """,
    doc=f"Training-data CHUNKING: overlapping {CHUNK_SIZE}-token windows "
    f"every {CHUNK_STRIDE} tokens (1 row -> many), the context-window "
    "split for embedding/pretraining pipelines; chunks surface as sha256 "
    "identities to keep rows narrow.  Per-row explode of a computed start "
    "sequence — no shuffle, no Python in the row path.",
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = _words()
    n = F.size(words)
    n_chunks = F.floor((n - 1) / CHUNK_STRIDE) + 1  # starts while start <= n
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * CHUNK_STRIDE + 1
    )
    c = d.select("doc_id", words.alias("toks"), F.posexplode(starts).alias("chunk_idx", "start"))
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK_SIZE)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("chunk_start"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.sha2(F.array_join(chunk, " "), 256).alias("chunk_sha256"),
    )


@spec(
    """
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
                   COUNT(*) AS n_sources FROM s)
    SELECT source, n_docs, n_tokens,
           round(CAST(total AS DOUBLE) / (n_sources * n_tokens), 6) AS mix_weight
    FROM s, tot
    """,
    doc="Training-corpus DOMAIN MIXING weights: per-source token counts and "
    "the per-source sampling weight that equalizes the token contribution of "
    "every source (weight = total/(S * tokens_s); sources below fair share "
    "upsample > 1, oversized sources downsample < 1) — the knob a "
    "pretraining data pipeline tunes before packing.  Scale shape: ONE "
    "corpus scan into a map-side-combined agg to S rows; the totals come "
    "from an unpartitioned window over those S rows (source-count-sized, "
    "never the corpus — a totals branch via a second agg would rescan the "
    "corpus, plan-locked in tests/test_plans.py).",
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_words())).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()  # S rows total — safe single-task window
    total = F.sum("n_tokens").over(w).cast("double")
    n_sources = F.count(F.lit(1)).over(w)
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(total / (n_sources * F.col("n_tokens")), 6).alias("mix_weight"),
    )


NGRAM_TOP_K = 20


@spec(
    f"""
    WITH w AS (SELECT string_split(text, ' ') AS toks FROM documents),
    idx AS (SELECT toks, unnest(generate_series(0, len(toks) - 2)) AS i FROM w),
    bi AS (
      SELECT toks[CAST(i + 1 AS INT)] || ' ' || toks[CAST(i + 2 AS INT)] AS bigram
      FROM idx
    ),
    c AS (SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram)
    SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT {NGRAM_TOP_K}
    """,
    doc=f"Corpus BIGRAM top-{NGRAM_TOP_K}: per-row shingle explode (no "
    "shuffle), one map-side-combined count agg on the bigram key, and a "
    "TakeOrdered top-k (orderBy+limit — per-partition heaps, never a "
    "single-partition global sort) with a deterministic (count, bigram) "
    "tie-break.  The n-gram frequency table that drives vocab/tokenizer "
    "construction and repetition diagnostics at corpus scale.",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bi = parallelize_small_scan(d, "doc_id").select(
        F.explode(_word_shingles(_words(), 2)).alias("bigram")
    )
    counts = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("bigram")).limit(NGRAM_TOP_K)


@spec(
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
           FROM tok GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round((ln(SUM(c)) - SUM(c * ln(c)) / SUM(c)) / ln(2), 6)
             AS token_entropy_bits
    FROM tf GROUP BY doc_id
    """,
    doc="L4 token-distribution ENTROPY per document (bits): the quality "
    "signal that catches keyword-stuffed / template / boilerplate text that "
    "length and uniqueness gates miss.  Uses the single-aggregation closed "
    "form H = ln n - (SUM c ln c)/n over term frequencies — no per-term "
    "probability join, two map-side-combined aggs total; round(6) absorbs "
    "cross-engine summation-order ulps.",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_words()).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    n = F.sum("c")
    ent = (F.log(n) - F.sum(F.col("c") * F.log("c")) / n) / F.log(F.lit(2.0))
    return tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(ent, 6).alias("token_entropy_bits"),
    )


LENGTH_BUCKET_W = 50


@spec(
    f"""
    SELECT (len(string_split(text, ' ')) // {LENGTH_BUCKET_W}) * {LENGTH_BUCKET_W}
             AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
    """,
    doc=f"Token-length HISTOGRAM ({LENGTH_BUCKET_W}-token buckets): doc "
    "counts and token mass per length band — the length-distribution "
    "diagnostic behind truncation/packing decisions.  Integer bucket "
    "arithmetic (no float binning drift between engines); single "
    "map-side-combined agg.",
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n = F.size(_words()).cast("bigint")
    bucket = (F.floor(n / LENGTH_BUCKET_W) * LENGTH_BUCKET_W).cast("bigint")
    return d.groupBy(bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n).cast("bigint").alias("n_tokens"),
    )


PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
PII_PHONE_RE = "555-[0-9]+"


@spec(
    f"""
    WITH synth AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 <> 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 4 <> 0
                     THEN ' call 555-' || CAST(doc_id % 10000 AS VARCHAR)
                     ELSE '' END AS s
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(s, '{PII_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(s, '{PII_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(s, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{PII_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
    FROM synth
    """,
    doc="L4+ PII SCRUB (the redaction gate every training-data pipeline runs "
    "before text leaves curation): count and mask email/phone patterns per "
    "document.  PII is planted deterministically (the fixture corpus has "
    "none) so the counts exercise 0/1-per-doc variation and the redacted "
    "text differs from the input; output is the md5 of the redacted text — "
    "value-exact across engines without hashing megabytes of strings "
    "through the driver.  Stateless scan-side map, no shuffle.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    s = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 != 0,
            F.concat(F.lit(" call 555-"), (F.col("doc_id") % 10000).cast("string")),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(s, PII_EMAIL_RE, "[EMAIL]"), PII_PHONE_RE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(s, F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(s, F.lit(PII_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


TFIDF_TOP_K = 3


@spec(
    f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(*) AS dfc FROM tf GROUP BY w),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    s AS (SELECT tf.doc_id, tf.w,
                 round(tf.c * ln(CAST(nd AS DOUBLE) / dfc), 6) AS tfidf
          FROM tf JOIN df USING (w), n)
    SELECT doc_id, w AS term, tfidf FROM s
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, w) <= {TFIDF_TOP_K}
    """,
    doc=f"L4 TF-IDF top-{TFIDF_TOP_K} terms per document — the classic "
    "keyword/topic signal for corpus exploration and near-dup triage.  Two "
    "map-side-combined aggs (term frequency, document frequency over the tf "
    "frame — df needs no second corpus scan), one term-keyed join, one "
    "per-doc window; the corpus count rides in as a 1-row broadcast, never "
    "a driver collect.  Both engines compute tf * ln(N/df) from exact "
    "integers, so round(6) is belt-and-braces.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = parallelize_small_scan(d, "doc_id").select(
        "doc_id", F.explode(_words()).alias("w")
    )
    # tf is consumed TWICE (the df derivation + the score join) — each lazy
    # reference re-runs scan -> explode -> hash-agg.  SF-adaptive barrier:
    # lazy below catalog.MATERIALIZE_MIN_BYTES (the r15 A/Bs measured the
    # barrier slower than one re-scan at bench scale), one corpus pass above.
    tf = materialize_if_wide(
        tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c")),
        sf_dir,
        "documents",
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("dfc"))
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    s = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round(
                F.col("c") * F.log(F.col("nd").cast("double") / F.col("dfc")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        s.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf")
    )


@spec(
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS dc FROM tok GROUP BY doc_id, w),
    cnt AS (SELECT w, CAST(SUM(dc) AS BIGINT) AS c FROM tf GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
    s AS (SELECT tf.doc_id, dc, dc * ln(CAST(c AS DOUBLE) / t) AS wlp
          FROM tf JOIN cnt USING (w), tot)
    SELECT doc_id,
           CAST(SUM(dc) AS BIGINT) AS n_tokens,
           round(SUM(wlp) / SUM(dc), 6) AS avg_logprob
    FROM s GROUP BY doc_id
    """,
    doc="L4 unigram-LM log-probability per document — the PERPLEXITY PROXY "
    "quality gate (docs whose tokens are improbable under the corpus "
    "unigram distribution are boilerplate, junk, or off-domain): corpus "
    "unigram counts, then per-doc mean ln P(w), FREQUENCY-WEIGHTED over "
    "distinct (doc, term) rows — the term-keyed join carries one row per "
    "distinct term per doc, not one per token (~2-5x fewer rows at corpus "
    "scale), and corpus counts derive from the tf frame so the corpus "
    "tokenizes once per branch.  The 1-row total rides in as a broadcast.  "
    "round(6) absorbs summation-order ulps in the weighted mean.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = parallelize_small_scan(d, "doc_id").select(
        "doc_id", F.explode(_words()).alias("w")
    )
    # same two-consumer shape as text_tfidf_topk's tf — SF-adaptive barrier
    tf = materialize_if_wide(
        tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("dc")),
        sf_dir,
        "documents",
    )
    cnt = tf.groupBy("w").agg(F.sum("dc").cast("bigint").alias("c"))
    tot = cnt.agg(F.sum("c").cast("bigint").alias("t"))
    s = (
        tf.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "dc",
            (F.col("dc") * F.log(F.col("c").cast("double") / F.col("t"))).alias("wlp"),
        )
    )
    return s.groupBy("doc_id").agg(
        F.sum("dc").cast("bigint").alias("n_tokens"),
        F.round(F.sum("wlp") / F.sum("dc"), 6).alias("avg_logprob"),
    )


BM25_TERMS = ("vector", "join", "merge")  # fixture-vocabulary query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 25


@spec(
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS tot_dl FROM dl),
    qtf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
            WHERE w IN ('vector', 'join', 'merge') GROUP BY doc_id, w),
    dfreq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY w),
    s AS (
      SELECT q.doc_id,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * {BM25_K1 + 1}
               / (tf + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl
                    / (CAST(tot_dl AS DOUBLE) / n_docs))) AS ts
      FROM qtf q JOIN dfreq USING (w) JOIN dl USING (doc_id), stats
    )
    SELECT doc_id, round(SUM(ts), 6) AS bm25
    FROM s GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
    """,
    doc="L4 BM25 RANKED RETRIEVAL (Okapi k1=1.2, b=0.75) for a fixed "
    "query-term set over the corpus — the lexical-search scoring a "
    "training-data pipeline uses for targeted corpus slicing (pull the "
    "top-k docs about X) and as the sparse side of hybrid retrieval next "
    "to the ANN family.  Doc lengths aggregate once over the exploded "
    "frame, term frequencies only for the query terms (the filter prunes "
    "the frame BEFORE the groupBy), document frequencies derive from the "
    "per-doc tf rows, and the 1-row corpus stats ride in as a broadcast.  "
    "The final top-k is sort+limit -> TakeOrderedAndProject (per-partition "
    "top-k, no single-partition window).  Arithmetic order mirrors the "
    "oracle token-for-token so both engines fold identical doubles; "
    "round(6) absorbs ln-ulp and 3-term summation-order differences "
    "(the text_unigram_logprob precedent).",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = parallelize_small_scan(d, "doc_id").select(
        "doc_id", F.explode(_words()).alias("w")
    )
    # dl feeds the corpus-stats aggregate AND the score join; an
    # unconditional eager localCheckpoint measured SLOWER at sf0.1 (r15:
    # 0.89 s -> 1.04-1.06 s warm A/B — the barrier outweighs one extra
    # explode pass at bench scale), so the barrier is SF-adaptive: lazy at
    # bench scale (unchanged), one pass above catalog.MATERIALIZE_MIN_BYTES.
    dl = materialize_if_wide(
        tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")),
        sf_dir,
        "documents",
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("tot_dl"),
    )
    qtf = (
        tok.filter(F.col("w").isin(*BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = qtf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    s = qtf.join(dfreq, "w").join(dl, "doc_id").crossJoin(F.broadcast(stats))
    avgdl = F.col("tot_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        (1 - BM25_B) + BM25_B * F.col("dl") / avgdl
    )
    term_score = idf * F.col("tf") * (BM25_K1 + 1) / denom
    return (
        s.groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 50


@spec(
    f"""
    WITH w AS (SELECT string_split(text, ' ') AS toks FROM documents),
    uni AS (
      SELECT u.w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM (SELECT unnest(toks) AS w FROM w) u GROUP BY u.w
    ),
    tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS t FROM uni),
    idx AS (SELECT toks, unnest(generate_series(0, len(toks) - 2)) AS i FROM w),
    bi AS (
      SELECT toks[CAST(i + 1 AS INT)] || ' ' || toks[CAST(i + 2 AS INT)] AS bigram
      FROM idx
    ),
    bc0 AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cab FROM bi GROUP BY bigram),
    btot AS (SELECT CAST(SUM(cab) AS BIGINT) AS b FROM bc0),
    s AS (
      SELECT bigram, cab,
             round(ln((CAST(cab AS DOUBLE) / b)
                      / ((CAST(u1.cw AS DOUBLE) / t)
                         * (CAST(u2.cw AS DOUBLE) / t))), 6) AS pmi
      FROM bc0
      JOIN uni u1 ON string_split(bigram, ' ')[1] = u1.w
      JOIN uni u2 ON string_split(bigram, ' ')[2] = u2.w, tot, btot
      WHERE cab >= {PMI_MIN_COUNT}
    )
    SELECT bigram, cab, pmi FROM s ORDER BY pmi DESC, bigram LIMIT {PMI_TOP_K}
    """,
    doc="L4 PMI COLLOCATIONS (pointwise mutual information over adjacent "
    "token pairs): the phrase-detection statistic (word2vec-style phrase "
    "merging, tokenizer vocab curation) — PMI = ln(P(ab) / (P(a)P(b))) "
    "with bigram and unigram probabilities over the corpus.  Bigram totals "
    "DERIVE from the counted frame (never a second corpus scan), unigram "
    "counts broadcast into the rule join (|vocab| rows), and the top-k is "
    "orderBy+limit -> TakeOrdered.  Arithmetic mirrors the oracle "
    "division-for-division (no algebraic rearrangement — it would change "
    "float rounding); round(6) absorbs ln ulps, the unigram_logprob "
    "precedent.",
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    src = parallelize_small_scan(d, "doc_id")
    # MATERIALIZE the two counted frames once (the agg_corr_matrix moments
    # precedent): uni is referenced THREE times downstream (tot + the u1/u2
    # broadcast sides) and bc0 TWICE (btot + the rule join) — left lazy,
    # each reference re-runs its scan -> explode -> hash-agg subtree, and
    # the different projections defeat exchange reuse (r15 plan audit: FIVE
    # documents scans / 32 Exchange nodes for one query).  The r15
    # UNCONDITIONAL checkpoint measured +25% on the 8-core control run
    # (r15 advice) while a 6-rep interleaved 32-core A/B this round read
    # the two forms indistinguishable (ckpt median 2.3 s, lazy 2.4 s) —
    # so the barrier is now SF-adaptive like its four class siblings:
    # lazy at bench scale, one explode+agg pass per frame above the
    # threshold (where re-tokenizing the corpus 3x loses by construction).
    uni = materialize_if_wide(
        src.select(F.explode(_words()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cw")),
        sf_dir,
        "documents",
    )
    tot = uni.agg(F.sum("cw").cast("bigint").alias("t"))
    bc0 = materialize_if_wide(
        src.select(F.explode(_word_shingles(_words(), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cab")),
        sf_dir,
        "documents",
    )
    btot = bc0.agg(F.sum("cab").cast("bigint").alias("b"))
    u1 = uni.select(F.col("w").alias("__w1"), F.col("cw").alias("cw1"))
    u2 = uni.select(F.col("w").alias("__w2"), F.col("cw").alias("cw2"))
    s = (
        bc0.filter(F.col("cab") >= PMI_MIN_COUNT)
        .withColumn("__w1", F.split("bigram", " ")[0])
        .withColumn("__w2", F.split("bigram", " ")[1])
        .join(F.broadcast(u1), "__w1")
        .join(F.broadcast(u2), "__w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    pmi = F.round(
        F.log(
            (F.col("cab").cast("double") / F.col("b"))
            / (
                (F.col("cw1").cast("double") / F.col("t"))
                * (F.col("cw2").cast("double") / F.col("t"))
            )
        ),
        6,
    )
    return (
        s.select("bigram", "cab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(PMI_TOP_K)
    )


DUP_NGRAM = 8  # span width for cross-document repeated-substring detection


@spec(
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - {DUP_NGRAM})) AS i
            FROM w),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i + 1 AS INT) : CAST(i + {DUP_NGRAM} AS INT)], ' ') AS sh
      FROM idx
    ),
    df AS (SELECT sh, COUNT(*) AS nd FROM sh GROUP BY sh)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (df.nd >= 2) AS BIGINT) AS n_dup,
           CAST(COUNT(*) FILTER (df.nd >= 2) AS DOUBLE) / COUNT(*) AS dup_fraction
    FROM sh JOIN df USING (sh)
    GROUP BY sh.doc_id
    """,
    doc="REPEATED-SPAN STATISTICS per document (the cross-document "
    f"duplicated-{DUP_NGRAM}-gram signal behind substring-level corpus "
    "dedup, Lee et al. 2022 'Deduplicating Training Data Makes Language "
    "Models Better'): for every doc, how many of its distinct "
    f"{DUP_NGRAM}-gram spans also occur in at least one OTHER doc (or "
    "twice — document frequency >= 2 over distinct doc-shingle pairs), "
    "and the duplicated fraction — the gate score for trimming "
    "boilerplate-heavy documents.  Spark: shingles explode map-side "
    "(constant fan-out), ONE window count over the shingle hash replaces "
    "the count+join-back (a single hash exchange on the shingle key), and "
    "the per-doc rollup is the second, doc-keyed exchange.  Shingles are "
    "xxhash64'd so the wide span strings never shuffle; dup_fraction is "
    "an unrounded exact-integer IEEE division.",
)
def text_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = parallelize_small_scan(load(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    _word_shingles(_words(), DUP_NGRAM), lambda g: F.xxhash64(g)
                )
            )
        ).alias("sh"),
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("sh"))
    per_doc = sh.withColumn("nd", nd).groupBy("doc_id")
    dup = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("bigint")
    return per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        dup.alias("n_dup"),
        (dup.cast("double") / F.count(F.lit(1))).alias("dup_fraction"),
    )


SPLIT_TRAIN_PCT = 80  # hash buckets 0-79 -> train
SPLIT_VAL_PCT = 90  # 80-89 -> validation; 90-99 -> test


@spec(
    f"""
    WITH m AS (
      SELECT source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS mh
      FROM documents
    ),
    s AS (
      SELECT source, n_chars,
             CASE WHEN {sql_md5_h32_from('mh')} % 100 < {SPLIT_TRAIN_PCT}
                    THEN 'train'
                  WHEN {sql_md5_h32_from('mh')} % 100 < {SPLIT_VAL_PCT}
                    THEN 'validation'
                  ELSE 'test' END AS split
      FROM m
    ),
    c AS (
      SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
      FROM s GROUP BY source, split
    ),
    t AS (
      SELECT source, CAST(SUM(n_docs) AS BIGINT) AS source_total
      FROM c GROUP BY source
    )
    SELECT c.source, c.split, n_docs, n_chars_total, source_total,
           CAST(n_docs AS DOUBLE) / source_total AS split_share
    FROM c JOIN t USING (source)
    """,
    doc="DETERMINISTIC TRAIN/VALIDATION/TEST SPLIT + leakage audit: each "
    "document is assigned by hash-bucket of its KEY (md5_h32(doc_id) % "
    f"100 -> <{SPLIT_TRAIN_PCT} train, <{SPLIT_VAL_PCT} validation, else "
    "test), the split every training pipeline needs to be (a) "
    "reproducible across runs and engines, (b) STABLE under corpus growth "
    "— a doc's split never changes when other docs arrive, unlike "
    "row-number or sample() splits — and (c) computable map-side with no "
    "shared state.  The audit output is the per-(source, split) doc/char "
    "census with each split's share of its source, the report a data-prep "
    "job emits to catch skewed strata before training.  Scale: assignment "
    "is a pure projection fused into the scan; the census is one "
    "map-side-combinable agg, totals derived from the counted frame "
    "(never a second corpus scan) and broadcast back.",
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    bucket = md5_h32(F.col("doc_id").cast("string")) % 100
    s = d.select(
        "source",
        "n_chars",
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "validation")
        .otherwise("test")
        .alias("split"),
    )
    c = (
        s.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
        .localCheckpoint(eager=True)
    )
    t = c.groupBy("source").agg(F.sum("n_docs").cast("bigint").alias("source_total"))
    return c.join(F.broadcast(t), "source").select(
        "source",
        "split",
        "n_docs",
        "n_chars_total",
        "source_total",
        (F.col("n_docs").cast("double") / F.col("source_total")).alias("split_share"),
    )


OOV_VOCAB_N = 500  # tokenizer vocabulary budget for the coverage audit


@spec(
    f"""
    WITH e AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    v AS (
      SELECT word FROM (
        SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS r
        FROM e GROUP BY word
      ) WHERE r <= {OOV_VOCAB_N}
    )
    SELECT e.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM e LEFT JOIN v USING (word)
    GROUP BY e.source
    """,
    doc="TOKENIZER VOCABULARY COVERAGE / OOV-RATE AUDIT per source: fix a "
    f"frequency-ranked top-{OOV_VOCAB_N} vocabulary (deterministic word "
    "tie-break — the text_numericalize vocab discipline) and report each "
    "source's share of tokens falling OUTSIDE it — the pipeline-health "
    "metric that catches a domain whose text a fixed tokenizer budget "
    "would shred into OOV/byte-fallback tokens before training does.  "
    "Scale: the vocab agg is |vocab|-bounded and map-side combined, the "
    "cut is a partial-limit top-k, and membership rides as a BROADCAST "
    "left join into the token stream — one full-data exchange-free "
    "marking pass plus one per-source agg; exact integer counts, one "
    "final division.",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize_small_scan(load(spark, sf_dir, "documents"), "doc_id")
    e = d.select("source", F.explode(F.split(F.col("text"), " ")).alias("word"))
    v = (
        e.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(OOV_VOCAB_N)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    marked = e.join(F.broadcast(v), "word", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        (F.sum(oov).cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


QUERIES: dict[str, QuerySpec] = {
    "pipeline_train_test_split": pipeline_train_test_split,
    "text_oov_rate": text_oov_rate,
    "text_bigram_pmi": text_bigram_pmi,
    "text_bm25_topk": text_bm25_topk,
    "pipeline_decontaminate": pipeline_decontaminate,
    "text_pii_redact": text_pii_redact,
    "text_tfidf_topk": text_tfidf_topk,
    "text_unigram_logprob": text_unigram_logprob,
    "pipeline_domain_mix": pipeline_domain_mix,
    "text_ngram_topk": text_ngram_topk,
    "text_entropy": text_entropy,
    "pipeline_length_buckets": pipeline_length_buckets,
    "text_repetition_filter": text_repetition_filter,
    "pipeline_chunk_documents": pipeline_chunk_documents,
    "sample_stratified": sample_stratified,
    "sample_weighted_priority": sample_weighted_priority,
    "text_sentiment_lexicon": text_sentiment_lexicon,
    "text_numericalize": text_numericalize,
    "text_dup_ngram_spans": text_dup_ngram_spans,
    "pipeline_pack_sequences": pipeline_pack_sequences,
    "text_token_count": text_token_count,
    "text_quality": text_quality,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_simhash": text_simhash,
    "text_word_count": text_word_count,
}
