"""Dataset-splitting and weighting operators for training pipelines
(SURVEY.md section 7.4 extension surface).

- ``hash_split``     deterministic train/valid/test assignment from a
  content-independent key hash. The industry-standard way to split at
  100 TB: no global shuffle, no sampling state, stable across reruns and
  engines (MD5 is engine-independent; Spark's rand()/sampleBy are not
  reproducible cross-engine).
- ``tfidf_top_terms``  per-document top-k terms by tf-idf. Uses the LINEAR
  idf variant ``tf * (N+1)/(df+1)`` so every score is a ratio of small
  integers — exact in IEEE double on both engines, which keeps the oracle's
  rank comparison deterministic (a log idf differs in the last ulp between
  libm implementations and can flip ranks; production swaps in log idf, the
  plan shape is identical).

Scale notes: hash_split is a pure map-side projection. tfidf is two hash
aggregates (term counts per doc; doc frequency per term) + one broadcast-
able join on term — doc-frequency is the classic hot-key risk (stopwords),
prune them first in production or salt the term join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table, spread as _spread

TOKEN_RE = "[a-z0-9]+"
TRAIN_FRAC, VALID_FRAC = 0.8, 0.1  # remainder = test
TOP_TERMS = 3


@register(
    "hash_split",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id,
       CASE WHEN u < {TRAIN_FRAC} THEN 'train'
            WHEN u < {TRAIN_FRAC + VALID_FRAC} THEN 'valid'
            ELSE 'test' END AS split,
       u AS split_key
FROM h
""",
    tags=["llm", "sampling"],
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split: uniform u in [0,1) from the first 32
    bits of MD5(doc_id), thresholded. Pure projection — no shuffle, no
    state; membership is reproducible from the key alone (add a salt string
    to the hash input to draw a fresh split)."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return d.select(
        "doc_id",
        F.when(u < TRAIN_FRAC, "train")
        .when(u < TRAIN_FRAC + VALID_FRAC, "valid")
        .otherwise("test")
        .alias("split"),
        u.alias("split_key"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
  WHERE doc_id % 5 = 0
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * (CAST(n.n AS DOUBLE) + 1.0)
           / (CAST(df.df AS DOUBLE) + 1.0) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank
FROM scored
WINDOW w AS (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
QUALIFY ROW_NUMBER() OVER w <= {TOP_TERMS}
""",
    tags=["llm", "text", "sampling"],
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_TERMS} characteristic terms per document by tf-idf (linear
    idf — see module docstring for why).

    r14 reshape (guide §1.2 "how many passes are unavoidable"): the r13
    plan evaluated the corpus tokenize+explode THREE times — once under
    the tf aggregate, once under the df broadcast build, once under the
    corpus-size broadcast build (12 Exchanges). The (doc, term, tf)
    posting table — what an IR system materializes anyway — is now built
    in ONE corpus pass and localCheckpointed; document frequency is then
    COUNT(*) of its (term) groups (identical to countDistinct(doc_id)
    per term, since the posting rows are (doc, term)-unique) and the
    corpus doc count is countDistinct over the postings — both
    dictionary-scale reads of the materialized table, never the corpus.
    One corpus explode, then a broadcast term join + the per-doc top-K
    window, exactly as before (same exact integers, same tfidf doubles,
    same window order — bit-identical output)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    tok = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias("term"),
    )
    from callio_etl_spark.llm_ops.matutil import materialize

    # size-gated (r15): the posting table is O(distinct (doc, term)) —
    # corpus-scale — so above the spill gate it lands in parquet scratch
    # instead of executor block storage; plan shape unchanged below it
    tf = materialize(
        tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf")),
        "tfidf_postings",
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = tf.select(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") + 1.0)
                / (F.col("df").cast("double") + 1.0)
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= TOP_TERMS
    )


MIX_ALPHA_NOTE = 0.5  # temperature exponent: factor = share^(alpha-1) = sqrt(1/share)


@register(
    "mixture_weights",
    oracle="""
WITH per_source AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM per_source)
SELECT p.source, p.n_docs,
       CAST(p.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
       SQRT(CAST(t.total AS DOUBLE) / CAST(p.n_docs AS DOUBLE)) AS upsample_factor
FROM per_source p CROSS JOIN tot t
""",
    tags=["llm", "sampling"],
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture temperature weights per source: share of corpus and
    the alpha=0.5 temperature up/down-sampling factor share^(alpha-1) =
    sqrt(total/n). Normalize the factors downstream (sum-to-one needs a
    cross-source reduction whose FP accumulation order is engine-dependent;
    every column HERE is one or two IEEE ops on exact integers, so the
    oracle match is bit-exact).

    Shape: one tiny grouped count (sources are a handful of keys; map-side
    combine means the shuffle moves one row per source per task) + a
    broadcast 1-row total. This is the planning step of proportional /
    temperature data mixing (cf. multilingual LM sampling): the factors
    feed stratified_sample or a weighted interleave at write time."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    tot = per_source.agg(F.sum("n_docs").cast("long").alias("total"))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("total").cast("double")).alias(
            "share"
        ),
        F.sqrt(
            F.col("total").cast("double") / F.col("n_docs").cast("double")
        ).alias("upsample_factor"),
    )


N_CURRICULUM_BINS = 10


@register(
    "curriculum_bins",
    oracle=f"""
SELECT doc_id, n_chars,
       CAST(NTILE({N_CURRICULUM_BINS})
              OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS bin
FROM documents
""",
    tags=["llm", "sampling"],
)
def curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: global {N_CURRICULUM_BINS}-tile over document
    length (short -> long), the standard length-ordered curriculum /
    bucketed-batching prep. The unique doc_id tiebreak makes the global
    order total, so bin edges are engine-deterministic.

    Plan: NTILE computed DISTRIBUTED — global rank via the prefix sum
    (range partition -> local window -> offset add) and the closed-form
    tile from (rank, n), bit-identical to the oracle's NTILE (ntile_
    ordered). The naive ``ntile() OVER (ORDER BY ...)`` form moves the
    whole corpus through one WindowExec task; this plan's widest single
    task holds one range partition. curriculum_bins_approx is the
    one-pass sketch variant for when even the rank's two shuffles are
    too much."""
    d = load_table(spark, sf_dir, "documents")
    return _curriculum_exact(d)


def _curriculum_exact(d: DataFrame) -> DataFrame:
    return ntile_ordered(
        d.select("doc_id", "n_chars"),
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        N_CURRICULUM_BINS,
        "bin",
    )


def _curriculum_approx(d: DataFrame) -> DataFrame:
    probs = [i / N_CURRICULUM_BINS for i in range(1, N_CURRICULUM_BINS)]
    edges = d.agg(F.percentile_approx("n_chars", probs, 10_000).alias("edges"))
    return (
        d.select("doc_id", "n_chars")
        .crossJoin(F.broadcast(edges))
        .select(
            "doc_id",
            "n_chars",
            (1 + F.size(F.filter("edges", lambda e: F.col("n_chars") > e)))
            .cast("long")
            .alias("bin"),
        )
    )


@register("curriculum_bins_approx", oracle=None, tags=["llm", "sampling"])
def curriculum_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning via approx quantile edges — the sketch path for
    corpora where even the exact rank's two shuffles are unwanted: ONE
    map-combined percentile_approx aggregate produces the
    {N_CURRICULUM_BINS}-1 bin edges (a single broadcast row), and bin
    assignment is a pure map-side lookup (count of edges below the value)
    — no sort, no window, no second shuffle anywhere.

    No SQL oracle: the edges come from Spark's Greenwald-Khanna sketch,
    whose estimates DuckDB's quantile sketch does not reproduce — the
    driver records rows-only (row count == corpus size), and
    tests/test_llm_ops.py asserts >=99% per-row bin agreement with the
    exact curriculum_bins at fixture scale plus monotonicity of the
    edges; curriculum_bins_audit is the driver-checkable tolerance form."""
    d = load_table(spark, sf_dir, "documents")
    return _curriculum_approx(d)


#: Audit tolerances for the approx curriculum. Greenwald-Khanna at
#: accuracy=10k bounds rank error to 1e-4 of the corpus, so a row can
#: flip bins only if it sits within that rank slop of an edge OR inside a
#: tie run spanning the edge (equal n_chars land in one approx bin while
#: exact NTILE splits them by the doc_id tiebreak). Measured agreement:
#: 0.996 / 0.994 / 0.992 at sf0.001/0.01/0.1 — the 0.98 gate leaves tie
#: headroom while still failing on any real sketch regression. Bin
#: distance can exceed 1 only if the rank slop or a tie run spans a WHOLE
#: bin (10% of the corpus) — a broken sketch, hence the hard <=1 gate.
CURR_AGREE_MIN = 0.98


@register(
    "curriculum_bins_audit",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST({N_CURRICULUM_BINS} AS BIGINT) AS n_bins,
       CAST(1 AS BIGINT) AS agree_ok,
       CAST(1 AS BIGINT) AS within_one_ok
FROM documents
""",
    tags=["llm", "sampling", "audit"],
)
def curriculum_bins_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-checked audit of curriculum_bins_approx — the
    driver-checkable form (sketch_error_bounds' pattern: Spark computes
    BOTH the sketch path and its own exact ground truth, emits pass/fail
    flags against documented bounds, and the oracle asserts the flags plus
    the exact row count). A Greenwald-Khanna regression that drifts bin
    edges breaks the hash. Bounds: per-row bin agreement >=
    {CURR_AGREE_MIN} and every disagreement off by exactly one bin
    (see CURR_AGREE_MIN note for why both hold with margin).

    Plan: the exact side is the distributed prefix-sum NTILE (two
    range-partitioned shuffles), the approx side one map-combined
    percentile_approx + broadcast edges; the compare is one equi-join on
    doc_id and a scalar aggregate. At full scale this audit runs on a
    sampled slice before trusting the one-pass approx corpus-wide."""
    d = load_table(spark, sf_dir, "documents")
    ex = _curriculum_exact(d).select("doc_id", F.col("bin").alias("exact_bin"))
    ap = _curriculum_approx(d).select("doc_id", F.col("bin").alias("approx_bin"))
    audited = ex.join(ap, "doc_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("exact_bin") == F.col("approx_bin")).cast("long")).alias(
            "n_agree"
        ),
        F.max(F.abs(F.col("exact_bin") - F.col("approx_bin"))).alias("max_dist"),
    )
    return audited.select(
        "n_docs",
        F.lit(N_CURRICULUM_BINS).cast("long").alias("n_bins"),
        (
            F.col("n_agree").cast("double")
            >= F.lit(CURR_AGREE_MIN) * F.col("n_docs").cast("double")
        )
        .cast("long")
        .alias("agree_ok"),
        (F.col("max_dist") <= 1).cast("long").alias("within_one_ok"),
    )


WEIGHT_CHARS = 2000.0  # docs this long (or longer) are always kept


@register(
    "weighted_sample",
    oracle=f"""
SELECT doc_id,
       LEAST(1.0, CAST(n_chars AS DOUBLE) / {WEIGHT_CHARS}) AS keep_weight,
       CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
         / 4294967296.0 AS u
FROM documents
WHERE CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
        / 4294967296.0
      < LEAST(1.0, CAST(n_chars AS DOUBLE) / {WEIGHT_CHARS})
""",
    tags=["llm", "sampling"],
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling: keep a document with probability equal
    to its quality weight (here length-proportional, capped at 1 — swap in
    any model-based score column). The coin is u = first 32 hash bits of a
    salted key, so membership is reproducible across engines, reruns, and
    resumed jobs — rand() is none of those. Pure projection + filter: no
    shuffle, no state, embarrassingly parallel at 100 TB; the 'ws:' salt
    decorrelates this draw from hash_split's."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    weight = F.least(F.lit(1.0), F.col("n_chars").cast("double") / WEIGHT_CHARS)
    return d.select(
        "doc_id", weight.alias("keep_weight"), u.alias("u")
    ).where(F.col("u") < F.col("keep_weight"))


RESERVOIR_K = 500


@register(
    "reservoir_sample",
    oracle=f"""
SELECT doc_id, md5('rs:' || CAST(doc_id AS VARCHAR)) AS sort_key
FROM documents
ORDER BY sort_key, doc_id
LIMIT {RESERVOIR_K}
""",
    tags=["llm", "sampling", "topk"],
)
def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample as hash top-k: order by a salted key hash
    and take the first {RESERVOIR_K} — exactly a K-reservoir draw, but
    deterministic and distributed: Spark plans ORDER BY + LIMIT as
    TakeOrderedAndProject (per-partition K-heaps, merge on the driver),
    so a 100 TB corpus never globally sorts and the driver holds K rows,
    not the data. MD5 hex compares identically in both engines (ASCII)."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("rs:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", key.alias("sort_key"))
        .orderBy("sort_key", "doc_id")
        .limit(RESERVOIR_K)
    )


# -------------------------------------------------- budgeted corpus select

TOKEN_BUDGET = 25_000  # tokens the selected sub-corpus may total


def prefix_sum_ordered(
    df: DataFrame, value_col: str, order_cols: list, out_col: str
) -> DataFrame:
    """Distributed EXACT running total in a global order — without the
    single-task global window Spark plans for ``SUM() OVER (ORDER BY ...)``
    with no PARTITION BY (one partition holds the whole table: the classic
    scale cliff). Three-step prefix sum instead:

    1. range-partition on the order keys (global order across partitions,
       local disorder within) and window WITHIN each range partition;
    2. aggregate one total per partition — |partitions| scalars;
    3. add each partition's prefix offset back as a literal map lookup.

    Two shuffles + one partition-count-sized collect, any table size.
    ``order_cols`` must be a total order (include a unique tiebreaker) so
    the running total is well-defined regardless of where range bounds
    fall."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    # Materialize the range-partitioned frame ONCE: both the per-partition
    # totals job and the final output read the checkpoint blocks instead of
    # re-running the upstream scan twice, and the partition assignment the
    # offsets were computed from is frozen rather than re-derived (SCALE.md
    # self-join doctrine — same reason embedding_lsh_pairs checkpoints its
    # signature table).
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__cum", F.sum(value_col).over(w))
    totals = sorted(
        (r["__pid"], r["t"])
        for r in ranged.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, t in totals:
        offsets[pid] = acc
        acc += t
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    return local.withColumn(
        out_col,
        (F.col("__cum") + F.coalesce(omap[F.col("__pid")], F.lit(0))).cast("long"),
    ).drop("__pid", "__cum")


def ntile_ordered(
    df: DataFrame, order_cols: list, n_tiles: int, out_col: str
) -> DataFrame:
    """Exact SQL NTILE over a global order WITHOUT the single-task window
    Spark plans for ``ntile() OVER (ORDER BY ...)`` with no PARTITION BY:
    the global rank comes from the distributed prefix sum (range partition
    -> local window -> offset add, prefix_sum_ordered), and the tile is the
    closed-form NTILE formula over (rank, n): with ``n`` rows and ``k``
    tiles, the first ``n % k`` tiles hold ``floor(n/k) + 1`` rows and the
    rest ``floor(n/k)`` — bit-identical to both engines' NTILE for any
    total order. The row count joins in as one broadcast scalar; the
    double divisions are exact for n < 2^52 rows (comfortably past 100 TB
    of documents). ``order_cols`` must include a unique tiebreaker."""
    ranked = prefix_sum_ordered(
        df.withColumn("__one", F.lit(1)), "__one", order_cols, "__rank"
    )
    tot = ranked.agg(F.count("*").cast("long").alias("__n"))
    r, n = F.col("__rank"), F.col("__n")
    base = F.floor(n / n_tiles).cast("long")  # small-tile row count
    rem = (n % n_tiles).cast("long")          # how many tiles get one extra
    big_span = rem * (base + 1)               # rows covered by the big tiles
    tile = F.when(r <= big_span, F.floor((r - 1) / (base + 1))).otherwise(
        # greatest() guards the n < k case (base = 0): that branch is then
        # unreachable (big_span = n covers every rank) but still compiled
        rem + F.floor((r - big_span - 1) / F.greatest(base, F.lit(1)))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(out_col, (tile + 1).cast("long"))
        .drop("__one", "__rank", "__n")
    )


@register(
    "corpus_select_budget",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT)
           AS tokens,
         CAST(n_chars AS DOUBLE)
           / (len(regexp_extract_all(lower(text), '{TOKEN_RE}')) + 1)
           AS quality
  FROM documents
),
c AS (
  SELECT doc_id, tokens, quality,
         CAST(SUM(tokens) OVER (
           ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, tokens, quality, cum_tokens
FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
""",
    tags=["llm", "sampling", "selection"],
)
def corpus_select_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained corpus selection: rank documents by a
    quality score (chars-per-token density here; any scorer slots in) and
    keep the greedy best-first prefix whose cumulative token count fits
    TOKEN_BUDGET — the standard "best N billion tokens" curation step.

    The running total uses prefix_sum_ordered, NOT a bare global window:
    `SUM() OVER (ORDER BY quality)` with no partition key plans as a
    single-task sort at any scale — this is the distributed prefix-sum
    form (range partition -> local window -> offset add). Quality is a
    ratio of exact integers in double — engine-identical, and doc_id
    breaks ties so the prefix is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0)))
    t = d.select(
        "doc_id",
        toks.cast("long").alias("tokens"),
        (F.col("n_chars").cast("double") / (toks + 1)).alias("quality"),
    )
    c = prefix_sum_ordered(
        t,
        "tokens",
        [F.col("quality").desc(), F.col("doc_id").asc()],
        "cum_tokens",
    )
    return c.where(F.col("cum_tokens") <= TOKEN_BUDGET)


SHARD_TOKENS = 6_000  # token capacity per output shard


@register(
    "shard_manifest",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT)
           AS tokens
  FROM documents
),
c AS (
  SELECT doc_id, tokens,
         CAST(SUM(tokens) OVER (
           ORDER BY doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM t
),
s AS (
  SELECT doc_id, tokens,
         CAST(FLOOR((cum - tokens) / {SHARD_TOKENS}.0) AS BIGINT) AS shard
  FROM c
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(tokens) AS BIGINT)   AS shard_tokens,
       CAST(MIN(doc_id) AS BIGINT)   AS first_doc,
       CAST(MAX(doc_id) AS BIGINT)   AS last_doc
FROM s
GROUP BY shard
""",
    tags=["llm", "sampling", "layout"],
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment + manifest — the dataset-layout step
    that writes a corpus as N output files of ~equal TOKEN mass (not row
    count), so every downstream reader/trainer gets uniform work per
    shard. A document's shard is its starting token offset divided by the
    shard capacity (greedy fill in document order), computed with the
    distributed prefix sum — no single-task window. Shards are contiguous
    doc-id ranges (first_doc/last_doc in the manifest), which is what
    makes the physical write one range-partitioned pass; every shard's
    token total lands within one document of the capacity."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0)))
    t = d.select("doc_id", toks.cast("long").alias("tokens"))
    return shard_summary(assign_shards(t))


def assign_shards(t: DataFrame, capacity: int = SHARD_TOKENS) -> DataFrame:
    """(doc_id, tokens) -> (doc_id, tokens, cum, shard): greedy token-fill
    in doc_id order via the distributed prefix sum. ONE definition of the
    layout rule — shard_manifest (the oracle-proven query) and the curate
    CLI pipeline must agree or shards silently drift."""
    c = prefix_sum_ordered(t, "tokens", [F.col("doc_id").asc()], "cum")
    return c.withColumn(
        "shard",
        F.floor((F.col("cum") - F.col("tokens")) / float(capacity)).cast("long"),
    )


def shard_summary(s: DataFrame) -> DataFrame:
    """Per-shard manifest rows from an assign_shards frame."""
    return s.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tokens").cast("long").alias("shard_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# --------------------------------------------------------- DSIR importance

DSIR_BUCKETS = 256  # hashed bigram feature buckets (10^4-10^6 in production)
DSIR_KEEP = 100     # documents resampled into the target-matched subset
DSIR_TARGET_LANG = "en"  # the target distribution: English documents
_DSIR_Q = 1e12      # per-gram ratio floor-quantum (exact DECIMAL summation)


@register(
    "dsir_importance",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang = '{DSIR_TARGET_LANG}' AS is_t,
         string_split(text, ' ') AS tokens
  FROM documents
),
g AS (
  SELECT doc_id, is_t,
         ('0x' || substr(md5(tokens[i] || ' ' || tokens[i + 1]), 1, 8))::BIGINT
           % {DSIR_BUCKETS} AS b
  FROM toks CROSS JOIN UNNEST(range(1, len(tokens))) u(i)
  WHERE len(tokens) >= 2
),
stats AS (
  SELECT b, COUNT(*) AS cnt_r,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS cnt_t
  FROM g GROUP BY b
),
tot AS (
  SELECT SUM(cnt_r) AS t_r, SUM(cnt_t) AS t_t FROM stats
),
per_doc AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CAST(FLOOR(
             (CAST(s.cnt_t + 1 AS DOUBLE) * CAST(tot.t_r + {DSIR_BUCKETS} AS DOUBLE))
           / (CAST(s.cnt_r + 1 AS DOUBLE) * CAST(tot.t_t + {DSIR_BUCKETS} AS DOUBLE))
           * {_DSIR_Q}) AS DECIMAL(38,0))) AS DOUBLE) / {_DSIR_Q} / COUNT(*)
           AS importance
  FROM g JOIN stats s USING (b) CROSS JOIN tot
  GROUP BY g.doc_id
),
ranked AS (
  SELECT d.doc_id,
         CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
         COALESCE(p.importance, 0.0) AS importance,
         CAST(ROW_NUMBER() OVER (
           ORDER BY COALESCE(p.importance, 0.0) DESC, d.doc_id ASC
         ) AS BIGINT) AS imp_rank
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT doc_id, n_grams, importance, imp_rank,
       imp_rank <= {DSIR_KEEP} AS selected
FROM ranked
""",
    tags=["llm", "sampling", "selection"],
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et al.,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how much its hashed-bigram distribution
    looks like a target distribution (here: the English sub-corpus), then
    resample the top-{DSIR_KEEP}. The importance of a bucket b is the
    smoothed likelihood ratio p_target(b)/p_raw(b); a document's score is
    the mean ratio over its bigram occurrences (DSIR sums log-ratios — the
    monotone rational form keeps the oracle engine-exact, since libm log
    differs in the last ulp across engines).

    Shape: bigrams are built in-row and hashed to {DSIR_BUCKETS} buckets
    (md5-based — engine-independent, unlike xxhash); the bucket stats
    table is AT MOST {DSIR_BUCKETS} rows — a driver scalar collected
    once and folded into a CONSTANT per-bucket ratio array (r14), so the
    per-doc score is one array index per gram plus one doc_id hash
    aggregate: exactly two corpus passes, the algorithm's floor.
    Nothing global materializes beyond the 256-row stats read. The
    final rank uses prefix_sum_ordered (range partition -> local window ->
    offset add), not a single-task global window; at 100 TB you'd replace
    the exact rank with a score threshold from a quantile sketch and skip
    the ordering entirely.

    Parity: bucket ratios are products/quotients of exact integers in
    double (exactly rounded, engine-identical); per-gram ratios are
    floor-quantized at {_DSIR_Q:.0e} and summed as exact integer DECIMAL
    (the ivf_centroids rationale — a raw double SUM is order-dependent)."""
    ranked = prefix_sum_ordered(
        _dsir_scored(spark, sf_dir),
        "__one",
        [F.col("importance").desc(), F.col("doc_id").asc()],
        "imp_rank",
    ).drop("__one")
    return ranked.withColumn("selected", F.col("imp_rank") <= DSIR_KEEP)


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-rank scoring stage of dsir_importance: (doc_id, n_grams,
    importance, __one) for every document — kept separate so the plan of
    the broadcast score join is assertable (the ranking wrapper's
    prefix_sum_ordered materializes a localCheckpoint, which truncates
    explain output past it)."""
    d = load_table(spark, sf_dir, "documents")
    # single-file fixture -> one scan partition; round-robin ahead of the
    # gram explode (see tables.spread — production layouts arrive pre-split)
    toks = _spread(d).select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_t"),
        F.split("text", " ").alias("tokens"),
    )
    g = (
        toks.where(F.size("tokens") >= 2)
        .select(
            "doc_id",
            "is_t",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tokens") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("tokens", i),
                        F.element_at("tokens", i + 1),
                    ),
                )
            ).alias("gram"),
        )
        .select(
            "doc_id",
            "is_t",
            (
                F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint")
                % DSIR_BUCKETS
            ).alias("b"),
        )
    )
    # r14 (guide §1.2 "how many passes are unavoidable"): DSIR is a
    # two-pass algorithm — bucket stats, then scoring — but the previous
    # broadcast-join shape evaluated the gram explode THREE times (once
    # under the stats BroadcastExchange, once under the totals
    # BroadcastExchange, once in the scoring pass). The stats table is at
    # most DSIR_BUCKETS (=256) rows, a driver scalar in the extrema/
    # in-plan-k-means family: collect it ONCE, fold the smoothed
    # likelihood ratios to a CONSTANT per-bucket array, and index it per
    # gram — one stats pass + one scoring pass, no per-gram hash probes.
    #
    # Parity: each factor is converted to double BEFORE multiplying
    # (float(int) is the same exact conversion as Spark's bigint->double
    # cast for counts < 2^53; a bigint product would overflow at corpus
    # scale), and the num/den products and the divide mirror the previous
    # Spark expression tree op-for-op — Python doubles ARE IEEE doubles,
    # so every bucket ratio is bit-identical to the joined form.
    stats_rows = g.groupBy("b").agg(
        F.count("*").alias("cnt_r"),
        F.sum(F.col("is_t").cast("long")).alias("cnt_t"),
    ).collect()
    cnt_r = {r["b"]: r["cnt_r"] for r in stats_rows}
    cnt_t = {r["b"]: r["cnt_t"] for r in stats_rows}
    t_r = sum(cnt_r.values())
    t_t = sum(cnt_t.values())
    ratio_by_bucket = []
    for bb in range(DSIR_BUCKETS):
        num = float(cnt_t.get(bb, 0) + 1) * float(t_r + DSIR_BUCKETS)
        den = float(cnt_r.get(bb, 0) + 1) * float(t_t + DSIR_BUCKETS)
        ratio_by_bucket.append(num / den)
    # a literal array of doubles constant-folds; per gram the ratio is
    # one index, not two broadcast-hash probes
    ratio = F.element_at(
        F.array(*[F.lit(r) for r in ratio_by_bucket]),
        F.col("b").cast("int") + 1,
    )
    per_doc = (
        g.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            (
                F.sum(
                    F.floor(ratio * F.lit(_DSIR_Q)).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(_DSIR_Q)
                / F.count("*")
            ).alias("importance"),
        )
    )
    alld = (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("importance", F.lit(0.0)).alias("importance"),
            F.lit(1).alias("__one"),
        )
    )
    return alld
