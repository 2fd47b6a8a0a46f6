"""Training-corpus layout operators: document chunking, sequence packing,
stratified sampling (SURVEY.md section 7.4 extension surface).

These are the last-mile ops of an LLM data pipeline — after dedup and
filtering, documents are cut into model-context-sized chunks, packed into
fixed token budgets, and class-balanced:

- ``chunk_documents``   fixed-size token-window chunking (window=stride=
  CHUNK_TOKENS). Pure per-row explode: ``sequence`` builds the chunk index
  list, ``slice`` cuts the token array — no shuffle at all, scales as a map
  over the corpus. Overlapping windows = same plan with stride < window.
- ``pack_sequences``    streaming-order packing: running token total per
  source partition, pack id = floor(cum_before / budget). One window sort
  per source. This is the scalable approximation of bin packing — true
  first-fit-decreasing is inherently sequential, so at 100 TB you pack
  within partitions (source here) and accept boundary straddle; the
  degenerate docs-longer-than-budget case still lands each doc in exactly
  one pack.
- ``stratified_sample`` per-stratum deterministic downsampling to a target
  count-rate: u = first-32-bits-of-MD5(key) as in [hash_split], kept when
  u < target/|stratum|. Per-stratum sizes come from one tiny aggregate
  (broadcast back); membership stays reproducible from the key alone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

CHUNK_TOKENS = 50
PACK_BUDGET = 512
TARGET_PER_STRATUM = 100


@register(
    "chunk_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT)))
           AS chunk_id
  FROM t
)
SELECT doc_id,
       chunk_id,
       array_to_string(
         toks[chunk_id * {CHUNK_TOKENS} + 1 : chunk_id * {CHUNK_TOKENS} + {CHUNK_TOKENS}],
         ' ')                                                    AS chunk_text,
       CAST(least({CHUNK_TOKENS},
                  len(toks) - chunk_id * {CHUNK_TOKENS}) AS BIGINT) AS chunk_tokens
FROM c
""",
    tags=["llm", "chunking"],
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each document into {CHUNK_TOKENS}-token windows. sequence() +
    explode + slice — all codegen'd array ops, zero shuffle; output rows
    carry (doc_id, chunk_id) so downstream packing/training can address
    chunks stably."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast("long")
    c = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * CHUNK_TOKENS + 1).cast("int")
    return c.select(
        "doc_id",
        "chunk_id",
        F.array_join(F.slice(F.col("toks"), start, CHUNK_TOKENS), " ").alias(
            "chunk_text"
        ),
        F.least(
            F.lit(CHUNK_TOKENS).cast("long"),
            F.size("toks").cast("long") - F.col("chunk_id") * CHUNK_TOKENS,
        ).alias("chunk_tokens"),
    )


@register(
    "pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT source,
       -- // is floor division: DuckDB's CAST(double AS BIGINT) *rounds*,
       -- Spark's truncates, so never compare through a float cast here.
       -- The BIGINT cast matters too: the windowed SUM is HUGEINT, and
       -- HUGEINT // x stays HUGEINT, which pandas widens to float64 while
       -- Spark emits int64 — numerically equal but hash-different.
       CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM p
GROUP BY source, cum_before // {PACK_BUDGET}
""",
    tags=["llm", "chunking"],
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {PACK_BUDGET}-token budgets in stable (source,
    doc_id) order: pack id = floor(tokens-before-me / budget). One window
    shuffle on source, then a hash aggregate that reuses the same
    partitioning (no second exchange)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = t.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        p.withColumn(
            "pack_id", F.floor(F.col("cum_before") / PACK_BUDGET).cast("long")
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
    )


@register(
    "stratified_sample",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
           / 4294967296.0 AS u,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents
)
SELECT doc_id, lang, u
FROM s
WHERE u < {TARGET_PER_STRATUM}.0 / n_lang
""",
    tags=["llm", "sampling"],
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balancing downsample: keep each doc with probability
    target/|stratum| (capped at 1 implicitly — u < rate always keeps when
    rate >= 1), u derived from MD5(doc_id) exactly as in hash_split so the
    selection is engine-independent and stable across reruns. The
    per-stratum count is a window over lang — at scale, swap for a tiny
    groupBy + broadcast join; semantics identical."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    s = d.select(
        "doc_id",
        "lang",
        u.alias("u"),
        F.count("*").over(Window.partitionBy("lang")).alias("n_lang"),
    )
    return s.where(
        F.col("u") < F.lit(float(TARGET_PER_STRATUM)) / F.col("n_lang")
    ).select("doc_id", "lang", "u")


CHUNK_STRIDE = 32  # < CHUNK_TOKENS -> consecutive windows overlap by 18 tokens


@register(
    "chunk_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(range(0,
           CAST(ceil(greatest(len(toks) - {CHUNK_TOKENS}, 0) / {CHUNK_STRIDE}.0)
                AS BIGINT) + 1)) AS win_id
  FROM t
)
SELECT doc_id,
       win_id,
       CAST(win_id * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       array_to_string(
         toks[win_id * {CHUNK_STRIDE} + 1 : win_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
         ' ')                                                      AS chunk_text,
       CAST(least({CHUNK_TOKENS},
                  len(toks) - win_id * {CHUNK_STRIDE}) AS BIGINT)  AS chunk_tokens
FROM c
""",
    tags=["llm", "chunking"],
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding-window) chunking — stride {CHUNK_STRIDE} <
    window {CHUNK_TOKENS}, the standard training-data layout that preserves
    context across chunk boundaries (each consecutive pair shares
    {CHUNK_TOKENS - CHUNK_STRIDE} tokens). Window count is
    ceil(max(n - window, 0) / stride) + 1, so every document emits at least
    one chunk and the last window always reaches the document's end.

    Same plan shape as ``chunk_documents``: sequence() + explode + slice,
    all codegen'd array ops, zero shuffle — overlap changes only the window
    arithmetic, not the distribution strategy, so the map-only scaling
    holds at any stride."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_win = (
        F.ceil(
            F.greatest(F.size(toks) - CHUNK_TOKENS, F.lit(0))
            / F.lit(float(CHUNK_STRIDE))
        ).cast("long")
        + 1
    )
    c = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_win - 1)).alias("win_id"),
    )
    start = F.col("win_id") * CHUNK_STRIDE
    return c.select(
        "doc_id",
        "win_id",
        start.cast("long").alias("start_tok"),
        F.array_join(
            F.slice(F.col("toks"), (start + 1).cast("int"), CHUNK_TOKENS), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(CHUNK_TOKENS).cast("long"),
            F.size("toks").cast("long") - start,
        ).alias("chunk_tokens"),
    )


# ---------------------------------------------------------- length batching

N_BATCHES = 32


@register(
    "length_batching",
    oracle="""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
binned AS (
  SELECT doc_id, n_tokens,
         NTILE(32) OVER (ORDER BY n_tokens DESC, doc_id) AS batch_id
  FROM scored
)
SELECT CAST(batch_id AS BIGINT)        AS batch_id,
       CAST(COUNT(*) AS BIGINT)        AS batch_size,
       CAST(MAX(n_tokens) AS BIGINT)   AS max_len,
       CAST(SUM(n_tokens) AS BIGINT)   AS sum_len,
       CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
                                       AS padding_waste,
       CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS DOUBLE)
         / CAST(MAX(n_tokens) * COUNT(*) AS DOUBLE)  AS waste_frac
FROM binned
GROUP BY batch_id
""",
    tags=["llm", "chunking", "batching"],
)
def length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batching — the padding-minimizing batch assignment
    used for training and batch inference: sort documents by token count
    (unique doc_id tiebreak), NTILE into equal-size batches so each batch
    holds near-equal lengths, and report the padding waste a dense
    [batch_size x max_len] tensor would carry. The waste_frac column is
    the metric length-grouped batching exists to minimize (random
    batching at this corpus's length spread wastes 30-50%).

    Plan/scale: one projection for token counts, then NTILE computed
    DISTRIBUTED via ntile_ordered (prefix-sum global rank + closed-form
    tile) — a bare ``ntile() OVER (ORDER BY ...)`` would drag the whole
    corpus through one WindowExec task; here the widest task holds one
    range partition. At 100 TB, swap NTILE for width_bucket on the
    (known) length distribution and even the rank's shuffles disappear;
    the aggregate is map-side partial either way."""
    from callio_etl_spark.llm_ops.sampling import ntile_ordered

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    binned = ntile_ordered(
        scored,
        [F.col("n_tokens").desc(), F.col("doc_id")],
        N_BATCHES,
        "batch_id",
    )
    dense = F.col("max_len") * F.col("batch_size")
    return (
        binned.groupBy(F.col("batch_id").cast("long").alias("batch_id"))
        .agg(
            F.count("*").cast("long").alias("batch_size"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_len"),
        )
        .select(
            "batch_id",
            "batch_size",
            "max_len",
            "sum_len",
            (dense - F.col("sum_len")).cast("long").alias("padding_waste"),
            (
                (dense - F.col("sum_len")).cast("double") / dense.cast("double")
            ).alias("waste_frac"),
        )
    )
