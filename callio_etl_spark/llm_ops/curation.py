"""Corpus-curation audit operators (SURVEY.md section 7.4 extensions):
per-domain quality ledgers, cross-source duplicate detection, bounded-memory
heavy-hitter sketches, and embedding-space eval-set decontamination.

These are the web-curation passes a RefinedWeb/CCNet-style pipeline runs
between raw ingest and training-mix assembly: decide which DOMAINS to keep
(``domain_stats``), find content syndicated across sources
(``dedup_cross_source``), track the hottest tokens without a corpus-sized
vocabulary (``heavy_hitters_cms``), and strip training vectors that are
near-duplicates of the eval set (``embedding_decontaminate``).

Scale design (100 TB):
- ``domain_stats``      two map-combined aggregates keyed by (source[, fp])
  — reduce side is bounded by |domains| + |distinct fingerprints|, and the
  fingerprint key is an md5 (uniform, no skew).
- ``dedup_cross_source``one hash agg on the content fingerprint; output is
  only the cross-source clusters.
- ``heavy_hitters_cms`` the sketch is DEPTH x WIDTH counters regardless of
  corpus size (the point of count-min); the exact side here exists to
  verify the sketch's overestimate-only contract and would be
  candidate-scoped in production.
- ``embedding_decontaminate`` candidates restricted to the eval vector's
  IVF cell (broadcast eval side), so the scan is |cell|x|eval|, never
  N x |eval| — same recall contract as ann_topk_ivf.

Hash parity: all cross-engine hashes are md5 slices (dedup_ops.py's
recipe); Spark ``conv(substr(md5(x), o, 8), 16, 10)`` == DuckDB
``('0x' || substr(md5(x), o, 8))::BIGINT``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from callio_etl_spark.functions import ranked_topk
from callio_etl_spark.llm_ops.dedup_ops import (
    TOKEN_RE,
    _bands_union_sql,
    content_fp,
)
from callio_etl_spark.llm_ops.similarity import (
    SEM_TAU,
    _emb,
    cosine,
    cosine_with_norms,
    norm,
)
from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table, spread as _spread

CMS_DEPTH = 4  # disjoint 8-hex-char md5 slices = 4 independent hashes
CMS_WIDTH = 512
HH_K = 20

EVAL_MOD = 29  # vec_id % EVAL_MOD == EVAL_REM defines the held-out eval set
EVAL_REM = 3

_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
_TOKS_SQL = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"


@register(
    "domain_stats",
    oracle=f"""
WITH f AS (
  SELECT source, lang, {_FP_SQL} AS fp,
         len({_TOKS_SQL}) AS n_tok, n_chars
  FROM documents
), g AS (
  SELECT source, fp, COUNT(*) AS cnt,
         SUM(n_tok) AS tok_sum, SUM(n_chars) AS chr_sum
  FROM f GROUP BY source, fp
), l AS (
  SELECT source, COUNT(DISTINCT lang) AS n_langs FROM f GROUP BY source
)
SELECT g.source,
       CAST(SUM(g.cnt) AS BIGINT)      AS n_docs,
       CAST(COUNT(*) AS BIGINT)        AS n_unique_docs,
       CAST(SUM(CASE WHEN g.cnt > 1 THEN g.cnt ELSE 0 END) AS BIGINT)
                                       AS dup_docs,
       CAST(SUM(CASE WHEN g.cnt > 1 THEN g.cnt ELSE 0 END) AS DOUBLE)
         / CAST(SUM(g.cnt) AS DOUBLE)  AS dup_ratio,
       CAST(SUM(g.tok_sum) AS BIGINT)  AS total_tokens,
       CAST(SUM(g.chr_sum) AS DOUBLE)
         / CAST(SUM(g.cnt) AS DOUBLE)  AS avg_chars,
       MIN(l.n_langs)                  AS n_langs
FROM g JOIN l ON g.source = l.source
GROUP BY g.source
""",
    tags=["llm", "curation"],
)
def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation ledger: doc counts, within-domain exact-dup rate,
    token volume, mean length, language spread. This is the table a
    curation pipeline thresholds to drop low-quality / high-dup domains
    before any per-document work (RefinedWeb's per-domain triage).

    Plan: one scan -> groupBy(source, fp) (map-combined, md5 key so no
    skew) -> groupBy(source); the distinct-lang agg is a second tiny
    aggregate joined on the |domains|-sized key. No window, no explode."""
    d = load_table(spark, sf_dir, "documents")
    f = d.select(
        "source",
        "lang",
        content_fp().alias("fp"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "n_tok"
        ),
        "n_chars",
    )
    g = f.groupBy("source", "fp").agg(
        F.count("*").alias("cnt"),
        F.sum("n_tok").alias("tok_sum"),
        F.sum("n_chars").alias("chr_sum"),
    )
    langs = f.groupBy("source").agg(F.countDistinct("lang").alias("n_langs"))
    dup_cnt = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
    stats = g.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.count("*").alias("n_unique_docs"),
        dup_cnt.alias("dup_docs"),
        (dup_cnt.cast("double") / F.sum("cnt").cast("double")).alias("dup_ratio"),
        F.sum("tok_sum").alias("total_tokens"),
        (F.sum("chr_sum").cast("double") / F.sum("cnt").cast("double")).alias(
            "avg_chars"
        ),
    )
    return stats.join(F.broadcast(langs), "source").select(
        "source",
        "n_docs",
        "n_unique_docs",
        "dup_docs",
        "dup_ratio",
        "total_tokens",
        "avg_chars",
        "n_langs",
    )


@register(
    "cross_source_neardup",
    oracle=f"""
WITH bands AS (
{_bands_union_sql()}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
), src AS (
  SELECT doc_id, source FROM documents
)
SELECT least(sa.source, sb.source)    AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       CAST(COUNT(*) AS BIGINT)       AS n_pairs,
       MIN(p.doc_a)                   AS example_doc
FROM pairs p
JOIN src sa ON sa.doc_id = p.doc_a
JOIN src sb ON sb.doc_id = p.doc_b
WHERE sa.source <> sb.source
GROUP BY least(sa.source, sb.source), greatest(sa.source, sb.source)
""",
    tags=["llm", "curation", "dedup"],
)
def cross_source_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syndication matrix: for every unordered pair of sources, how many
    MinHash-LSH near-dup candidate pairs span them. Within-source dups are
    a crawl artifact; CROSS-source near-dups are syndication (wire copy,
    mirrors) — this is the |domains|x|domains|-bounded audit a curation
    pipeline reads before deciding per-source keep rates.

    Plan — COUNT-factorized over exact-text groups (the dedup_pipeline
    exact-collapse idea applied to counting): verbatim copies share the
    MinHash signature, so whether a doc pair collides in a band depends
    only on their texts. Grouping docs by md5(text) into (group, source)
    cells with (cnt, min_doc), every candidate doc pair is either

      * BETWEEN two distinct colliding groups X != Y: each source combo
        (s from X, t from Y) contributes cnt_Xs * cnt_Yt pairs whose
        smallest doc_a is min(min_Xs, min_Yt)  [a pair (x0,y0) of the two
        cell minima has min(x0,y0) <= min(x,y) for every other pair], or
      * WITHIN one group (identical texts always collide): source combo
        s < t contributes cnt_s * cnt_t pairs with min(min_s, min_t).

    The band self-join therefore runs on one REP per group (never the raw
    corpus — verbatim duplication can't square the bucket sizes) and the
    counts are closed-form arithmetic on the |groups x sources| cell
    table; the doc_id-keyed stat joins are uniform and AQE-safe. Output
    is bit-identical to the raw-pair definition the oracle states.

    The rep frame is carved out with a tkey-PARTITIONED window min (one
    uniform hash shuffle), not a groupBy+self-join: a window keeps the
    scan's size statistics, so the downstream band self-join still gets
    the right physical strategy per scale (broadcast at test sizes,
    shuffle join at corpus scale) instead of inheriting a join-inflated
    estimate that forces sort-merge everywhere."""
    from pyspark.sql import Window

    from callio_etl_spark.llm_ops.dedup_ops import (
        _minband_band_table,
        _minband_pairs,
    )

    d = _spread(load_table(spark, sf_dir, "documents"))
    keyed = d.select(
        "doc_id", "text", "source", F.md5("text").alias("tkey")
    ).withColumn("rep_id", F.min("doc_id").over(Window.partitionBy("tkey")))
    from callio_etl_spark.llm_ops.matutil import materialize

    cells = materialize(
        keyed.groupBy("rep_id", "source").agg(
            F.count("*").alias("cnt"), F.min("doc_id").alias("min_doc")
        ),
        "neardup_cells",
    )
    rep_docs = _spread(
        keyed.where(F.col("doc_id") == F.col("rep_id")).select("doc_id", "text")
    )
    # r14: first-matching-band emission makes the candidate pairs
    # distinct by construction — the post-join DISTINCT (an Exchange ~2x
    # the pair output) is gone; see dedup_ops._minband_pairs
    rep_pairs = _minband_pairs(_minband_band_table(rep_docs)).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    sa = cells.select(
        F.col("rep_id").alias("doc_a"), F.col("source").alias("src_a"),
        F.col("cnt").alias("cnt_a"), F.col("min_doc").alias("min_a"),
    )
    sb = cells.select(
        F.col("rep_id").alias("doc_b"), F.col("source").alias("src_b"),
        F.col("cnt").alias("cnt_b"), F.col("min_doc").alias("min_b"),
    )
    between = (
        rep_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("src_a") != F.col("src_b"))
    )
    within = cells.alias("x").join(
        cells.alias("y"),
        (F.col("x.rep_id") == F.col("y.rep_id"))
        & (F.col("x.source") < F.col("y.source")),
    ).select(
        F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b"),
        F.col("x.cnt").alias("cnt_a"), F.col("y.cnt").alias("cnt_b"),
        F.col("x.min_doc").alias("min_a"), F.col("y.min_doc").alias("min_b"),
    )
    contrib = between.select(
        "src_a", "src_b", "cnt_a", "cnt_b", "min_a", "min_b"
    ).unionByName(within)
    return (
        contrib.groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.sum(F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("n_pairs"),
            F.min(F.least("min_a", "min_b")).alias("example_doc"),
        )
    )


def _cms_bucket(tok: Column, depth: int) -> Column:
    """Depth-``depth`` count-min bucket: disjoint 8-hex-char slice of ONE
    md5 per token (minhash's slicing trick — one digest, D independent
    uniform hashes)."""
    return (
        F.conv(F.substring(F.md5(tok), depth * 8 + 1, 8), 16, 10).cast("long")
        % CMS_WIDTH
    )


def _cms_bucket_sql(tok_expr: str, depth: int) -> str:
    return f"('0x' || substr(md5({tok_expr}), {depth * 8 + 1}, 8))::BIGINT % {CMS_WIDTH}"


@register(
    "heavy_hitters_cms",
    oracle=f"""
WITH occ AS (
  SELECT unnest({_TOKS_SQL}) AS tok FROM documents
), exact AS (
  SELECT tok, COUNT(*) AS exact_cnt FROM occ GROUP BY tok
), top AS (
  SELECT tok, exact_cnt,
         row_number() OVER (ORDER BY exact_cnt DESC, tok ASC) AS rank
  FROM exact
  QUALIFY rank <= {HH_K}
), keyed AS (
  SELECT tok, d.depth,
         CASE d.depth
           {" ".join(f"WHEN {i} THEN {_cms_bucket_sql('tok', i)}" for i in range(CMS_DEPTH))}
         END AS bucket
  FROM occ, (SELECT unnest([{", ".join(str(i) for i in range(CMS_DEPTH))}]) AS depth) d
), sketch AS (
  SELECT depth, bucket, COUNT(*) AS cnt FROM keyed GROUP BY depth, bucket
), tk AS (
  SELECT t.tok, t.exact_cnt, t.rank, d.depth,
         CASE d.depth
           {" ".join(f"WHEN {i} THEN {_cms_bucket_sql('t.tok', i)}" for i in range(CMS_DEPTH))}
         END AS bucket
  FROM top t, (SELECT unnest([{", ".join(str(i) for i in range(CMS_DEPTH))}]) AS depth) d
)
SELECT tk.tok, tk.rank, tk.exact_cnt,
       MIN(s.cnt)                 AS cms_est,
       MIN(s.cnt) - tk.exact_cnt  AS overest
FROM tk JOIN sketch s ON tk.depth = s.depth AND tk.bucket = s.bucket
GROUP BY tk.tok, tk.rank, tk.exact_cnt
""",
    tags=["llm", "curation", "sketch"],
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via a count-min sketch, verified against exact
    counts. The sketch is DEPTH x WIDTH = 4x512 counters TOTAL — constant
    memory at any corpus size — and count-min's contract is
    estimate >= truth, always: ``overest`` is the per-token slack and the
    oracle proves it's computed identically cross-engine.

    Plan (r14): ONE token explode -> exact word-count agg; BOTH outputs
    derive from that dictionary-sized table — (a) TakeOrdered top-K, and
    (b) the sketch, since the (depth, bucket) occurrence count is exactly
    the SUM of exact_cnt over the tokens hashing into the bucket (integer
    identity, bit-equal to counting raw occurrences). The r13 shape ran
    the corpus explode twice and posexploded D bucket keys per
    OCCURRENCE; now the D-way posexplode runs per DISTINCT TOKEN — the
    word-count exchange is shared by both branches (ReusedExchange), so
    the corpus is scanned and tokenized once. This operator is an AUDIT
    (sketch vs truth needs the exact counts), so its exact aggregate is
    inherent; the sketch-only production path (estimates straight from
    the D*W counters) is what a 100 TB deployment runs after this audit
    validates the sketch geometry on a slice — and at that scale the
    map-side-merged fixed D*W state argument is unchanged, it just folds
    counts instead of 1s."""
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "tok"
        )
    )
    # materialized once (dictionary-sized): BOTH consumers below read
    # the checkpointed word counts, so the corpus explode runs exactly
    # once even where plan-level exchange reuse does not fire
    from callio_etl_spark.llm_ops.matutil import materialize

    exact = materialize(
        occ.groupBy("tok").agg(F.count("*").alias("exact_cnt")),
        "hh_word_counts",
    )
    top = ranked_topk(
        exact, [F.col("exact_cnt").desc(), F.col("tok").asc()], HH_K, "rank"
    )
    sketch = (
        exact.select(
            "exact_cnt",
            F.posexplode(
                F.array(*[_cms_bucket(F.col("tok"), i) for i in range(CMS_DEPTH)])
            ).alias("depth", "bucket"),
        )
        .groupBy("depth", "bucket")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    keyed_top = top.select(
        "tok",
        "rank",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), i) for i in range(CMS_DEPTH)])
        ).alias("depth", "bucket"),
    )
    return (
        keyed_top.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("tok", "rank", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "tok",
            "rank",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overest"),
        )
    )


@register(
    "embedding_decontaminate",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ev AS (
  SELECT * FROM e WHERE vec_id % {EVAL_MOD} = {EVAL_REM}
), tr AS (
  SELECT * FROM e WHERE vec_id % {EVAL_MOD} <> {EVAL_REM}
)
SELECT tr.vec_id                       AS train_id,
       CAST(COUNT(*) AS BIGINT)        AS n_eval_hits,
       MAX(list_cosine_similarity(tr.v, ev.v)) AS max_cosine,
       MIN(ev.vec_id)                  AS first_eval_id
FROM tr JOIN ev ON tr.label = ev.label
WHERE list_cosine_similarity(tr.v, ev.v) > {SEM_TAU}
GROUP BY tr.vec_id
""",
    tags=["llm", "curation", "decontamination"],
)
def embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination: the train-side REMOVE list — every
    training vector whose cosine to any eval vector exceeds SEM_TAU, with
    hit count, worst similarity, and one offending eval id. This is the
    embedding-space complement of the n-gram ``contamination_check``:
    paraphrased eval leakage that shares no 8-gram still collides here.

    Candidates are restricted to the eval vector's IVF cell (``label``)
    with the eval side broadcast — per-partition work is |cell| x |eval|,
    never N x |eval|, the same recall-for-scale trade as ann_topk_ivf
    (multi-probe widens recall identically). MAX over bit-identical
    sequential-fold cosines keeps the oracle exact.

    Both sides are deduplicated by vector CONTENT before scoring (the
    exact-collapse idea applied to flops): cosine depends only on (v, ev),
    so distinct (label, v) groups are scored once — eval groups carry
    (multiplicity w, min vec_id) so hit counts and first_eval_id are
    exact, and a doc_id-keyed fan-out join restores the per-train-vector
    rows. Ingest dups (re-crawls, mirrored shards) then cost one hash-agg
    row instead of a full re-score against the eval broadcast."""
    e = _emb(spark, sf_dir)
    vkey = F.md5(F.col("v").cast("string")).alias("vkey")
    is_eval = F.col("vec_id") % EVAL_MOD == EVAL_REM
    evg = (
        e.where(is_eval)
        .groupBy(F.col("label").alias("el"), F.md5(F.col("v").cast("string")).alias("evkey"))
        .agg(
            F.min_by("v", "vec_id").alias("ev"),
            F.count("*").alias("w"),
            F.min("vec_id").alias("min_eval"),
        )
    )
    tr = e.where(~is_eval).select("vec_id", "label", "v", vkey)
    # r14: norms hoisted out of the pair scoring — |v| and |ev| each
    # depend on one side only, so they are computed once per distinct
    # group here and the per-pair work is a single dot fold
    # (cosine_with_norms is bit-identical to cosine; guide §1.2)
    trg = (
        tr.groupBy("label", "vkey")
        .agg(F.min_by("v", "vec_id").alias("v"))
        .withColumn("tnrm", norm(F.col("v")))
    )
    evn = evg.withColumn("enrm", norm(F.col("ev")))
    cos = cosine_with_norms(
        F.col("v"), F.col("ev"), F.col("tnrm"), F.col("enrm")
    )
    hits = (
        trg.join(F.broadcast(evn), F.col("label") == F.col("el"))
        .where(cos > SEM_TAU)
        .groupBy("label", "vkey")
        .agg(
            F.sum("w").cast("long").alias("n_eval_hits"),
            F.max(cos).alias("max_cosine"),
            F.min("min_eval").alias("first_eval_id"),
        )
    )
    return tr.join(hits, ["label", "vkey"]).select(
        F.col("vec_id").alias("train_id"),
        "n_eval_hits", "max_cosine", "first_eval_id",
    )
