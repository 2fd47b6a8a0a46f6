"""Text-analysis operators for LLM training-data pipelines (SURVEY.md
section 7.4 / BASELINE.json north star).

All computed with built-in expressions (whole-stage codegen) over the
`documents` table: language-ID heuristic, quality scoring, token counting,
and document fingerprinting. No Python UDF anywhere — at 100 TB these run
as a single scan with map-side projection, no shuffle.

Determinism: ratios are single IEEE divisions of exact integers and
identical expression trees on both engines — bit-identical without rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from callio_etl_spark.llm_ops.similarity import TOP_K as _RRF_DENSE_K
from callio_etl_spark.functions import ranked_topk
from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table, spread as _spread

TOKEN_RE = "[a-z0-9]+"
PUNCT_RE = r"[.,;:!?'\"()\-]"
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_PUNCT_SQL = PUNCT_RE.replace("'", "''")  # escape the quote for SQL literals


@register(
    "text_stats",
    oracle=f"""
WITH t AS (
  SELECT d.doc_id, d.lang, d.n_chars,
         lower(d.text) AS lo,
         regexp_extract_all(lower(d.text), '{TOKEN_RE}') AS toks
  FROM documents d
)
SELECT
  t.doc_id,
  t.lang,
  length(t.lo)                                   AS n_chars_calc,
  CAST(len(t.toks) AS BIGINT)                    AS n_tokens,
  CAST(len(list_distinct(t.toks)) AS BIGINT)     AS n_unique_tokens,
  CAST(len(list_filter(t.toks, w -> list_contains([{_STOP_SQL}], w))) AS BIGINT)
                                                 AS n_stopwords,
  CAST(length(t.lo) - length(regexp_replace(t.lo, '{_PUNCT_SQL}', '', 'g')) AS BIGINT)
                                                 AS n_punct,
  CAST(len(list_filter(t.toks, w -> list_contains([{_STOP_SQL}], w))) AS DOUBLE)
    / NULLIF(CAST(len(t.toks) AS DOUBLE), 0.0)   AS stopword_ratio,
  CAST(len(list_distinct(t.toks)) AS DOUBLE)
    / NULLIF(CAST(len(t.toks) AS DOUBLE), 0.0)   AS ttr
FROM t
""",
    tags=["llm", "text"],
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical stats: whitespace/regex tokenization, distinct
    tokens, stopword and punctuation counts, type-token ratio. The tokenizer
    regex is the BPE-ish pre-tokenizer split (words+digits); swap TOKEN_RE for
    a fuller GPT-style pattern in production."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE per row: the token array lands as its own projection
    # level referenced several times below, which blocks CollapseProject
    # from inlining the regexp into each consumer (r14 measured the
    # inlined form re-running regexp_extract_all per consuming
    # expression — a 3-5x per-row constant on every text query)
    tok = d.select(
        "doc_id",
        "lang",
        F.lower("text").alias("__lo"),
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    lo = F.col("__lo")
    stops = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stops, w))).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    return tok.select(
        "doc_id",
        "lang",
        F.length(lo).alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        n_stop.alias("n_stopwords"),
        (F.length(lo) - F.length(F.regexp_replace(lo, PUNCT_RE, "")))
        .cast("long")
        .alias("n_punct"),
        (n_stop.cast("double") / F.nullif(n_tok.cast("double"), F.lit(0.0))).alias(
            "stopword_ratio"
        ),
        (n_uniq.cast("double") / F.nullif(n_tok.cast("double"), F.lit(0.0))).alias("ttr"),
    )


@register(
    "quality_score",
    oracle=f"""
WITH t AS (
  SELECT d.doc_id,
         regexp_extract_all(lower(d.text), '{TOKEN_RE}') AS toks,
         length(d.text) AS n_chars
  FROM documents d
),
m AS (
  SELECT doc_id, n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, w -> list_contains([{_STOP_SQL}], w))) AS BIGINT)
           AS n_stop
  FROM t
)
SELECT doc_id,
  LEAST(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) * 0.5
    + CASE WHEN n_tokens > 0
           THEN LEAST(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 4.0, 1.0)
           ELSE 0.0 END * 0.3
    + CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 0.2 ELSE 0.0 END
  AS quality,
  (n_tokens >= 10) AS passes_min_len
FROM m
""",
    tags=["llm", "text"],
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score: length saturation + stopword density
    (fluency proxy) + char-range bonus, plus a hard min-length gate. The
    weights mirror common pretraining-data filters (e.g. C4/Gopher rules);
    all built-in expressions, single scan."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize once per row (see text_stats): the alias level keeps the
    # regexp out of each consuming expression
    tok = d.select(
        "doc_id",
        F.length("text").alias("__nc"),
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    stops = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stops, w))).cast("long")
    n_chars = F.col("__nc")
    quality = (
        F.least(n_tok.cast("double") / 200.0, F.lit(1.0)) * 0.5
        + F.when(
            n_tok > 0,
            F.least(n_stop.cast("double") / n_tok.cast("double") * 4.0, F.lit(1.0)),
        ).otherwise(0.0)
        * 0.3
        + F.when(n_chars.between(50, 5000), 0.2).otherwise(0.0)
    )
    return tok.select(
        "doc_id",
        quality.alias("quality"),
        (n_tok >= 10).alias("passes_min_len"),
    )


@register(
    "lang_id",
    oracle=f"""
WITH t AS (
  SELECT d.doc_id, d.lang,
         regexp_extract_all(lower(d.text), '{TOKEN_RE}') AS toks
  FROM documents d
),
m AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, w -> list_contains([{_STOP_SQL}], w))) AS BIGINT)
           AS en_hits,
         CAST(len(list_filter(toks, w -> list_contains(['de','la','el','que','en','es'], w))) AS BIGINT)
           AS es_hits
  FROM t
)
SELECT doc_id, lang,
  CASE WHEN en_hits >= es_hits AND en_hits * 10 >= n_tokens THEN 'en'
       WHEN es_hits > en_hits AND es_hits * 10 >= n_tokens THEN 'es'
       ELSE 'unknown' END AS lang_guess
FROM m
""",
    tags=["llm", "text"],
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit voting per candidate language
    (n-gram/function-word profiling — the classic fastText-free fallback).
    Integer comparisons only, so cross-engine exact. Real pipelines plug a
    model here; the operator shape (scan + scoring projection) is identical."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize once per row (see text_stats)
    tok = d.select(
        "doc_id",
        "lang",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    en = F.array([F.lit(w) for w in EN_STOPWORDS])
    es = F.array([F.lit(w) for w in ["de", "la", "el", "que", "en", "es"]])
    n_tok = F.size(toks).cast("long")
    en_hits = F.size(F.filter(toks, lambda w: F.array_contains(en, w))).cast("long")
    es_hits = F.size(F.filter(toks, lambda w: F.array_contains(es, w))).cast("long")
    return tok.select(
        "doc_id",
        "lang",
        F.when((en_hits >= es_hits) & (en_hits * 10 >= n_tok), "en")
        .when((es_hits > en_hits) & (es_hits * 10 >= n_tok), "es")
        .otherwise("unknown")
        .alias("lang_guess"),
    )


@register(
    "fingerprint",
    oracle="""
SELECT d.doc_id,
       md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fp,
       substr(md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))), 1, 8)
         AS fp_bucket
FROM documents d
""",
    tags=["llm", "text", "P7"],
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: MD5 over whitespace-normalized lowercased text
    (the content-defined identity used for exact dedup), plus an 8-hex-char
    bucket prefix usable as a shard key. Generalizes the reference's row_hash
    change-detection (utils.py:46-66) to document content."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    fp = F.md5(norm)
    return d.select("doc_id", fp.alias("fp"), F.substring(fp, 1, 8).alias("fp_bucket"))


EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
URL_RE = "https?://[^ ]+"


@register(
    "pii_scrub",
    oracle=f"""
WITH seeded AS (
  -- deterministic synthetic PII so the redaction paths are actually
  -- exercised (the synthetic corpus contains none)
  SELECT doc_id,
         text || ' contact u' || doc_id ||
         '@example.com via https://example.com/u/' || doc_id AS t
  FROM documents WHERE doc_id % 4 = 0
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{URL_RE}')) AS BIGINT)   AS n_urls,
       substr(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                             '{URL_RE}', '<URL>', 'g'),
              -60, 60)                                          AS scrubbed_tail
FROM seeded
""",
    tags=["llm", "text", "pii"],
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the standard pre-training scrub pass: count and mask
    emails/URLs with placeholder tokens. Pure per-row regexp (codegen, no
    shuffle); extend the pattern list (phone, SSN, IP) the same way. The
    synthetic corpus carries no PII, so a deterministic doc_id-derived
    email+URL is appended first — the redaction is verified against real
    matches, not vacuous zero counts."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    t = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via https://example.com/u/"),
        F.col("doc_id").cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.substring(scrubbed, -60, 60).alias("scrubbed_tail"),
    )


MIN_TOKENS, MAX_TOKENS = 10, 10_000
MAX_REPEAT_RATIO = 0.30  # top token may claim at most 30% of the doc


@register(
    "corpus_filter",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, text,
         regexp_extract_all(lower(text), '{{TOKEN_RE}}') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS BIGINT)                 AS n_tok,
         CAST(len(list_distinct(toks)) AS BIGINT)  AS n_uniq,
         CAST((SELECT max(cnt) FROM (
            SELECT COUNT(*) AS cnt FROM unnest(toks) AS u(w) GROUP BY w
         )) AS BIGINT)                             AS top_tok
  FROM t
)
SELECT doc_id, lang, n_tok,
       CAST(n_tok >= {MIN_TOKENS} AND n_tok <= {MAX_TOKENS} AS BIGINT)  AS len_ok,
       CAST(top_tok <= CAST(ceil(n_tok * {MAX_REPEAT_RATIO}) AS BIGINT) AS BIGINT)
                                                                        AS repeat_ok,
       CAST(lang IN ('en', 'de', 'fr', 'es', 'zh') AS BIGINT)           AS lang_ok,
       CAST(n_tok >= {MIN_TOKENS} AND n_tok <= {MAX_TOKENS}
            AND top_tok <= CAST(ceil(n_tok * {MAX_REPEAT_RATIO}) AS BIGINT)
            AND lang IN ('en', 'de', 'fr', 'es', 'zh') AS BIGINT)       AS keep
FROM s
""".replace("{TOKEN_RE}", TOKEN_RE),
    tags=["llm", "text", "filter"],
)
def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style keep/drop decision with per-rule flags: length
    bounds, max-token-repetition (boilerplate/spam proxy), language
    allowlist. Emitting each rule's verdict separately — not just the
    final keep bit — is what makes a 100 TB filter debuggable: rule hit
    rates are one groupBy away. Single scan, all codegen expressions;
    the top-token count is an in-row aggregate over the token array
    (no explode, no shuffle). That in-row count is O(|distinct| x |tokens|)
    per document — right for web-page-sized docs; for book-length inputs
    flip to explode + (doc, token) count + max, which trades a shuffle for
    linear work."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize once per row (see text_stats) — CRITICAL here: the inline
    # form re-ran regexp_extract_all inside the nested filter() lambda,
    # i.e. once per DISTINCT TOKEN per row (r14 plan audit)
    tok = d.select(
        "doc_id",
        "lang",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    n_tok = F.size(toks).cast("long")
    # most frequent token's count, computed in-row (r14): sort the token
    # array and take the longest equal-run — O(n log n) per doc, replacing
    # the array_distinct x filter() count whose worst case is O(n·distinct)
    # (a long diverse doc paid ~n² comparisons). NULL init can never match
    # a real token, so the first element always opens a run of 1; empty
    # docs keep the old NULL top_tok (array_max over an empty transform),
    # preserving repeat_ok's NULL for them bit-for-bit.
    runmax = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("mx"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("mx"),
        ),
        lambda acc: acc["mx"],
    )
    top_tok = F.when(F.size(toks) > 0, runmax)
    len_ok = (n_tok >= MIN_TOKENS) & (n_tok <= MAX_TOKENS)
    repeat_ok = top_tok <= F.ceil(n_tok * MAX_REPEAT_RATIO).cast("long")
    lang_ok = F.col("lang").isin("en", "de", "fr", "es", "zh")
    return tok.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tok"),
        len_ok.cast("long").alias("len_ok"),
        repeat_ok.cast("long").alias("repeat_ok"),
        lang_ok.cast("long").alias("lang_ok"),
        (len_ok & repeat_ok & lang_ok).cast("long").alias("keep"),
    )


#: Shingle width for benchmark decontamination. Production pipelines use
#: 8-13-gram overlap; this synthetic corpus shuffles a small vocabulary, so
#: ordered 8-grams never collide — 3 keeps the operator's output non-trivial
#: while the plan is width-independent.
SHINGLE_N = 3
BENCH_MOD = 97  # doc_id % 97 == 0 simulates the held-out eval set


@register(
    "contamination_check",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{SHINGLE_N - 1}], ' ') AS s
  FROM (
    SELECT doc_id, t,
           unnest(range(1, greatest(len(t) - {SHINGLE_N - 1}, 0) + 1)) AS i
    FROM toks
  )
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
corpus AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM corpus GROUP BY doc_id),
hit AS (
  SELECT c.doc_id, COUNT(*) AS n_hit
  FROM corpus c JOIN bench b ON c.s = b.s
  GROUP BY c.doc_id
)
SELECT t.doc_id,
       CAST(t.n_sh AS BIGINT)  AS n_shingles,
       CAST(h.n_hit AS BIGINT) AS n_contaminated,
       CAST(h.n_hit AS DOUBLE) / t.n_sh AS contamination_rate
FROM tot t JOIN hit h ON t.doc_id = h.doc_id
""",
    tags=["llm", "text", "decontamination"],
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the LLM-pipeline op that strikes training
    documents overlapping the evaluation set: {SHINGLE_N}-token shingles of
    every corpus doc are joined against the distinct shingle set of the
    held-out benchmark docs (here the deterministic doc_id % {BENCH_MOD}
    subset); any overlap marks the doc with its contaminated-shingle count
    and rate. This is the n-gram-overlap decontamination used for
    GSM8K/MMLU-style eval hygiene.

    Plan/scale: shingling is one projection (sequence + transform + slice,
    zero shuffle); the overlap is an equi-join on the shingle — at 100 TB
    you join on xxhash64(shingle) instead of the string (same plan, 8-byte
    keys), and the benchmark side is small enough to broadcast, making the
    whole check a map-side semi-join over one corpus scan."""
    from callio_etl_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    # tokenize once per row on an alias level (r14): the inline form put
    # regexp_extract_all INSIDE the shingling lambda, re-tokenizing the
    # document once per shingle position — O(len^2) per doc
    tok = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    n_win = F.greatest(F.size(toks) - (SHINGLE_N - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_join(F.slice(toks, i, SHINGLE_N), " "),
    )
    # No materialization: shingling is a codegen projection, so recomputing
    # it per branch is cheaper than a global distinct + checkpoint of the
    # full (doc_id, shingle) table (which pins executor-memory blocks for
    # the materialized table's lifetime — measurably hostile when the
    # cluster is already memory-loaded, and pure overhead at 100 TB where
    # the right shape is streaming partial aggregation). Per-doc
    # distinctness moves into countDistinct (map-side partial distinct).
    sh = tok.select("doc_id", F.explode(shingles).alias("s"))
    bench = (
        sh.where(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()
    )
    corpus = sh.where(F.col("doc_id") % BENCH_MOD != 0)
    tot = corpus.groupBy("doc_id").agg(F.countDistinct("s").alias("n_sh"))
    hit = (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_hit"))
    )
    return tot.join(hit, "doc_id").select(
        "doc_id",
        F.col("n_sh").cast("long").alias("n_shingles"),
        F.col("n_hit").cast("long").alias("n_contaminated"),
        (F.col("n_hit").cast("double") / F.col("n_sh")).alias("contamination_rate"),
    )


@register(
    "repetition_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bi AS (
  SELECT t.doc_id,
         CAST(len(t.tokens) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(t.tokens)) AS DOUBLE)
           / CAST(len(t.tokens) AS DOUBLE) AS distinct_token_ratio,
         t.tokens[g] || ' ' || t.tokens[g + 1] AS bigram
  FROM toks t CROSS JOIN UNNEST(range(1, len(t.tokens))) AS u(g)
),
counted AS (
  SELECT doc_id, n_tokens, distinct_token_ratio, bigram,
         COUNT(*) AS cnt
  FROM bi
  GROUP BY doc_id, n_tokens, distinct_token_ratio, bigram
)
SELECT doc_id, n_tokens, distinct_token_ratio,
       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
         AS top_bigram_frac,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
         / CAST(SUM(cnt) AS DOUBLE) AS dup_bigram_frac
FROM counted
GROUP BY doc_id, n_tokens, distinct_token_ratio
""",
    tags=["llm", "text"],
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: per-document duplicate-bigram
    fraction, most-common-bigram fraction, and distinct-token ratio —
    the filters that catch boilerplate and degenerate repetition that
    plain length/stopword scoring (quality_score) misses.

    Shape (r14 reshape, guide §2.4 "remove shuffles outright"): every
    output is a PER-DOCUMENT statistic, so nothing needs to leave the
    row. Bigrams are built in-row (transform over an offset sequence —
    linear, codegen'd), then SORTED in-row and run-length-folded: equal
    bigrams are adjacent after array_sort, so one aggregate() pass
    yields the max run (= max per-bigram count) and the total length of
    runs > 1 (= duplicated-bigram mass). The previous shape exploded the
    bigrams and counted them with a two-level hash aggregate — one
    corpus-sized Exchange of (doc_id, bigram) rows plus a second tiny
    one; the plan is now a single projection over the scan, ZERO
    exchanges (2 Exchange -> 0, before/after plans in plans/r14/).
    O(n log n) array_sort per doc replaces the shuffle; nothing is
    quadratic in document length.

    Counts stay exact integers; each ratio divides two exact BIGINTs in
    one IEEE double op — engine-exact, bit-identical to the aggregate
    form.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split("text", " ").alias("tokens")
    ).where(F.size("tokens") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("tokens") - 1),
        lambda g: F.concat_ws(
            " ",
            F.element_at("tokens", g),
            F.element_at("tokens", g + F.lit(1)),
        ),
    )
    # run-length fold over the sorted bigram array: acc tracks the
    # previous value, current run length, max run, and duplicated mass
    # (a run contributes its full length once it reaches 2: +2 at the
    # second element, +1 per further element). A bigram always contains
    # the concat_ws separator, so the "" init can never match a value.
    runs = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("mx"),
            F.lit(0).cast("long").alias("dup"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["mx"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("mx"),
            (
                acc["dup"]
                + F.when(
                    (x == acc["prev"]) & (acc["run"] == 1), F.lit(2).cast("long")
                )
                .when(x == acc["prev"], F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
        ),
    )
    return toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct("tokens")).cast("double")
            / F.size("tokens").cast("double")
        ).alias("distinct_token_ratio"),
        F.size("tokens").cast("long").alias("__nb"),
        runs.alias("__r"),
    ).select(
        "doc_id",
        "n_tokens",
        "distinct_token_ratio",
        (F.col("__nb") - 1).alias("n_bigrams"),
        (
            F.col("__r.mx").cast("double") / (F.col("__nb") - 1).cast("double")
        ).alias("top_bigram_frac"),
        (
            F.col("__r.dup").cast("double") / (F.col("__nb") - 1).cast("double")
        ).alias("dup_bigram_frac"),
    )


# ------------------------------------------------------------- unigram rarity

@register(
    "unigram_rarity",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
  FROM documents
),
vocab AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT)        AS n_tokens,
       CAST(SUM(v.freq) AS BIGINT)     AS sum_freq,
       CAST(MIN(v.freq) AS BIGINT)     AS min_freq,
       CAST(SUM(v.freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                                       AS mean_token_freq
FROM toks t JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
""",
    tags=["llm", "text", "quality"],
)
def unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality score — the deterministic stand-in for the
    CCNet/KenLM perplexity filter: score each document by the corpus-wide
    frequency of its own tokens (a document of globally rare tokens is
    high-perplexity; machine-generated keyword spam scores anomalously
    common). Emits per-doc token count, summed and minimum corpus
    frequency, and the mean — thresholding on mean_token_freq is the
    perplexity-bucket split used for quality-tiered sampling.

    Plan/scale: one explode + two hash aggregates plus a join back from the
    Zipf-shaped vocabulary table. The vocab aggregate is map-side partial
    (combiner absorbs the head of the distribution); the join-back side is
    vocabulary-sized, orders of magnitude smaller than the corpus — at
    100 TB it stays a few hundred MB and broadcasts, making the whole score
    one scan + one explode-shuffle. All counts are exact integers; the only
    double op is one final division — bit-identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias("w"),
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("freq"))
    return (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
            F.min("freq").alias("min_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            "min_freq",
            (F.col("sum_freq").cast("double") / F.col("n_tokens").cast("double"))
            .alias("mean_token_freq"),
        )
    )


# ------------------------------------------------------- boilerplate n-grams

BOILER_N = 2  # n-gram width for cross-document boilerplate detection
BOILER_MIN_DOCS = 2  # an n-gram in >= this many docs of a source is boilerplate


@register(
    "boilerplate_ngrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(t[i:i+{BOILER_N - 1}], ' ') AS g
  FROM (
    SELECT doc_id, source, t,
           unnest(range(1, greatest(len(t) - {BOILER_N - 1}, 0) + 1)) AS i
    FROM toks
  )
),
df_per_source AS (
  SELECT source, g, COUNT(*) AS n_docs FROM sh GROUP BY source, g
)
SELECT s.doc_id,
       s.source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN d.n_docs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN d.n_docs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS boiler_frac
FROM sh s JOIN df_per_source d ON s.source = d.source AND s.g = d.g
GROUP BY s.doc_id, s.source
""",
    tags=["llm", "text", "quality"],
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: an n-gram that appears in
    multiple documents of the SAME source (site headers, license footers,
    nav text) is boilerplate; each document is scored by the fraction of
    its distinct n-grams that are source-boilerplate. This is the
    repeated-across-documents complement of repetition_stats'
    repeated-within-document signals, and the per-source grouping mirrors
    how CommonCrawl pipelines de-boilerplate per domain.

    Plan/scale (r14 reshape): per-doc-distinct n-grams are computed
    IN-ROW (array_distinct before the explode — same set as the old
    row-level distinct, since doc_id is the table key), so the explode
    feeds straight into ONE (source, gram) window that counts each
    gram's documents — no distinct shuffle, no self-join that evaluated
    the whole explode subtree twice (the r14 before-plan showed two
    full Scan+Generate branches), and the tokenizer runs once per row
    on its own alias level instead of once per gram position inside
    the slicing lambda. One scan, one Generate, two Exchanges total.
    Counts exact; one final division."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    n_win = F.greatest(F.size(toks) - (BOILER_N - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_join(F.slice(toks, i, BOILER_N), " "),
    )
    sh = tok.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("g")
    ).where(F.col("source").isNotNull())  # the old inner join's null gate
    n_docs = F.count("*").over(Window.partitionBy("source", "g"))
    return (
        sh.withColumn("n_docs", n_docs)
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("n_docs") >= BOILER_MIN_DOCS, 1).otherwise(0)
            ).cast("long").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_boiler",
            (F.col("n_boiler").cast("double") / F.col("n_grams").cast("double"))
            .alias("boiler_frac"),
        )
    )


# -------------------------------------------------- bloom-filter prefiltered
# decontamination

BLOOM_WORDS = 1024  # bitmap size: 1024 longs = 64 Kibit
BLOOM_K = 3  # hash functions per item


def _bloom_positions(col: Column) -> list[Column]:
    """BLOOM_K bit positions for a string: independent xxhash64 seeds, each
    reduced mod the bitmap width. Pure JVM expressions."""
    m = BLOOM_WORDS * 64
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(BLOOM_K)
    ]


@register(
    "bloom_decontaminate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{SHINGLE_N - 1}], ' ') AS s
  FROM (
    SELECT doc_id, t,
           unnest(range(1, greatest(len(t) - {SHINGLE_N - 1}, 0) + 1)) AS i
    FROM toks
  )
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
corpus AS (
  SELECT sh.doc_id, sh.s, d.source FROM sh
  JOIN documents d ON d.doc_id = sh.doc_id
  WHERE sh.doc_id % {BENCH_MOD} <> 0
),
hits AS (
  SELECT c.doc_id, c.source, COUNT(*) AS n_hit
  FROM corpus c JOIN bench b ON c.s = b.s
  GROUP BY c.doc_id, c.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)      AS n_docs_contaminated,
       CAST(SUM(n_hit) AS BIGINT)    AS n_hit_shingles
FROM hits
GROUP BY source
""",
    tags=["llm", "text", "decontamination"],
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a BLOOM-FILTER prefilter — the 100 TB shape of
    contamination_check: the benchmark shingle set is folded into a
    {BLOOM_WORDS}-word bitmap (bit positions from {BLOOM_K} seeded
    xxhash64s, OR-ed with one bit_or aggregate), the bitmap is embedded in
    the corpus scan as an array literal, and membership is a pure
    projection — corpus shingles that miss ANY of their {BLOOM_K} bits are
    dropped map-side before the exact verify join. False positives are
    removed by the verify join, so the result is EXACTLY the exact-join
    answer (bloom has no false negatives) and the oracle is plain SQL.

    Plan/scale: the bitmap is 8 KiB regardless of benchmark size (vs
    broadcasting the full shingle set in contamination_check) and the
    prefilter eliminates the shuffle for the overwhelmingly-clean corpus:
    only bloom-positive shingles reach the join. The bitmap collect is
    metadata-sized (1024 longs), same budget as a checkpoint stat read.
    Spark's own runtime InSubqueryExec bloom pruning does this implicitly
    for joins; here it is explicit so the filter survives into ANY
    downstream plan shape."""
    from callio_etl_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    # tokenize once per row on an alias level (see contamination_check —
    # the inline form re-ran the regexp per shingle position)
    tok = d.select(
        "doc_id",
        "source",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
            "__t"
        ),
    )
    toks = F.col("__t")
    n_win = F.greatest(F.size(toks) - (SHINGLE_N - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_join(F.slice(toks, i, SHINGLE_N), " "),
    )
    sh = tok.select(
        "doc_id", "source", F.explode_outer(shingles).alias("s")
    ).where(F.col("s").isNotNull()).dropDuplicates(["doc_id", "s"])
    bench = sh.where(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()

    # Build the bitmap: position -> (word, bit), bit_or per word, collect
    # the (word -> mask) pairs driver-side (8 KiB) into a dense literal.
    pos = bench.select(
        F.explode(F.array(*_bloom_positions(F.col("s")))).alias("p")
    )
    words = (
        # SQL expr: pyspark's shiftleft() wrapper only takes a literal
        # shift amount, the SQL function accepts a column
        pos.selectExpr(
            "CAST(p DIV 64 AS LONG) AS w",
            "shiftleft(1L, CAST(p % 64 AS INT)) AS m",
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    bitmap = [0] * BLOOM_WORDS
    for r in words:
        bitmap[int(r["w"])] = int(r["mask"])
    bloom_lit = F.array(*[F.lit(x).cast("long") for x in bitmap])

    corpus = sh.where(F.col("doc_id") % BENCH_MOD != 0)
    maybe = corpus.withColumn("__bloom", bloom_lit)
    for i, p in enumerate(_bloom_positions(F.col("s"))):
        maybe = maybe.withColumn(f"__p{i}", p).where(
            F.expr(
                f"(element_at(__bloom, CAST(__p{i} DIV 64 AS INT) + 1)"
                f" & shiftleft(1L, CAST(__p{i} % 64 AS INT))) != 0"
            )
        )
    maybe = maybe.drop("__bloom", *[f"__p{i}" for i in range(BLOOM_K)])
    hits = (
        maybe.join(F.broadcast(bench), "s")  # exact verify: kills the FPs
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_hit"))
    )
    return hits.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_contaminated"),
        F.sum("n_hit").alias("n_hit_shingles"),
    )


# ----------------------------------------------- tokenizer-training prep

BPE_TOP_PAIRS = 25  # merge candidates surfaced per run (one BPE iteration)


@register(
    "bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, UNNEST(string_split(text, ' ')) t(w)
  WHERE w <> ''
  GROUP BY w
),
pairs AS (
  SELECT word[i : i] AS left_sym, word[i + 1 : i + 1] AS right_sym,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM words CROSS JOIN UNNEST(range(1, len(word))) t(i)
  GROUP BY 1, 2
)
SELECT left_sym, right_sym, pair_count,
       CAST(ROW_NUMBER() OVER (
         ORDER BY pair_count DESC, left_sym ASC, right_sym ASC
       ) AS BIGINT) AS merge_rank
FROM pairs
QUALIFY ROW_NUMBER() OVER (
  ORDER BY pair_count DESC, left_sym ASC, right_sym ASC
) <= {BPE_TOP_PAIRS}
""",
    tags=["llm", "text", "tokenizer"],
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed inner loop of BPE tokenizer training (Sennrich et
    al.): corpus-weighted adjacent-symbol pair counts, ranked — the top
    pair IS the next merge rule. What makes BPE training a big-data
    problem is exactly this statistic: pair counts over the word-frequency
    table, re-run after every merge (the merge application itself touches
    only the tiny vocab table).

    Shape: the corpus collapses to the DISTINCT-word frequency table
    first (one hash aggregate with map-side combine — the classic
    word-count shuffle), then symbol pairs explode from the vocab rows
    only, weighted by frequency: pair extraction cost scales with |vocab|,
    not corpus tokens, which is why a 100 TB corpus trains a tokenizer at
    all. The final ranking is a single-partition window over pair rows
    bounded by |alphabet|^2 (~1.3k for [a-z0-9]) — scalar-sized by
    construction, never corpus-sized."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        _spread(d).select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    pairs = (
        words.where(F.length("word") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.col("word").substr(i, F.lit(1)).alias("left_sym"),
                        F.col("word").substr(i + 1, F.lit(1)).alias("right_sym"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )
    return ranked_topk(
        pairs,
        [F.col("pair_count").desc(), F.col("left_sym").asc(), F.col("right_sym").asc()],
        BPE_TOP_PAIRS,
        "merge_rank",
    )


PMI_WINDOW = 3    # co-occurrence window: tokens within +-3 positions
PMI_MIN_CO = 5    # drop pairs rarer than this before scoring
PMI_TOP = 50      # strongest associations surfaced


@register(
    "pmi_cooccurrence",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pr AS (
  SELECT least(t[i], t[i + o]) AS w1, greatest(t[i], t[i + o]) AS w2
  FROM toks
  CROSS JOIN UNNEST(range(1, len(t))) u(i)
  CROSS JOIN UNNEST(range(1, {PMI_WINDOW} + 1)) v(o)
  WHERE i + o <= len(t)
),
co AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS co FROM pr GROUP BY w1, w2
),
uni AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN UNNEST(t) s(w)
  GROUP BY w
),
p AS (SELECT CAST(SUM(co) AS BIGINT) AS total_pairs FROM co),
scored AS (
  SELECT c.w1, c.w2, c.co,
         (CAST(c.co AS DOUBLE) * CAST(p.total_pairs AS DOUBLE))
           / (CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)) AS pmi_lin
  FROM co c
  JOIN uni a ON a.word = c.w1
  JOIN uni b ON b.word = c.w2
  CROSS JOIN p
  WHERE c.co >= {PMI_MIN_CO}
)
SELECT w1, w2, co, pmi_lin,
       CAST(ROW_NUMBER() OVER (
         ORDER BY pmi_lin DESC, w1 ASC, w2 ASC
       ) AS BIGINT) AS assoc_rank
FROM scored
QUALIFY ROW_NUMBER() OVER (ORDER BY pmi_lin DESC, w1 ASC, w2 ASC) <= {PMI_TOP}
""",
    tags=["llm", "text"],
)
def pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence statistics with PMI association scoring —
    the corpus statistic under word2vec/GloVe-style embedding training
    and collocation mining: token pairs within +-{PMI_WINDOW} positions,
    counted symmetrically (pair normalized lexicographically), scored by
    pointwise mutual information in LINEAR form co * total / (cnt_a *
    cnt_b) — the same ranking as log-PMI (log is monotone) without the
    cross-engine last-ulp drift of libm; every score is one IEEE division
    of exact integer products.

    Shape: pairs are built IN-ROW (a bounded {PMI_WINDOW}-wide nested
    transform — linear in tokens, no self-join of the token stream, which
    is the naive formulation's quadratic trap); co-occurrence and unigram
    counts are map-combinable hash aggregates; the unigram join-back
    broadcasts (vocab is Zipf-small); the final ranking windows only
    pairs that survive the co >= {PMI_MIN_CO} support filter — vocab-
    bounded, not corpus-bounded. Production swaps the global rank for a
    per-word top-k (partitionBy w1) at billion-pair vocabularies."""
    d = load_table(spark, sf_dir, "documents")
    toks = _spread(d).select(F.split("text", " ").alias("t"))
    # size >= 2 guard: F.sequence(1, 0) yields the DESCENDING [1, 0] for a
    # single-token doc and element_at(t, 0) raises — unlike the oracle's
    # range(1, 1), which is simply empty.
    pairs = toks.where(F.size("t") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.filter(
                        F.transform(
                            F.sequence(F.lit(1), F.lit(PMI_WINDOW)),
                            lambda o: F.when(
                                i + o <= F.size("t"),
                                F.struct(
                                    F.least(
                                        F.element_at("t", i),
                                        F.element_at("t", i + o),
                                    ).alias("w1"),
                                    F.greatest(
                                        F.element_at("t", i),
                                        F.element_at("t", i + o),
                                    ).alias("w2"),
                                ),
                            ),
                        ),
                        lambda s: s.isNotNull(),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # r14: materialize BOTH count tables once (vocab-bounded — the
    # co-occurrence matrix and unigram table an embedding trainer
    # persists anyway). The r13 plan re-evaluated the corpus-wide pair
    # explode under both consumers of co (the totals aggregate and the
    # scoring filter) and the unigram explode under each of its two
    # broadcast builds — four corpus passes where two are the floor.
    from callio_etl_spark.llm_ops.matutil import materialize

    co = materialize(
        pairs.groupBy("w1", "w2").agg(
            F.count("*").cast("long").alias("co")
        ),
        "pmi_cooc",
    )
    uni = materialize(
        toks.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt")),
        "pmi_unigrams",
    )
    # total pairs from the vocab-bounded co table (sum BEFORE the support
    # filter == count of pair rows) — never a second corpus-wide explode
    p = co.agg(F.sum("co").cast("long").alias("total_pairs"))
    scored = (
        co.where(F.col("co") >= PMI_MIN_CO)
        .join(
            F.broadcast(uni.select(F.col("word").alias("w1"), F.col("cnt").alias("ca"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("word").alias("w2"), F.col("cnt").alias("cb"))),
            "w2",
        )
        .crossJoin(F.broadcast(p))
        .select(
            "w1",
            "w2",
            "co",
            (
                # cast BEFORE multiplying: a BIGINT co * total_pairs
                # overflows int64 at corpus scale (ANSI mode raises);
                # double products are exactly rounded identically on
                # both engines, so parity is unchanged
                (F.col("co").cast("double") * F.col("total_pairs").cast("double"))
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("pmi_lin"),
        )
    )
    return ranked_topk(
        scored,
        [F.col("pmi_lin").desc(), F.col("w1").asc(), F.col("w2").asc()],
        PMI_TOP,
        "assoc_rank",
    )


# ------------------------------------------------------------- retrieval

BM25_QUERY = ["hash", "join", "table", "scan"]  # the retrieval query terms
BM25_K1, BM25_B = 1.2, 0.75  # standard Okapi constants
BM25_TOP = 20
_BM25_Q = 1e10  # per-term score floor-quantum (exact DECIMAL summation)
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "bm25_topk",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         {", ".join(
             f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
             for i, t in enumerate(BM25_QUERY)
         )}
  FROM t
),
scored AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(FLOOR(
           CASE WHEN tf.cnt > 0 THEN
             (CAST(s.n + 1 AS DOUBLE) / CAST(tf.df + 1 AS DOUBLE))
             * (CAST(tf.cnt AS DOUBLE) * ({BM25_K1} + 1.0))
             / (CAST(tf.cnt AS DOUBLE)
                + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (CAST(t.dl AS DOUBLE) / s.avgdl)))
           ELSE 0.0 END * {_BM25_Q}) AS DECIMAL(38,0))) AS DOUBLE) / {_BM25_Q}
           AS bm25
  FROM t
  CROSS JOIN stats s
  CROSS JOIN LATERAL (
    {" UNION ALL ".join(
        f"SELECT CAST(len(list_filter(t.toks, w -> w = '{t}')) AS BIGINT) AS cnt, s.df_{i} AS df"
        for i, t in enumerate(BM25_QUERY)
    )}
  ) tf
  GROUP BY t.doc_id
)
SELECT doc_id, bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
         AS rank
FROM scored
QUALIFY ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) <= {BM25_TOP}
""",
    tags=["llm", "text", "retrieval"],
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval over the corpus for a fixed term query — the
    lexical scorer under RAG corpus search and hybrid (BM25 + dense)
    retrieval. Linear idf ((N+1)/(df+1), same monotone-rational choice as
    tfidf_top_terms — libm log drifts in the last ulp across engines);
    k1={BM25_K1}, b={BM25_B}.

    Shape: per-term tf is computed IN-ROW against the literal query terms
    (size(filter(...)) per term — no explode, no shuffle); the df/N/avgdl
    statistics are ONE map-combined aggregate emitting a single broadcast
    row; scoring is a pure projection over the corpus scan. Per-term
    scores are floor-quantized and summed as exact integer DECIMAL so the
    |query|-term sum is order-free. The final top-{BM25_TOP} is a global
    rank over scored docs — at retrieval scale, per-shard top-k +
    TakeOrdered merge (reservoir_sample's plan) replaces it."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("dl"),
    )
    stats = t.agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", term), 1).otherwise(0)
            ).cast("long").alias(f"df_{i}")
            for i, term in enumerate(BM25_QUERY)
        ],
    )
    scored = t.crossJoin(F.broadcast(stats))

    def _eq(term: str):
        # NOTE: a two-parameter lambda (w, _t=term) would flip F.filter
        # into its (element, index) form and bind _t to the INDEX column
        lit = F.lit(term)
        return lambda w: w == lit

    per_term = [
        (
            F.size(F.filter("toks", _eq(term))).cast("long"),
            F.col(f"df_{i}"),
        )
        for i, term in enumerate(BM25_QUERY)
    ]

    def term_score(cnt, df):
        idf = (F.col("n") + 1).cast("double") / (df + 1).cast("double")
        tfd = cnt.cast("double")
        denom = tfd + BM25_K1 * (
            1.0 - BM25_B + BM25_B * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        return F.when(cnt > 0, idf * (tfd * (BM25_K1 + 1.0)) / denom).otherwise(0.0)

    total = None
    for cnt, df in per_term:
        q = F.floor(term_score(cnt, df) * F.lit(_BM25_Q)).cast("decimal(38,0)")
        total = q if total is None else total + q
    scored = scored.select(
        "doc_id", (total.cast("double") / F.lit(_BM25_Q)).alias("bm25")
    )
    return ranked_topk(
        scored, [F.col("bm25").desc(), F.col("doc_id").asc()], BM25_TOP, "rank"
    )


RRF_K = 60  # standard reciprocal-rank-fusion damping constant
RRF_DENSE_QUERY = 0  # the embedding query whose dense ranking is fused


@register(
    "hybrid_rrf_fusion",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         {", ".join(
             f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
             for i, t in enumerate(BM25_QUERY)
         )}
  FROM t
),
scored AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(FLOOR(
           CASE WHEN tf.cnt > 0 THEN
             (CAST(s.n + 1 AS DOUBLE) / CAST(tf.df + 1 AS DOUBLE))
             * (CAST(tf.cnt AS DOUBLE) * ({BM25_K1} + 1.0))
             / (CAST(tf.cnt AS DOUBLE)
                + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (CAST(t.dl AS DOUBLE) / s.avgdl)))
           ELSE 0.0 END * {_BM25_Q}) AS DECIMAL(38,0))) AS DOUBLE) / {_BM25_Q}
           AS bm25
  FROM t
  CROSS JOIN stats s
  CROSS JOIN LATERAL (
    {" UNION ALL ".join(
        f"SELECT CAST(len(list_filter(t.toks, w -> w = '{t}')) AS BIGINT) AS cnt, s.df_{i} AS df"
        for i, t in enumerate(BM25_QUERY)
    )}
  ) tf
  GROUP BY t.doc_id
),
lex AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS lex_rank
  FROM scored
  QUALIFY ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) <= {BM25_TOP}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id = {RRF_DENSE_QUERY}),
dense AS (
  SELECT neighbor_id AS doc_id, CAST(rnk AS BIGINT) AS dense_rank FROM (
    SELECT c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC
           ) AS rnk
    FROM q JOIN e c ON c.vec_id <> q.vec_id
  ) WHERE rnk <= {_RRF_DENSE_K}
)
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
       l.lex_rank, d.dense_rank,
       COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
         + COALESCE(1.0 / ({RRF_K} + d.dense_rank), 0.0) AS rrf
FROM lex l FULL OUTER JOIN dense d ON d.doc_id = l.doc_id
""",
    tags=["llm", "text", "retrieval"],
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion (Cormack et al.):
    the BM25 lexical top-{BM25_TOP} and a dense cosine top-k (the
    embedding query's brute ranking — doc_id and vec_id share the id
    space in the fixtures, as a real corpus's chunk ids do) fused as
    rrf = sum over systems of 1/({RRF_K} + rank) — the standard way RAG
    stacks combine incomparable scores without calibration.

    Shape: both input rankings are the operators proven elsewhere; fusion
    is a FULL OUTER join of two tiny rank lists (k rows each — broadcast,
    corpus-size-free) and the RRF score is a fixed-order two-term
    expression (COALESCE + addition, not an aggregate), so it is exactly
    rounded identically on both engines with no quantization needed."""
    lex = bm25_topk(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    from callio_etl_spark.llm_ops.similarity import ann_topk_brute

    dense = (
        ann_topk_brute(spark, sf_dir)
        .where(F.col("query_id") == RRF_DENSE_QUERY)
        .select(
            F.col("neighbor_id").alias("d_doc_id"),
            F.col("rank").alias("dense_rank"),
        )
    )
    return (
        lex.join(dense, F.col("doc_id") == F.col("d_doc_id"), "full_outer")
        .select(
            F.coalesce("doc_id", "d_doc_id").alias("doc_id"),
            "lex_rank",
            "dense_rank",
            (
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0))
            ).alias("rrf"),
        )
    )


VOCAB_TOP_K = 20  # learned-vocab size for the coverage audit


@register(
    "vocab_coverage",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, w
  FROM documents CROSS JOIN UNNEST(string_split(text, ' ')) t(w)
  WHERE w <> ''
),
vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) AS rnk
    FROM tok GROUP BY w
  ) WHERE rnk <= {VOCAB_TOP_K}
),
per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in_vocab
  FROM tok t LEFT JOIN vocab v ON v.w = t.w
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_in_vocab,
       CAST(n_in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage,
       CAST(n_tokens - n_in_vocab AS BIGINT) AS n_oov
FROM per_doc
""",
    tags=["llm", "text", "tokenizer"],
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: learn a top-{VOCAB_TOP_K}
    frequency vocabulary from the corpus itself (the greedy unigram
    baseline every BPE/WordPiece vocab is measured against), then score
    every document's in-vocab token fraction and OOV count — the metric
    that decides whether a tokenizer needs retraining before a corpus is
    ingested, and the per-doc form that lets curation DROP
    pathologically-OOV documents (binary junk, wrong-script text).

    Shape: one word-count aggregate (map-combined) -> a vocab of
    {VOCAB_TOP_K} rows that BROADCASTS back onto the token stream (left
    join, map-side; missing = OOV) -> one doc_id aggregate. The global
    vocab ranking windows |vocab| rows, corpus-size-free. Coverage is one
    IEEE division of exact integers — engine-identical."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    # top-K vocab via TakeOrderedAndProject (per-partition heaps) — the rank
    # itself is not needed, so no window at all
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(VOCAB_TOP_K)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce("in_vocab", F.lit(0))).cast("long").alias("n_in_vocab"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_in_vocab",
            (
                F.col("n_in_vocab").cast("double") / F.col("n_tokens").cast("double")
            ).alias("coverage"),
            (F.col("n_tokens") - F.col("n_in_vocab")).cast("long").alias("n_oov"),
        )
    )
