"""Deduplication families for LLM training-data pipelines (SURVEY.md
section 7.4): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale design (100 TB):
- exact dedup  = hash-groupBy on a content fingerprint — one shuffle on an
  md5 key (uniform, no skew).
- MinHash+LSH  = per-doc signatures computed in a single projection (array
  higher-order functions, no explode for the signature), then band keys
  exploded and self-joined — the join key is (band, band_hash), so candidate
  generation is linear-ish, never all-pairs.
- SimHash      = 16-dim signature in one projection; near-dup = bucket join
  on the signature (or prefix) — shown here as signature computation.
- n-gram Jaccard = exact verification for LSH candidates; the word-level
  inverted-index join is the textbook approach; hot tokens are the skew risk,
  so production prunes stopwords/top-percentile tokens first (AQE skew-join
  handles the remainder).
- embedding-cosine = see similarity.py; near-dup is a threshold variant.

Hash parity note: Spark's hash() is Murmur3 and DuckDB's differs, so all
cross-engine hashes here are MD5 (identical everywhere). MD5-hex string MIN is
a valid uniform min-hash; at 100 TB you'd swap to xxhash64 Spark-side for
speed — the operator shape is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table, spread as _spread

TOKEN_RE = "[a-z0-9]+"
NUM_HASHES = 8
HASH_HEX_CHARS = 4  # disjoint 4-hex-char slices of one MD5 = 8 independent hashes
ROWS_PER_BAND = 2
N_BANDS = NUM_HASHES // ROWS_PER_BAND  # 4 bands of 2 — LSH for J~0.7+


def _words(col):
    return F.array_distinct(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0))


def _minhash_sig(words):
    """All NUM_HASHES min-hashes in ONE fold over ONE md5 per word.

    Hashing every word once and slicing disjoint 4-hex-char substrings of the
    digest gives 8 independent uniform hash functions at 1/8th the hash cost;
    the fold keeps an array<string> of running minima so tokenization + md5
    happen exactly once per row (an alias per hash would be re-inlined by
    CollapseProject and re-tokenize per hash)."""
    slices = lambda h: F.array(  # noqa: E731
        *[
            F.substring(h, i * HASH_HEX_CHARS + 1, HASH_HEX_CHARS)
            for i in range(NUM_HASHES)
        ]
    )
    return F.aggregate(
        F.transform(words, lambda w: F.md5(w)),
        F.array_repeat(F.lit("g"), NUM_HASHES),  # 'g' > any hex char
        lambda acc, h: F.zip_with(acc, slices(h), lambda a, s: F.least(a, s)),
    )


_WORDS_SQL = "list_distinct(regexp_extract_all(lower(d.text), '[a-z0-9]+'))"


def _minhash_sql(i: int) -> str:
    start = i * HASH_HEX_CHARS + 1
    return (
        f"list_aggregate(list_transform({_WORDS_SQL}, "
        f"w -> substr(md5(w), {start}, {HASH_HEX_CHARS})), 'min')"
    )


def content_fp() -> "F.Column":
    """The exact-dedup content identity: md5 over whitespace-normalized
    lowercased text. ONE definition — dedup_exact, the curate CLI
    pipeline, and any future consumer must agree on the normalization or
    their dedup contracts silently diverge."""
    return F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))


@register(
    "dedup_exact",
    oracle="""
WITH fp AS (
  SELECT d.doc_id,
         md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fp
  FROM documents d
)
SELECT fp, COUNT(*) AS n_dups, MIN(doc_id) AS canonical_doc_id
FROM fp
GROUP BY fp
HAVING COUNT(*) > 1
""",
    tags=["llm", "dedup"],
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the smallest doc_id as
    canonical, report duplicate clusters. One shuffle on the md5 key; at
    100 TB this is the cheapest and first dedup pass."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", content_fp().alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def _bands_union_sql(
    rows_per_band: int = ROWS_PER_BAND,
    n_bands: int = N_BANDS,
    table: str = "documents",
) -> str:
    """The (doc_id, band, band_key) table as SQL — shared by every oracle
    that consumes banded min-hash keys (composed, not string-parsed).
    Parameterized so the occupancy-grown banding oracles mirror the exact
    DataFrame-side band layout, and over any doc-shaped relation (the
    group-grain oracle bands a representatives CTE, not documents)."""
    band_selects = []
    for b in range(n_bands):
        parts = " || ".join(
            _minhash_sql(b * rows_per_band + r) for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT d.doc_id, {b} AS band, ({parts}) AS band_key FROM {table} d"
        )
    return "\nUNION ALL\n".join(band_selects)


def _minhash_bands_oracle() -> str:
    return f"""
WITH bands AS (
{_bands_union_sql()}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
"""


def _band_key(mins, b: int, rows_per_band: int = ROWS_PER_BAND):
    """THE per-band LSH key expression: concat of the band's
    ``rows_per_band`` signature slices. The band layout lives in exactly
    two places that must stay byte-identical — this expression (shared
    by band_projection and _minband_band_table) and its SQL twin inside
    ``_bands_union_sql`` (oracle text, mirrored textually). Change one,
    change both."""
    return F.concat(
        *[
            F.element_at(mins, b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
    )


def band_projection(
    d: DataFrame,
    rows_per_band: int = ROWS_PER_BAND,
    n_bands: int = N_BANDS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, band, band_key) rows as a PURE projection — signature fold
    + in-row band explode, no shuffle, no materialization. Works on batch
    AND streaming DataFrames (streaming.neardup_stream applies it per
    micro-batch; a localCheckpoint would be illegal there). ``carry``
    names extra per-doc columns to ride along unchanged (r14: the grouped
    pair queries carry the group multiplicity so the count join-back
    disappears — guide §2.3, shuffle metadata instead of re-joining)."""
    sig = d.select(
        "doc_id", *carry, _minhash_sig(_words(F.col("text"))).alias("mins")
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _band_key("mins", b, rows_per_band).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return sig.select(
        "doc_id", *carry, F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id",
        *carry,
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def _band_table(
    d: DataFrame, rows_per_band: int = ROWS_PER_BAND, n_bands: int = N_BANDS
) -> DataFrame:
    """Banded LSH key table, materialized once (localCheckpoint): a
    self-join evaluates its input subtree on BOTH sides, which would run
    the whole tokenize->minhash signature pass twice. At scale this is the
    signature table you'd persist anyway before pair generation."""
    from callio_etl_spark.llm_ops.matutil import materialize

    return materialize(
        band_projection(d, rows_per_band, n_bands), "band_table"
    )


def _band_pairs(bands: DataFrame) -> DataFrame:
    """Distinct candidate pairs from a band table via band-bucket self-join."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register("minhash_lsh_pairs", oracle=_minhash_bands_oracle(), tags=["llm", "dedup"])
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH candidate pairs: 8 min-hashes over the token set per doc
    (computed as array expressions in ONE projection — no explode), banded
    2-per-band into 4 LSH keys, band-bucket self-join emits candidate pairs.

    Scale: signature cost is O(tokens x hashes) map-side; the only shuffle is
    the band-key join whose buckets are the near-dup clusters themselves.
    This is the standard shingle->minhash->band->bucket-join pipeline
    (cf. MMDS ch.3); pyspark.ml's MinHashLSH gives the same via fit/transform,
    implemented here natively to keep the plan transparent and oracle-checkable.
    """
    d = _spread(load_table(spark, sf_dir, "documents"))
    return _band_pairs(_band_table(d))


def _minband_band_table(d: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Band table with each doc's FULL key set as scalar columns
    (k0..k{N_BANDS-1}) alongside the exploded (band, band_key),
    materialized once (localCheckpoint — the _band_table argument: a
    self-join evaluates its input subtree on both sides). Feeds
    _minband_pairs, whose emission rule needs every band's key on both
    sides of the bucket join. ``carry`` rides extra per-doc columns
    along unchanged (r14: group multiplicity)."""
    sig = d.select(
        "doc_id", *carry, _minhash_sig(_words(F.col("text"))).alias("mins")
    )
    sig = sig.select(
        "doc_id",
        *carry,
        *[_band_key("mins", b).alias(f"k{b}") for b in range(N_BANDS)],
    )
    from callio_etl_spark.llm_ops.matutil import materialize

    return materialize(
        sig.select(
            "doc_id",
            *carry,
            *[f"k{b}" for b in range(N_BANDS)],
            F.posexplode(F.array(*[f"k{b}" for b in range(N_BANDS)])).alias(
                "band", "band_key"
            ),
        ),
        "minband_table",
    )


def _minband_pairs(bands: DataFrame) -> DataFrame:
    """Candidate pairs from a _minband_band_table, DISTINCT BY
    CONSTRUCTION (r14, guide §2.4): a pair colliding in k bands was
    previously emitted k times and collapsed by a post-join DISTINCT —
    the largest exchange in every pair query (~2x the output in
    generated rows). Instead, each side carries all of its band keys as
    scalar columns, and the join emits a pair only from the FIRST band
    whose keys match (band 0, or every earlier band's keys differ) —
    exactly one band produces each candidate pair, so no dedup pass
    exists. Cost: <= N_BANDS-1 extra 8-char string compares per
    EVALUATED candidate (scalar != chain, no per-pair allocation),
    against a removed corpus-pair-sized Exchange + two HashAggregates.
    Returns the aliased join (sides ``a`` = smaller doc_id, ``b`` =
    larger) for callers to project."""
    a, b = bands.alias("a"), bands.alias("b")
    neq = lambda i: F.col(f"a.k{i}") != F.col(f"b.k{i}")  # noqa: E731

    def _earlier_bands_differ(bnum: int):
        acc = neq(0)
        for i in range(1, bnum):
            acc = acc & neq(i)
        return acc

    first_matching_band = F.when(F.col("a.band") == 0, F.lit(True))
    for _b in range(1, N_BANDS):
        first_matching_band = first_matching_band.when(
            F.col("a.band") == _b, _earlier_bands_differ(_b)
        )
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & first_matching_band,
    )


def _content_groups(d: DataFrame) -> DataFrame:
    """Exact-content collapse as ONE corpus pass: (rep, n, text) per
    distinct text, with the representative's text carried THROUGH the
    aggregate (min_by(text, doc_id) — every row in a group holds the
    identical text, and min_by pins the rep's copy exactly as the
    oracle's ``k.doc_id = g.rep`` join does). r14: the previous shape
    scanned the corpus twice (groupBy for groups, then a join back on
    rep to fetch the text) — carrying the text in the aggregate removes
    the join, the second scan, and the groups localCheckpoint; text
    bytes cross the exchange once either way (map-side partial min_by
    ships one copy per distinct content per partition)."""
    return (
        d.select("doc_id", "text", F.md5("text").alias("tkey"))
        .groupBy("tkey")
        .agg(
            F.min("doc_id").alias("rep"),
            F.count("*").alias("n"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .select("rep", "n", "text")
    )


def _grouped_pairs_oracle() -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, text, md5(text) AS tkey FROM documents
),
groups AS (
  SELECT tkey, MIN(doc_id) AS rep, COUNT(*) AS n FROM keyed GROUP BY tkey
),
rep_docs AS (
  SELECT k.doc_id, k.text FROM keyed k JOIN groups g ON k.doc_id = g.rep
),
bands AS (
{_bands_union_sql(table="rep_docs")}
),
cand AS (
  SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT c.rep_a, c.rep_b, CAST(ga.n * gb.n AS BIGINT) AS n_pairs
FROM cand c
JOIN groups ga ON ga.rep = c.rep_a
JOIN groups gb ON gb.rep = c.rep_b
UNION ALL
SELECT rep AS rep_a, rep AS rep_b, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
FROM groups WHERE n > 1
"""


@register(
    "minhash_lsh_pairs_grouped",
    oracle=_grouped_pairs_oracle(),
    tags=["llm", "dedup", "scale-path"],
)
def minhash_lsh_pairs_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs at the CONTENT-GROUP grain — the scale path for the
    row-grain pair list's one irreducible cost: its OUTPUT.

    Row-grain candidate pairs are inherently quadratic in verbatim
    duplication (d copies of one document emit d·(d-1)/2 pairs — measured
    exp 1.99 on the 10x-replicated sf1, where TRUE pairs grow ~44x; no plan
    emits quadratically more rows in linear time). But the pair-join WORK is
    not: verbatim copies share every band key, so the candidate graph is
    exactly the quotient graph over exact-text groups. This form collapses
    to (md5(text) -> min-doc_id rep, multiplicity n) first, band-joins the
    representatives only, and reports each group-pair ONCE with its exact
    row-grain pair count:

      rep_a <  rep_b : n_a · n_b cross-group candidate pairs
      rep_a == rep_b : n · (n-1)/2 within-group (verbatim) pairs

    Sum(n_pairs) equals COUNT(minhash_lsh_pairs) exactly (pytest-asserted on
    a duplication-heavy corpus), and expanding group members recovers the
    row-grain pair set verbatim — so a dedup consumer loses nothing while
    the join, shuffle, and output are all bounded by DISTINCT contents, not
    rows. Under 10x verbatim replication the rep set does not grow at all;
    this is the same exact-collapse family as dedup_pipeline's prefix
    (exp 1.49 -> ~0) applied to the pair list itself.

    r14 plan reshape (guide §2.3/§2.4), r13 before-plan -> after-plan:
    - ONE corpus pass: groups carry the rep's text via min_by (see
      _content_groups) — the keyed->groups->join-back-on-rep double scan
      and the groups localCheckpoint are gone.
    - n rides the band table, so the two post-pair broadcast count joins
      over ~10M pair rows are gone (shuffle metadata, not re-join).
    - the post-join DISTINCT — the query's largest exchange, ~2x the
      output in generated rows — is gone: each band row carries ALL its
      rep's band keys as scalar columns (k0..k3), and a pair is emitted
      only from the FIRST band whose keys match (a.band == 0, or every
      earlier band's keys differ). Every candidate pair is produced by
      exactly one band, so generated pairs are distinct by construction.
      Scalar != chains, no per-pair array allocation.
    - `within` reads the band-0 rows of the checkpointed band table
      (exactly one per group) instead of re-deriving groups.
    Net: 20.4M-row Exchange + 2 HashAggregates + 2 BroadcastHashJoins
    removed for ~3 cheap string compares per evaluated candidate."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    groups = _content_groups(d)
    bands = _minband_band_table(
        groups.select(F.col("rep").alias("doc_id"), "n", "text"),
        carry=("n",),
    )
    cross = _minband_pairs(bands).select(
        F.col("a.doc_id").alias("rep_a"),
        F.col("b.doc_id").alias("rep_b"),
        (F.col("a.n") * F.col("b.n")).cast("long").alias("n_pairs"),
    )
    within = bands.where((F.col("band") == 0) & (F.col("n") > 1)).select(
        F.col("doc_id").alias("rep_a"),
        F.col("doc_id").alias("rep_b"),
        F.expr("n * (n - 1) DIV 2").alias("n_pairs"),
    )
    return cross.unionByName(within)


#: Band buckets holding more than this many REPRESENTATIVES are template
#: clusters (shared boilerplate), not near-dup candidates: a bucket of b
#: reps feeds b^2/2 pairs into the verify join, so one boilerplate family
#: of 100k docs would emit 5e9 candidates — the band join's adversarial
#: input, which no salting fixes because the OUTPUT itself is quadratic.
#: Production MinHash pipelines cap the bucket (RefinedWeb/Dolma-style)
#: and route oversized buckets to the template detector
#: (boilerplate_ngrams) instead. 32 keeps every genuine near-dup bucket
#: on the fixtures while dropping the vocabulary-degenerate mega-buckets.
BUCKET_CAP = 32


def _capped_pairs_oracle() -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, text, md5(text) AS tkey FROM documents
),
groups AS (
  SELECT tkey, MIN(doc_id) AS rep, COUNT(*) AS n FROM keyed GROUP BY tkey
),
rep_docs AS (
  SELECT k.doc_id, k.text FROM keyed k JOIN groups g ON k.doc_id = g.rep
),
bands AS (
{_bands_union_sql(table="rep_docs")}
),
kept AS (
  SELECT band, band_key FROM bands
  GROUP BY band, band_key HAVING COUNT(*) <= {BUCKET_CAP}
),
small AS (
  SELECT b.doc_id, b.band, b.band_key
  FROM bands b JOIN kept USING (band, band_key)
),
cand AS (
  SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
  FROM small a
  JOIN small b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT c.rep_a, c.rep_b, CAST(ga.n * gb.n AS BIGINT) AS n_pairs
FROM cand c
JOIN groups ga ON ga.rep = c.rep_a
JOIN groups gb ON gb.rep = c.rep_b
UNION ALL
SELECT rep AS rep_a, rep AS rep_b, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
FROM groups WHERE n > 1
"""


@register(
    "minhash_lsh_pairs_capped",
    oracle=_capped_pairs_oracle(),
    tags=["llm", "dedup", "scale-path"],
)
def minhash_lsh_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs_grouped with the BUCKET_CAP production guard —
    the answer to the band join's adversarial input (one hot band_key
    from shared boilerplate): band buckets holding more than BUCKET_CAP
    representatives are dropped before pair generation, because their
    pair volume is quadratic in the bucket and their contents are a
    template family, not near-duplicates (route them to
    boilerplate_ngrams). Within-group verbatim pairs are kept regardless
    — exact duplicates are certain, not LSH candidates.

    Scale: the bucket-size aggregate is one map-combined pass over the
    band table; the cap bounds every bucket's contribution at CAP^2/2, so
    candidate volume is <= n_buckets * CAP^2/2 — linear in distinct
    contents with a constant factor, whatever the duplication or
    boilerplate structure. SKEW_BENCH.json's band_join section measures
    the grouped form collapsing a 95%-verbatim-hot corpus flat and this
    cap restoring a flat task profile on a 95%-boilerplate corpus.

    r14 (guide §2.3/§2.4, same reshape as minhash_lsh_pairs_grouped):
    one corpus pass via _content_groups (min_by text in the aggregate,
    no join-back, no groups checkpoint), multiplicity n carried through
    band_projection so both post-pair count joins disappear, `within`
    read off the checkpointed band table's band-0 rows. The post-cap
    DISTINCT stays: a pair may match in a dropped bucket in one band and
    a kept bucket in another, so first-matching-band emission would need
    per-band keptness — and post-cap volume is <= n_buckets*CAP^2/2,
    tiny, so the distinct costs nothing here."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    groups = _content_groups(d)
    bands = band_projection(
        groups.select(F.col("rep").alias("doc_id"), "n", "text"),
        carry=("n",),
    ).localCheckpoint(eager=True)
    kept = (
        bands.groupBy("band", "band_key")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") <= BUCKET_CAP)
        .select("band", "band_key")
    )
    small = bands.join(kept, ["band", "band_key"])
    a, b = small.alias("a"), small.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("rep_a"),
            F.col("b.doc_id").alias("rep_b"),
            (F.col("a.n") * F.col("b.n")).cast("long").alias("n_pairs"),
        )
        .distinct()
    )
    within = bands.where((F.col("band") == 0) & (F.col("n") > 1)).select(
        F.col("doc_id").alias("rep_a"),
        F.col("doc_id").alias("rep_b"),
        F.expr("n * (n - 1) DIV 2").alias("n_pairs"),
    )
    return cross.unionByName(within)


def _simhash_sig_sql() -> str:
    hexval = "CAST(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1 AS BIGINT)"
    bits = []
    for p in range(1, 17):
        term = hexval.format(p=p)
        bits.append(
            "CASE WHEN list_aggregate(list_transform(hs, h -> 2 * "
            + term
            + " - 15), 'sum') > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


@register(
    "simhash",
    oracle=f"""
WITH t AS (
  SELECT d.doc_id,
         list_transform({_WORDS_SQL}, w -> md5(w)) AS hs
  FROM documents d
)
SELECT doc_id, ({_simhash_sig_sql()}) AS simhash16
FROM t
""",
    tags=["llm", "dedup"],
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature (16-bit here; 64 in production): each bit is the sign
    of the sum over token hashes of (2*nibble - 15) at that hex position —
    i.e. majority vote per bit dimension. Near-dups share most bits, so
    bucketing on the signature (or bit-prefix groups) finds them without
    all-pairs. Pure array expressions, single projection; the only shuffle is
    the parallelism-restoring round-robin (see _spread).

    All 16 bit-counters accumulate in ONE fold with an array<long> accumulator
    so tokenization and the per-word md5 run once per row, not once per bit;
    integer sums are order-exact, so the per-bit DuckDB oracle stays
    value-identical."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    hexmap = "0123456789abcdef"
    contribs = lambda h: F.array(  # noqa: E731
        *[
            2 * (F.instr(F.lit(hexmap), F.substring(h, p, 1)) - 1).cast("long") - 15
            for p in range(1, 17)
        ]
    )
    counts = F.aggregate(
        F.transform(_words(F.col("text")), lambda w: F.md5(w)),
        F.array_repeat(F.lit(0).cast("long"), 16),
        lambda acc, h: F.zip_with(acc, contribs(h), lambda a, c: a + c),
    )
    sig = F.array_join(
        F.transform(counts, lambda c: F.when(c > 0, "1").otherwise("0")), ""
    )
    return d.select("doc_id", sig.alias("simhash16"))


@register(
    "ngram_jaccard_pairs",
    oracle="""
WITH ws AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS w
  FROM documents
  WHERE doc_id % 5 = 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ws GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ws a JOIN ws b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE)
         / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.8
""",
    tags=["llm", "dedup"],
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (token-set) Jaccard over candidate pairs via an inverted
    index: explode distinct tokens, self-join on token, count intersections,
    J = |A∩B| / (|A|+|B|-|A∩B|), threshold 0.8.

    Scale: this is the LSH *verification* stage — production runs it only on
    minhash_lsh_pairs candidates. Run standalone here to oracle-check the
    exact math; hot-token skew is the risk at 100 TB (prune stopwords /
    top-frequency tokens, then AQE skew-join). NOT a silent cap: the synthetic
    corpus draws from a ~40-word vocabulary, so all-pairs-via-tokens is
    quadratic — this query runs on the deterministic doc_id%5 sample (same
    filter in the oracle); production feeds LSH candidates, not a sample."""
    d = _spread(load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0))
    ws = d.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("w")
        # materialize the inverted index once: it feeds both sides of the
        # token self-join AND both size lookups — four evaluations of the
        # regexp tokenization without this (at scale: the posting list you'd
        # persist anyway)
    ).localCheckpoint(eager=True)
    sizes = ws.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = ws.alias("a"), ws.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= 0.8)


@register(
    "embedding_neardup",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_cosine_similarity(a.v, b.v) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
""",
    tags=["llm", "dedup", "similarity"],
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: brute-force pairwise cosine with a
    0.4 threshold (the synthetic embeddings carry no planted near-dups; 0.4 keeps the output non-trivial). Double accumulation is sequential in both engines, so the
    comparison is exact (verified bit-identical). Scale path: pre-bucket by
    IVF/LSH (see similarity.py) so the pair join is within-bucket only.

    Plan note: each vector's norm is computed ONCE before the self-join (same
    expression the oracle evaluates per pair — identical bits, 3x less work;
    the O(n²) side evaluates only the dot product). The broadcast-nested-loop
    pair join streams the left side, so that side is _spread to the session's
    parallelism — a single-file scan would otherwise run the whole O(n²)
    scoring in one task."""
    from callio_etl_spark.llm_ops.similarity import dot

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    )
    a, b = _spread(emb).alias("a"), F.broadcast(emb).alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= 0.4)
    )


@register(
    "embedding_neardup_bucketed",
    oracle="""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS bucket,
       list_cosine_similarity(a.v, b.v) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
""",
    tags=["llm", "dedup", "similarity"],
)
def embedding_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucketed — the production operator.
    The pair join is an EQUI-join on the coarse IVF partition label (here the
    precomputed ``label``; production: nearest-KMeans-centroid id, probing >1
    bucket for recall), so the plan is a hash/sort-merge equi-join that
    co-partitions both sides by bucket and scores |bucket|² pairs per bucket,
    never N² — this is the plan shape that survives 100x, unlike
    ``embedding_neardup``'s BroadcastNestedLoopJoin all-pairs baseline (kept
    as the exact-recall verification reference; tests assert this variant's
    output equals the baseline restricted to same-bucket pairs).

    Norms are computed once per vector before the join (3x less work than
    per-pair); the join key is uniform by construction (coarse quantizer
    balances buckets), so no salting is needed — skewed real-world buckets
    would go through AQE skew-join or the salting tool in io.py."""
    from callio_etl_spark.llm_ops.similarity import dot

    emb = (
        _spread(load_table(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
        # spread THEN checkpoint: a single-file scan would materialize (and
        # later stream) the whole table through one task, serializing the
        # per-bucket pair scoring
        .localCheckpoint(eager=True)  # signature table: one scan, both sides
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("bucket"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "bucket", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.4)
    )


# ------------------------------------------- corpus-proportional cells

#: Extra sign-hyperplane bits refining the label cells in the registered
#: variant (cells = |labels| * 2^bits). The production policy grows this
#: with the corpus to hold per-cell occupancy constant — measured as
#: ``embedding_neardup_held`` in SCALE_CURVE.json (0 extra bits at sf0.1,
#: 3 at sf1 ~ 10x the cells for 10x the rows).
NEARDUP_EXTRA_BITS = 1
_NEARDUP_TAU = 0.4


def _hyperplane_signs(j: int, dim: int) -> list[float]:
    """Deterministic +-1 hyperplane for sign-LSH cell refinement: each
    component's sign comes from md5 of (plane, dim) — reproducible across
    engines, runs, and languages (the same construction as the sign-LSH
    planes in similarity.py, kept integer-free here because only the sign
    of the projection is consumed)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"hp:{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def neardup_cells_pairs(
    spark: SparkSession, sf_dir: str, extra_bits: int
) -> DataFrame:
    """embedding_neardup_bucketed with the cell count as an explicit knob:
    each coarse label cell is refined by ``extra_bits`` deterministic
    sign-hyperplane bits, multiplying the cell count by 2^bits — the
    corpus-proportional-cells policy that keeps the pair join's
    sum(|cell|^2) term linear as the corpus grows (bucketed IVF grows its
    cell count the same way; the recall trade is recovered by multi-probe,
    ann_topk_ivf_probe's shape). Pure equi-join on the composite cell id;
    norms computed once pre-join."""
    from callio_etl_spark.llm_ops.similarity import EMB_DIM, dot

    emb = (
        _spread(load_table(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    )
    cell = F.col("label").cast("long") * (2**extra_bits)
    for j in range(extra_bits):
        sgn = F.array(*[F.lit(s) for s in _hyperplane_signs(j, EMB_DIM)])
        cell = cell + (dot(F.col("v"), sgn) > 0).cast("long") * (2**j)
    emb = emb.withColumn("cell", cell).localCheckpoint(eager=True)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("cell").alias("cell"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("cell").alias("cell_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "cell", cos.alias("cosine"))
        .where(F.col("cosine") >= _NEARDUP_TAU)
    )


def _cells_oracle(extra_bits: int) -> str:
    from callio_etl_spark.llm_ops.similarity import EMB_DIM

    cell = f"CAST(label AS BIGINT) * {2 ** extra_bits}"
    for j in range(extra_bits):
        lits = ", ".join(str(s) for s in _hyperplane_signs(j, EMB_DIM))
        cell += (
            f" + CASE WHEN list_inner_product(v, [{lits}]) > 0"
            f" THEN {2 ** j} ELSE 0 END"
        )
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v, {cell} AS cell FROM e)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
       list_cosine_similarity(a.v, b.v) AS cosine
FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {_NEARDUP_TAU}
"""


@register(
    "embedding_neardup_cells",
    oracle=_cells_oracle(NEARDUP_EXTRA_BITS),
    tags=["llm", "dedup", "similarity", "scale-path"],
)
def embedding_neardup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding_neardup_bucketed's corpus-proportional-cells form,
    registered at {NEARDUP_EXTRA_BITS} extra bit(s) (= 2x the label cell
    count) so the occupancy-holding policy is an oracle-proven operator:
    the candidate join cost is sum(|cell|^2), and holding |cell| constant
    as the corpus grows requires the cell COUNT to grow with it — this
    operator is that growth, parameterized (neardup_cells_pairs); the sf1
    decade with bits scaled 0 -> 3 is measured as
    ``embedding_neardup_held`` in SCALE_CURVE.json. Recall loss from the
    finer cells is the standard IVF trade, recovered with multi-probe."""
    return neardup_cells_pairs(spark, sf_dir, NEARDUP_EXTRA_BITS)


JACCARD_THRESHOLD = 0.8

_JACCARD_PAIRS_SQL = """
ws AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS w
  FROM documents
  WHERE doc_id % 5 = 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ws GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ws a JOIN ws b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(i.n_common AS DOUBLE)
        / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.8
)"""


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components by iterative min-label propagation with pointer
    jumping: every node starts as its own component; each round adopts the
    smallest label among itself and its neighbors, then compresses one level
    of indirection (my new label := my label's label). The compression step
    is the Hirschberg/pointer-jumping trick — labels chase chains
    exponentially, so convergence is O(log diameter) rounds instead of
    O(diameter); on near-dup graphs (dense clusters plus occasional chains)
    that means 2-3 rounds in practice.

    Scale notes: each round is one shuffle join on the edge list + one
    aggregate + one tiny label self-join — all set-based, nothing on the
    driver except the convergence flag. Lineage is truncated per round
    (localCheckpoint) so plans don't grow with iterations. Production graphs
    upgrade to large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce"), same operator contract (nodes, edges) -> (node,
    component).

    Correctness of the compression step: any label is always the id of a
    node in the same component (labels start as self and only ever move to
    a neighbor-reachable value), so label-of-label stays in-component and
    monotonically decreasing; the fixpoint test runs AFTER compression, so
    the loop only stops at a plain-propagation fixpoint.

    ``nodes``: one column ``node``; ``edges``: columns ``src``, ``dst``
    (undirected). Returns (node, component=min reachable node id).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        # materialize once: the edge list is re-joined every round, and
        # without this its full upstream lineage (e.g. the Jaccard
        # verification join) would re-execute per iteration
        .localCheckpoint(eager=True)
    )
    # Only nodes with degree >= 1 can ever change label; near-dup graphs are
    # sparse (dup pairs << corpus), so iterating over just the touched nodes
    # shrinks every per-round join/checkpoint from |corpus| to |dup nodes|.
    # Isolated nodes are singleton components (comp = node) by definition.
    touched = sym.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    singletons = nodes.join(touched, "node", "left_anti").select(
        "node", F.col("node").alias("comp")
    )
    labels = touched.select("node", F.col("node").alias("comp"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, labels["node"] == nbr_min["a"], "left").select(
            "node",
            F.col("comp").alias("old_comp"),
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                "mid_comp"
            ),
        )
        # pointer jumping: follow one level of label indirection
        lut = stepped.select(
            F.col("node").alias("c"), F.col("mid_comp").alias("c_comp")
        )
        new_labels = (
            stepped.join(lut, stepped["mid_comp"] == lut["c"], "left")
            .select(
                "node",
                F.least(
                    F.col("mid_comp"), F.coalesce(F.col("c_comp"), F.col("mid_comp"))
                ).alias("comp"),
                # changed flag rides along so convergence needs no extra join
                (
                    F.least(
                        F.col("mid_comp"),
                        F.coalesce(F.col("c_comp"), F.col("mid_comp")),
                    )
                    != F.col("old_comp")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where("changed").limit(1).count()
        labels = new_labels.select("node", "comp")
        if changed == 0:
            break
    return labels.unionByName(singletons)


def _star_rounds(edges: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Alternate large-star/small-star until the edge set is a fixpoint.

    Returns (star edge set in (src, dst) form with dst = component min for
    every src, rounds executed). Each round is two grouped-min aggregates and
    two equi-joins — no collect_list neighbor lists, so hub nodes never
    materialize their neighborhood in one task."""

    def _fingerprint(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # (ANSI mode raises); decimal(38,0) holds any realistic count
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    cur = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    fp = _fingerprint(cur)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: for each node u, m = min over N(u) ∪ {u}; connect every
        # LARGER neighbor v > u directly to m.
        sym = cur.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
            cur.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("minv"))
            .select("u", F.least("minv", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        # small-star: key each edge by its LARGER endpoint hi with smaller
        # neighbors N⁻(hi); m = min(N⁻); connect hi and every other small
        # neighbor to m.
        canon = large.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        ).where(F.col("hi") != F.col("lo"))
        smins = canon.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            canon.join(smins, "hi")
            .select(F.col("lo").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .unionByName(
                smins.select(F.col("hi").alias("src"), F.col("m").alias("dst"))
            )
            .distinct()
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        new_fp = _fingerprint(small)
        cur = small
        if new_fp == fp:
            break
        fp = new_fp
    return cur, rounds


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components by alternating large-star/small-star (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SOCC'14) — the
    production-scale upgrade over min-label propagation that
    ``connected_components``'s docstring points to.

    Per round: large-star connects every node's larger neighbors to its
    local minimum (halving long chains), small-star re-keys each edge to its
    larger endpoint and stars the smaller neighbors onto the group minimum.
    Both are one grouped-min + one equi-join — never a per-node neighbor
    list, so degree skew (hub nodes) stays a groupBy key, not a task-local
    array. Converges in O(log diameter) rounds with edge count monotonically
    non-increasing after round 1 (the paper's invariant); on an adversarial
    length-n chain this needs ~log2(n) rounds where plain propagation needs
    n (tests/test_llm_ops.py asserts the round count).

    Fixpoint detection is a (count, xxhash64-sum) fingerprint of the edge
    set — one 1-row aggregate per round on the driver, no exceptAll.

    Same contract as ``connected_components``: ``nodes`` one column
    ``node``; ``edges`` columns ``src``/``dst`` undirected; returns
    (node, comp = min reachable node id).
    """
    # Touched nodes come from the CLEANED edge set (self-loops dropped, like
    # _star_rounds does): a node whose only edges are self-loops is a
    # singleton — deriving touched from raw edges would exclude it from the
    # singleton arm while the star rounds never label it.
    clean = edges.where(F.col("src") != F.col("dst"))
    sym_nodes = (
        clean.select(F.col("src").alias("node"))
        .unionByName(clean.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    singletons = nodes.join(sym_nodes, "node", "left_anti").select(
        "node", F.col("node").alias("comp")
    )
    star, _ = _star_rounds(edges, max_iter)
    # At fixpoint every edge is (member, component-min); roots appear only on
    # the dst side and label themselves.
    member_labels = star.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("comp")
    )
    roots = (
        star.select(F.col("dst").alias("node"))
        .distinct()
        .join(member_labels, "node", "left_anti")
        .select("node", F.col("node").alias("comp"))
    )
    return member_labels.unionByName(roots).unionByName(singletons)


@register(
    "dedup_cluster_assign",
    oracle=f"""
WITH RECURSIVE
{_JACCARD_PAIRS_SQL},
docs AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b, doc_a FROM edges
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a
)
SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
""",
    tags=["llm", "dedup", "iterative"],
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment — the stage after pair generation that an
    actual dedup pipeline keys its keep/drop decision on: verified Jaccard
    pairs (>= {JACCARD_THRESHOLD}) become an undirected graph; connected
    components (large-star/small-star) give each doc a cluster id = min
    doc_id reachable (the canonical survivor). Oracle: DuckDB recursive-CTE
    transitive closure — exact same fixpoint, closed-form.

    Uses the same deterministic doc_id%5 sample as ngram_jaccard_pairs
    (the all-pairs verification is quadratic on this vocabulary-degenerate
    corpus); ``dedup_pipeline`` is the full-corpus variant whose
    verification join is bounded by LSH candidates."""
    return _sample_clusters(spark, sf_dir)


def _memo_df(spark: SparkSession, key: str, build) -> DataFrame:
    """Session-scoped memo of a localCheckpointed DataFrame: the cluster
    table is the natural persist point of the dedup pipeline (assignment,
    survivor rollup, and pipeline summary all read it), so computing it once
    per (session, sf_dir) mirrors a real pipeline persisting the stage
    instead of re-deriving the CC fixpoint per downstream query."""
    cache = spark.sparkContext.__dict__.setdefault("_callio_memo", {})
    if key not in cache:
        cache[key] = build().localCheckpoint(eager=True)
    return cache[key]


def _sample_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        d = _spread(
            load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
        )
        nodes = d.select(F.col("doc_id").alias("node"))
        edges = ngram_jaccard_pairs(spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        return connected_components_star(nodes, edges).select(
            F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
        )

    return _memo_df(spark, f"sample_clusters:{sf_dir}", build)


@register(
    "dedup_survivors",
    oracle=f"""
WITH RECURSIVE
{_JACCARD_PAIRS_SQL},
docs AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b, doc_a FROM edges
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a
),
clusters AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT)     AS cluster_size,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM clusters
GROUP BY cluster_id
""",
    tags=["llm", "dedup", "iterative"],
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's last stage: collapse each near-dup cluster to
    its canonical survivor (cluster_id = min doc_id, the same keep-rule the
    reference's keyed dedup uses — smallest/first key wins) and report the
    removal accounting per cluster. In production the survivor set joins
    back to the corpus as a left-semi on (doc_id = cluster_id); here the
    per-cluster rollup is emitted so the oracle checks both membership and
    the drop counts in one result. Reads the memoized cluster table
    (_sample_clusters) instead of re-deriving the CC fixpoint."""
    clusters = _sample_clusters(spark, sf_dir)
    return clusters.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size"),
        (F.count("*") - 1).cast("long").alias("n_dropped"),
    )


# --- end-to-end near-dup pipeline (LSH candidates -> exact verify -> CC) ---

#: Band shape for the full-corpus pipeline: the SAME 8 min-hashes banded
#: 4-rows-per-band into 2 bands. r=4 is the precision knob matched to the
#: J>=0.8 verification threshold (P[collide] = 1-(1-J^4)^2: 12% at J=0.5,
#: 97% at J=0.95) — candidate volume stays bounded even on this
#: vocabulary-degenerate corpus where the recall-tuned 2-row bands admit
#: ~80% of all pairs.
PIPE_ROWS_PER_BAND = 4
PIPE_N_BANDS = NUM_HASHES // PIPE_ROWS_PER_BAND


def _pipe_bands_sql() -> str:
    selects = []
    for b in range(PIPE_N_BANDS):
        parts = " || ".join(
            _minhash_sql(b * PIPE_ROWS_PER_BAND + r) for r in range(PIPE_ROWS_PER_BAND)
        )
        selects.append(
            f"SELECT d.doc_id, {b} AS band, ({parts}) AS band_key FROM documents d"
        )
    return "\nUNION ALL\n".join(selects)


_PIPELINE_SQL = f"""
WITH RECURSIVE
bands AS (
{_pipe_bands_sql()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
ws AS (SELECT doc_id, {_WORDS_SQL.replace('d.text', 'text')} AS w FROM documents),
edges AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN ws wa ON wa.doc_id = c.doc_a
  JOIN ws wb ON wb.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(wa.w, wb.w)) AS DOUBLE)
        / CAST(len(wa.w) + len(wb.w) - len(list_intersect(wa.w, wb.w)) AS DOUBLE)
        >= {JACCARD_THRESHOLD}
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b, doc_a FROM edges
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a
),
clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*) AS n FROM clusters GROUP BY cluster_id)
SELECT c.doc_id, c.cluster_id,
       CAST(s.n AS BIGINT)            AS cluster_size,
       c.doc_id = c.cluster_id        AS is_survivor
FROM clusters c JOIN sizes s ON s.cluster_id = c.cluster_id
"""


def _pipeline_clusters(
    spark: SparkSession,
    sf_dir: str,
    geometry: tuple[int, int] | None = None,
) -> DataFrame:
    """Full-corpus near-dup clusters: exact-collapse -> LSH candidates
    (precision-banded) -> exact token-set Jaccard verification bounded by
    the candidate set -> large-star/small-star connected components.
    Memoized per (session, sf_dir, geometry) — this is THE cluster table
    a production pipeline persists. ``geometry`` overrides the banding
    (rows_per_band, n_bands); None keeps the PIPE_* constants the
    registered dedup_pipeline oracle is built on — the curate CLI passes
    the plan_band_geometry_measured choice instead.

    Exact-collapse first (the production ordering): verbatim copies share
    the MinHash signature, land in the same band buckets, and verify at
    Jaccard 1.0, so the near-dup graph is exactly the quotient graph over
    exact-text representatives — collapsing an exact group to its
    min-doc_id rep before the pair join changes NO cluster id (the rep IS
    the group minimum, so the component minimum over reps equals the
    minimum over all docs) and removes the d^2 edge blowup a d-way
    verbatim duplicate group would feed the candidate join. One extra
    hash-agg + two key joins, all linear; on a duplicate-dense corpus the
    pair join shrinks by the squared duplication factor (measured
    sf0.1->sf1 on the 10x-replicated synthetic: exp 1.49 -> ~0, because
    the rep set does not grow at all there)."""

    def build() -> DataFrame:
        d = _spread(load_table(spark, sf_dir, "documents"))
        keyed = d.select("doc_id", "text", F.md5("text").alias("tkey"))
        reps = (
            keyed.groupBy("tkey")
            .agg(F.min("doc_id").alias("rep_id"))
            .localCheckpoint(eager=True)
        )
        members = keyed.select("doc_id", "tkey").join(reps, "tkey").select(
            "doc_id", "rep_id"
        )
        rep_docs = _spread(
            keyed.join(reps.select(F.col("rep_id").alias("doc_id")), "doc_id").select(
                "doc_id", "text"
            )
        )
        words = rep_docs.select(
            "doc_id", _words(F.col("text")).alias("ws")
        ).localCheckpoint(eager=True)
        rows_per_band, n_bands = geometry or (PIPE_ROWS_PER_BAND, PIPE_N_BANDS)
        cand = _band_pairs(
            _band_table(rep_docs, rows_per_band=rows_per_band, n_bands=n_bands)
        )
        wa = words.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("wa"))
        wb = words.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("wb"))
        n_inter = F.size(F.array_intersect("wa", "wb")).cast("double")
        n_union = (F.size("wa") + F.size("wb")).cast("double") - n_inter
        edges = (
            cand.join(wa, "doc_a")
            .join(wb, "doc_b")
            .select(
                F.col("doc_a").alias("src"),
                F.col("doc_b").alias("dst"),
                (n_inter / n_union).alias("jaccard"),
            )
            .where(F.col("jaccard") >= JACCARD_THRESHOLD)
            .drop("jaccard")
        )
        nodes = words.select(F.col("doc_id").alias("node"))
        rep_clusters = connected_components_star(nodes, edges).select(
            F.col("node").alias("rep_id"), F.col("comp").alias("cluster_id")
        )
        # fan the rep clusters back out to every exact-duplicate member;
        # cluster_id is already the global min doc_id (see docstring)
        return members.join(rep_clusters, "rep_id").select("doc_id", "cluster_id")

    geo_key = f":{geometry[0]}x{geometry[1]}" if geometry else ""
    return _memo_df(spark, f"pipeline_clusters:{sf_dir}{geo_key}", build)


@register("dedup_pipeline", oracle=_PIPELINE_SQL, tags=["llm", "dedup", "iterative"])
def dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup over the FULL corpus (no sample):
    exact-collapse -> MinHash signatures -> precision-banded LSH candidates
    -> exact Jaccard verify (join bounded by the candidate set,
    array_intersect in codegen — never an unbounded inverted-index blowup)
    -> large-star/small-star connected components -> per-doc cluster
    assignment with survivor flag and cluster size.

    Scale: every stage is linear-ish in docs + candidates; the only
    quadratic surface is within-band buckets of DISTINCT texts, bounded by
    the r=4 band precision — verbatim duplication (the dominant mode in web
    corpora, and the construction of the synthetic sf1) is removed by the
    exact-collapse before it can square the candidate set. Oracle: the
    identical pipeline in closed form (DuckDB recursive-CTE transitive
    closure over the same verified edge set; collapse-invariant, see
    _pipeline_clusters).

    Ref parity note: this composes the reference's keyed-dedup keep-rule
    (first/smallest key wins, api.py:238-257) with the LLM-pipeline near-dup
    extension the driver brief mandates."""
    clusters = _pipeline_clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    )


SUBSTR_K = 8  # tokens per exact window (50 in Lee et al.; docs here are ~60 tokens)
SUBSTR_FREQ_CAP = 50  # drop windows shared by more docs: boilerplate, not dup signal


@register(
    "exact_substring_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
  WHERE len(string_split(text, ' ')) >= {SUBSTR_K}
),
sh AS (
  SELECT DISTINCT t.doc_id,
         md5(array_to_string(t.tokens[g : g + {SUBSTR_K} - 1], ' ')) AS h
  FROM toks t
  CROSS JOIN UNNEST(range(1, len(t.tokens) - {SUBSTR_K} + 2)) AS u(g)
),
rare AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS freq FROM sh
  ) WHERE freq <= {SUBSTR_FREQ_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_windows
FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    tags=["llm", "dedup"],
)
def exact_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate detection: documents sharing any verbatim
    {SUBSTR_K}-token window (the exact-match complement of MinHash — the
    method of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", which MinHash misses when a long doc embeds a copied
    span too small to move the signature).

    Shape: windows are built IN-ROW (slice over an offset sequence —
    linear in doc length) and hashed to md5 so the shuffle carries 32-byte
    keys, never the window text. Per-(doc,window) distinct, then a
    COUNT(*) OVER (PARTITION BY h) window drops boilerplate windows
    occurring in more than {SUBSTR_FREQ_CAP} docs BEFORE the pair
    self-join — the join's per-bucket fan-out is capped at
    {SUBSTR_FREQ_CAP}^2, so the plan has no unbounded quadratic surface at
    100 TB (the frequency window and the join shuffle on the same key, so
    AQE reuses the exchange). Production note: K=50 and a suffix-array
    pass to recover maximal spans; the candidate-pair stage here is the
    distributed part that matters."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("tokens")).where(
        F.size("tokens") >= SUBSTR_K
    )
    # r14: per-(doc,window) distinctness is a PER-DOC property, so it
    # moves in-row (array_distinct before the explode) — the corpus-wide
    # DISTINCT Exchange of (doc_id, h) rows is gone (guide §2.4; plan
    # diff in plans/r14/: 14 Exchange -> 5)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("tokens") - SUBSTR_K + 1),
                    lambda g: F.md5(
                        F.concat_ws(" ", F.slice("tokens", g, SUBSTR_K))
                    ),
                )
            )
        ).alias("h"),
    )
    rare = (
        sh.withColumn("freq", F.count("*").over(Window.partitionBy("h")))
        .where(F.col("freq") <= SUBSTR_FREQ_CAP)
        .drop("freq")
    )
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared_windows"))
    )


# ------------------------------------------------------------ span removal

#: Occurrences are totally ordered by doc_id * POS_BASE + pos — a single
#: BIGINT both engines MIN() identically (struct/tuple MIN is not portable).
#: POS_BASE bounds in-doc token positions: a document with >= POS_BASE
#: tokens would bleed into the next doc_id's key range and silently corrupt
#: first-occurrence selection, so the operator GUARDS the bound at runtime
#: (raise_error on any over-long document — loud failure, never wrong
#: survivors). At 1e6 the key stays far inside BIGINT for any realistic
#: doc_id; raise POS_BASE (or pre-chunk with chunk_documents) for corpora
#: with million-token documents.
POS_BASE = 1_000_000


@register(
    "dedup_span_removal",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
),
win AS (
  SELECT doc_id, g AS pos,
         md5(array_to_string(tokens[g : g + {SUBSTR_K} - 1], ' ')) AS h
  FROM toks CROSS JOIN UNNEST(range(1, len(tokens) - {SUBSTR_K} + 2)) u(g)
  WHERE len(tokens) >= {SUBSTR_K}
),
occ AS (
  SELECT h, MIN(doc_id * {POS_BASE} + pos) AS first_occ, COUNT(*) AS cnt
  FROM win GROUP BY h
),
marked AS (
  SELECT w.doc_id, w.pos
  FROM win w JOIN occ o ON o.h = w.h
  WHERE o.cnt > 1 AND w.doc_id * {POS_BASE} + w.pos <> o.first_occ
),
covered AS (
  SELECT DISTINCT m.doc_id, m.pos + t.o AS pos
  FROM marked m CROSS JOIN UNNEST(range(0, {SUBSTR_K})) t(o)
),
tok AS (
  SELECT doc_id, u.p AS pos, tokens[u.p] AS tok
  FROM toks CROSS JOIN UNNEST(range(1, len(tokens) + 1)) u(p)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tok t
  ANTI JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
),
rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS new_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.tokens) AS BIGINT) AS n_tokens,
       CAST(len(d.tokens) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.new_text, '') AS new_text
FROM toks d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
""",
    tags=["llm", "dedup"],
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring SPAN REMOVAL — the second half of Lee et al.'s
    dedup (exact_substring_pairs finds the duplicated windows; this
    operator edits the corpus): every verbatim {SUBSTR_K}-token window
    keeps exactly its first occurrence (smallest (doc_id, position)) and
    every later occurrence has its tokens cut, then each document is
    rebuilt from its surviving tokens. Overlapping duplicated windows
    union their covered positions, so a long copied passage disappears
    once, not K times.

    Shape — linear end to end, NO pair join anywhere (contrast the
    pairs query, whose cost is sum(freq²) per window hash):
      1. windows built in-row and md5'd (32-byte shuffle keys);
      2. first-occurrence = MIN(doc_id * {POS_BASE} + pos) — a plain
         map-combinable aggregate on h, so a boilerplate window occurring
         in 10^6 docs costs one partial per map task, not a single-reducer
         window sort (the skew cliff a ROW_NUMBER() OVER (PARTITION BY h)
         formulation would hit at 100 TB);
      3. (r14, guide §8 "decide with small rows, move big rows once")
         marked occurrences fold to ONE cut-start list per affected doc
         — small (doc_id, pos) rows — and that per-doc plan row attaches
         to the token payload with a single doc_id join; the covered-
         position union, the token cut and the reassembly all happen
         IN-ROW (array ops over the cut list). The r13 shape instead
         posexploded EVERY token of EVERY doc and moved that corpus-
         sized stream through an anti-join Exchange AND a collect_list
         re-aggregation Exchange, then joined the rebuilt text back —
         three payload-scale shuffles where one suffices (before/after
         plans in plans/r14/: 14 Exchange -> 7, the remaining ones all
         carry 32-byte keys or per-doc plan rows except the single
         payload join).
    Production note: Lee et al. use K=50 over a suffix array to recover
    MAXIMAL spans; the distributed mark-and-cut here is the part that has
    to scale, and the union-of-positions step subsumes maximality for
    removal purposes (adjacent duplicated windows merge into one cut)."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    tokens = F.split("text", " ")
    # runtime guard for the POS_BASE key-packing bound: an over-long doc
    # fails the job loudly instead of corrupting first-occurrence keys
    guarded = F.when(
        F.size(tokens) >= POS_BASE,
        F.raise_error(
            F.concat(
                F.lit(
                    f"dedup_span_removal: document exceeds POS_BASE={POS_BASE}"
                    " tokens (doc_id "
                ),
                F.col("doc_id").cast("string"),
                F.lit("); raise POS_BASE or pre-chunk the corpus"),
            )
        ),
    ).otherwise(tokens)
    toks = d.select("doc_id", guarded.alias("tokens"))
    win = toks.where(F.size("tokens") >= SUBSTR_K).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("tokens") - SUBSTR_K + 1),
                lambda g: F.md5(F.concat_ws(" ", F.slice("tokens", g, SUBSTR_K))),
            )
        ).alias("p0", "h"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    okey = F.col("doc_id") * POS_BASE + F.col("pos")
    occ = win.groupBy("h").agg(
        F.min(okey).alias("first_occ"), F.count("*").alias("cnt")
    )
    marked = (
        win.join(occ, "h")
        .where((F.col("cnt") > 1) & (okey != F.col("first_occ")))
        .select("doc_id", "pos")
    )
    # the per-doc CUT PLAN: one small row per affected doc (win rows are
    # (doc,pos)-unique, so the list needs no dedup; bounded by doc length)
    cuts = marked.groupBy("doc_id").agg(
        F.collect_list("pos").alias("starts")
    )
    # attach the plan to the payload with the ONLY payload-carrying join,
    # then cut and rebuild in-row. __cov sits on its own projection level
    # so the filter lambda below references the materialized array rather
    # than re-expanding the sequence union per token.
    planned = toks.join(cuts, "doc_id", "left").select(
        "doc_id",
        "tokens",
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce("starts", F.array().cast("array<int>")),
                    lambda s: F.sequence(s, s + SUBSTR_K - 1),
                )
            )
        ).alias("__cov"),
    )
    kept = F.filter(
        "tokens", lambda t, i: ~F.array_contains("__cov", i + F.lit(1))
    )
    return planned.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        (F.size("tokens") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("new_text"),
    )


# ------------------------------------------------------ incremental LSH

DELTA_MOD = 10  # docs with doc_id % 10 == 0 play the "newly arrived" batch


# The delta-vs-index incremental operator is registered as
# ``minhash_incremental_planned`` below the geometry-planning section:
# its band geometry is DERIVED from the index size (the occupancy
# policy), so the planner must be defined before the registration runs.


def incremental_pairs_banded(
    d: DataFrame,
    rows_per_band: int,
    n_bands: int,
    delta_mod: int = DELTA_MOD,
) -> DataFrame:
    """Delta-vs-index candidate pairs at an EXPLICIT band geometry — the
    parameterization that makes the incremental contract hold at any index
    size: the per-tick probe cost is sum over buckets of
    |delta_bucket| x |bucket|, so it stays linear in the delta only while
    bucket occupancy is stable, and occupancy is set by the band-key
    length (rows_per_band). A production rolling index GROWS rows_per_band
    as the index grows (keys lengthen, buckets re-thin) — exactly how
    FAISS/LSH services re-train their quantizer as N climbs. The
    before/after is measured: SCALE_CURVE.json's
    ``minhash_incremental_held`` entry runs sf0.1 at the (2,4) geometry
    and sf1 at (4,2), holding occupancy across the decade."""
    bands = _band_table(d, rows_per_band, n_bands)
    delta = bands.where(F.col("doc_id") % delta_mod == 0)
    a, b = delta.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )


#: Doc-id buckets partitioning the MAINTAINED band-index table: an
#: update/delete touches exactly its doc's bucket, so an incremental
#: maintenance tick rewrites O(touched buckets), never the index.
INDEX_BUCKETS = 64


def maintain_band_index(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    cursor_file: str,
    rows_per_band: int = ROWS_PER_BAND,
    n_bands: int = N_BANDS,
    keep_snapshots: int = 3,
    plan_geometry: bool = False,
) -> int | None:
    """ROLLING BAND-INDEX MAINTENANCE — the service loop a production
    near-dup pipeline runs around the incremental-LSH probe: documents
    land as snapshot commits on ``docs_path``; each call here consumes
    the table's CDC feed (snapshot_consume_changes — durable cursor,
    at-least-once, metadata-pruned to the partitions the writers
    touched) and keeps a (doc_id, band, band_key) index table at
    ``index_path`` exactly current:

      - inserted/updated docs: band signatures recomputed IN-PROJECTION
        (band_projection — map-side only) and written;
      - updated/deleted docs: their old band rows retired.

    The index is partitioned by ``bkt = doc_id % {INDEX_BUCKETS}``, so a
    tick's writes collapse to a partition overwrite of the touched
    buckets: carried rows of those buckets are anti-joined by the
    changed doc_ids (distributed — no driver-side id list) and unioned
    with the fresh bands, one manifest commit. Cost per tick:
    O(|delta| signatures + touched buckets' index rows); the full index
    is never rewritten, and `streaming.neardup_stream` /
    `minhash_incremental_planned`-style probes read the index table as
    their static side. Idempotent per CDC contract: a replayed batch
    rewrites the same buckets to the same content.

    GEOMETRY PINNING: the band geometry is a TABLE property of the
    index, not a per-call argument to trust — a caller re-planning
    (r, b) between ticks would silently mix incompatible band keys. An
    existing index's recorded ``band.rows_per_band`` / ``band.n_bands``
    properties always win over the arguments; ``plan_geometry=True``
    derives the geometry from the FIRST batch's size through the
    integer occupancy thresholds (``plan_band_geometry_for_size`` — the
    minhash_incremental_planned policy) and records it on the index's
    manifest, so the service starts at the size-appropriate key length
    and every later tick reads the frozen choice back. Re-keying is an
    explicit full rebuild, never a drift. The pin commits ATOMICALLY
    with the index data (``snapshot_partition_overwrite(properties=)``)
    — a separate follow-up commit would leave a crash window with live
    index data and no pin; an index found WITHOUT a pin (built before
    pinning existed, or by a writer that crashed inside that old
    window) has the geometry this tick used backfilled onto its commit,
    so the invariant "index exists => pin exists" self-heals.

    A tick's whole read-pin -> commit -> cursor-ack sequence runs under
    the index's SERVICE lock (io.acquire_service_lock), serializing it
    against ``rebuild_band_index`` — without it a tick racing a rebuild
    could band its delta against the pre-rebuild pin and move the
    rebuilt cursor backwards.

    Returns the docs version now reflected, or None if already current.
    Parity (pytest, random commit sequences): after every call the
    index equals ``band_projection`` of the live docs exactly."""
    from callio_etl_spark.io import (
        acquire_service_lock,
        assert_service_fencing,
        release_service_lock,
    )
    from callio_etl_spark.snapshots import (
        snapshot_consume_changes,
        snapshot_manifest,
        snapshot_partition_overwrite,
        snapshot_read,
    )

    def process(batch: DataFrame) -> None:
        # a tick that stalled past the stale window and lost its service
        # lock must not band a delta against a pin a rebuild re-owned
        assert_service_fencing(spark, index_path)
        changed = batch.select("doc_id", "text", "_change").localCheckpoint(
            eager=True
        )
        bkt = (F.col("doc_id") % INDEX_BUCKETS).cast("int").alias("bkt")
        changed_ids = changed.select("doc_id").distinct()
        touched = [
            r["bkt"]
            for r in changed_ids.select(bkt).distinct().collect()
        ]  # ≤ INDEX_BUCKETS values — metadata-sized
        from callio_etl_spark.io import _exists, _hadoop

        # Hadoop-FS probe (not os.path): the index may live on an
        # hdfs://-/s3a://-style warehouse where a local check is always
        # False and the carry would silently drop untouched bucket rows.
        jvm, fs, _ = _hadoop(spark, index_path)
        exists = _exists(jvm, fs, index_path.rstrip("/") + "/__snap__")
        r_use, b_use = rows_per_band, n_bands
        pin_now = True  # every build/backfill pins atomically with its data
        if exists:
            # leaves=[] → top-manifest-only resolve on a spilled index
            # (properties are a top field): the pin check stays O(1)
            # metadata even against a 100k-bucket index on a cold driver
            props = snapshot_manifest(spark, index_path, leaves=[]).get(
                "properties", {}
            )
            if "band.rows_per_band" in props:
                # the index's recorded geometry is the truth: fresh keys
                # must be band-compatible with the carried ones
                r_use = int(props["band.rows_per_band"])
                b_use = int(props["band.n_bands"])
                pin_now = False
            else:
                # pre-pin index (or a crashed pre-fix writer's follow-up
                # never landed) — backfill a pin so drift protection is
                # never silently disabled. The geometry is INFERRED from
                # the index's own rows, not taken from the caller's args:
                # band_key is a concat of rows_per_band 4-hex-char minhash
                # slices and every doc emits all n_bands bands, so one
                # bucket's rows determine both parameters exactly —
                # backfilling caller args could pin a geometry the index
                # was never banded at and mix incompatible keys. One
                # partition probe (any bucket works), only on this rare
                # self-heal path. The candidate leaves are resolved by
                # NAME through the partial-leaves path (bkt values are
                # the fixed 0..INDEX_BUCKETS-1 residue set), so even on a
                # spilled 100k-leaf index this stays O(INDEX_BUCKETS)
                # metadata — never the full manifest enumeration the
                # surrounding code works to avoid.
                cand_names = [f"bkt={b}" for b in range(INDEX_BUCKETS)]
                leaves = snapshot_manifest(
                    spark, index_path, leaves=cand_names
                )["partitions"]
                inferred = None
                for leaf in sorted(
                    leaves, key=lambda s: int(s.split("=")[1])
                )[:16]:
                    got = (
                        snapshot_read(
                            spark,
                            index_path,
                            point=("bkt", int(leaf.split("=")[1])),
                        )
                        .agg(
                            F.max(F.length("band_key")).alias("kl"),
                            F.max("band").alias("mb"),
                        )
                        .first()
                    )
                    if got["kl"] is not None:
                        inferred = (
                            int(got["kl"]) // HASH_HEX_CHARS,
                            int(got["mb"]) + 1,
                        )
                        break
                if inferred is None:
                    # every probed bucket reads empty (e.g. rows masked
                    # by pending delete files): refusing is the only safe
                    # move — pinning the CALLER's unverified args here
                    # would bless exactly the key mix the pin excludes
                    raise ValueError(
                        f"index {index_path} has no pinned geometry and "
                        f"no readable rows to infer it from; run "
                        f"rebuild_band_index to re-key and re-pin"
                    )
                r_use, b_use = inferred
        elif plan_geometry:
            n_docs = changed.where(F.col("_change") != "delete").count()
            r_use, b_use = plan_band_geometry_for_size(n_docs)
        fresh = band_projection(
            changed.where(F.col("_change") != "delete"), r_use, b_use
        ).select("doc_id", "band", "band_key", bkt)
        if exists:
            carried = (
                snapshot_read(spark, index_path)
                .where(F.col("bkt").isin(touched))
                .join(changed_ids, "doc_id", "left_anti")
            )
            out = carried.select(*fresh.columns).unionByName(fresh)
        else:
            out = fresh
        out = out.localCheckpoint(eager=True)
        with_rows = {r["bkt"] for r in out.select("bkt").distinct().collect()}
        retire: list[str] = []
        if exists:
            # a touched bucket whose every doc was deleted writes NO rows,
            # so the dynamic overwrite cannot replace it — retire the
            # emptied buckets IN THE SAME COMMIT (retire_leaves): one
            # manifest publish per tick instead of two, and readers never
            # see the post-overwrite/pre-retirement half state
            cand = sorted(set(touched) - with_rows)
            # partial resolve: membership of the candidate buckets only —
            # O(touched) metadata, never the index's full enumeration
            leaves = snapshot_manifest(
                spark, index_path, leaves=[f"bkt={b}" for b in cand]
            )["partitions"]
            retire = [f"bkt={b}" for b in cand if f"bkt={b}" in leaves]
        # re-assert the fence AT the commit point: the O(delta) banding
        # above is exactly where a stall can outlast the stale window —
        # an entry-only fence would let the resumed tick commit buckets
        # banded under a pin a rebuild has since replaced
        assert_service_fencing(spark, index_path)
        if with_rows:
            snapshot_partition_overwrite(
                spark, out, index_path, "bkt", keep_snapshots=keep_snapshots,
                retire_leaves=retire or None,
                properties=(
                    {"band.rows_per_band": r_use, "band.n_bands": b_use}
                    if pin_now
                    else None
                ),
            )
        elif retire:
            # pure-delete tick with nothing to write: metadata-only retire
            from callio_etl_spark.snapshots import snapshot_delete_partitions

            snapshot_delete_partitions(
                spark,
                index_path,
                [lf.split("=", 1)[1] for lf in retire],
                keep_snapshots=keep_snapshots,
            )
        if pin_now and exists and not with_rows:
            # the backfill pin found no data commit to ride (pure-delete
            # or no-op tick against a pre-pin index): record the INFERRED
            # geometry now via a metadata-only properties commit rather
            # than deferring to the next non-empty tick — the deferral
            # window would leave drift protection silently disabled.
            from callio_etl_spark.snapshots import snapshot_set_properties

            snapshot_set_properties(
                spark,
                index_path,
                {"band.rows_per_band": r_use, "band.n_bands": b_use},
                keep_snapshots=keep_snapshots,
            )

    acquire_service_lock(spark, index_path)
    try:
        return snapshot_consume_changes(
            spark, docs_path, cursor_file, ["doc_id"], process
        )
    finally:
        release_service_lock(spark, index_path)


#: The grown geometry: same 8 min-hashes, re-banded 4-per-band into 2 keys.
#: Doubling the key length squares the per-band collision probability (for
#: J~uniform corpora), which is the occupancy-holding move for a 10x index.
GROWN_ROWS_PER_BAND = 4
GROWN_N_BANDS = NUM_HASHES // GROWN_ROWS_PER_BAND


# ------------------------------------------- band-geometry occupancy policy
#
# The across-decade "held" runs in SCALE_CURVE.json (minhash_incremental_held:
# exp 1.57 -> 1.13) proved that growing rows_per_band with the index keeps the
# probe join linear in the delta — but the geometry choice lived only in the
# bench harness. These functions make it an operator parameter: measure the
# corpus's single-row collision rate once, then pick the shortest band key
# (maximal recall) whose PREDICTED mean bucket occupancy stays within budget.

#: Default mean-bucket-occupancy budget: the expected number of docs sharing
#: a given doc's bucket. The probe join's per-bucket term is
#: |delta_bucket| x |bucket|, so occupancy ~2 keeps the candidate volume at
#: a small multiple of the true near-dup rate.
TARGET_OCCUPANCY = 2.0


def feasible_band_geometries(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    """(rows_per_band, n_bands) pairs the hash budget supports, shortest
    key first. Shorter keys = more recall (lower effective J threshold),
    longer keys = thinner buckets."""
    return [
        (r, num_hashes // r) for r in range(1, num_hashes + 1) if num_hashes % r == 0
    ]


def _band_index_roundtrip(
    spark: SparkSession, sf_dir: str, plan_geometry: bool
) -> DataFrame:
    """ROLLING BAND-INDEX MAINTENANCE end to end — the driver row for
    ``maintain_band_index`` (the near-dup index service, VERDICT r8 item
    1): commit a base corpus as a snapshot table, build the index from
    its CDC feed, then land ONE adversarial rewrite exercising every
    change class — deletions (% 5), text edits whose band keys must be
    retired-and-recomputed (% 7 -> ' rev2'), inserts (the held-out % 3
    cohort, id-shifted by a multiple of {INDEX_BUCKETS} so bucket
    residues are preserved), and the EMPTIED-BUCKET class (every doc of
    id-bucket 9 deleted, and no insert lands there — the index leaf must
    be retired by a metadata delete, not carried stale) — and tick the
    maintainer again. The result is the maintained index itself
    (doc_id, band, band_key); the oracle recomputes the banding from the
    FINAL corpus directly, so a stale band row, a missed retirement, a
    double-applied update, or an un-retired empty bucket all break the
    hash.

    Cost shape at 100 TB: each tick computes signatures for the delta
    only (map-side band_projection) and rewrites only the touched
    id-buckets' partitions — the full index is never rebuilt; the oracle
    side is the O(corpus) recompute the service exists to avoid."""
    from callio_etl_spark.queries.sinks import _materialize_and_clean, _tmp
    from callio_etl_spark.snapshots import (
        snapshot_partition_overwrite,
        snapshot_properties,
        snapshot_read,
    )

    root = _tmp("bandidx")
    docs_p, idx_p = f"{root}/docs", f"{root}/idx"
    cursor = f"{root}/cursor.json"
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    part = (F.col("doc_id") % 4).cast("string").alias("p")
    base = d.where(F.col("doc_id") % 3 != 0).select("doc_id", "text", part)
    snapshot_partition_overwrite(spark, base, docs_p, "p", keep_snapshots=5)
    v0 = maintain_band_index(
        spark, docs_p, idx_p, cursor, plan_geometry=plan_geometry
    )
    if plan_geometry:
        want = plan_band_geometry_for_size(base.count())
        got = snapshot_properties(spark, idx_p)
        pinned = (
            int(got.get("band.rows_per_band", -1)),
            int(got.get("band.n_bands", -1)),
        )
        if pinned != want:
            raise AssertionError(f"geometry not pinned: {pinned} != {want}")

    survivors = (
        base.where(
            (F.col("doc_id") % 5 != 1) & (F.col("doc_id") % INDEX_BUCKETS != 9)
        ).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 2, F.concat("text", F.lit(" rev2"))
            ).otherwise(F.col("text")),
        )
    )
    inserts = (
        d.where(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % INDEX_BUCKETS != 9)
        )
        .select(
            (F.col("doc_id") + 2000 * INDEX_BUCKETS).alias("doc_id"), "text"
        )
        .select("doc_id", "text", part)
    )
    snapshot_partition_overwrite(
        spark, survivors.unionByName(inserts), docs_p, "p", keep_snapshots=5
    )
    # the second tick passes a WRONG geometry on purpose: the index's
    # pinned properties (or the default build geometry) must win
    v1 = maintain_band_index(
        spark, docs_p, idx_p, cursor,
        rows_per_band=(8 if plan_geometry else ROWS_PER_BAND),
        n_bands=(1 if plan_geometry else N_BANDS),
        plan_geometry=plan_geometry,
    )
    if v0 is None or v1 is None or not v1 > v0:
        raise AssertionError(f"index did not advance: {v0} -> {v1}")
    idx = snapshot_read(spark, idx_p)
    if idx.where(F.col("bkt") == 9).count() != 0:
        raise AssertionError("emptied id-bucket 9 not retired from the index")
    return _materialize_and_clean(
        idx.select("doc_id", "band", "band_key"), root
    )


@register(
    "stream_ingest_band_index",
    oracle=f"""
WITH b1 AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
),
final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 14 = 0 THEN text || ' v2' ELSE text END AS text
  FROM b1
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
),
bands AS (
{_bands_union_sql(table="final")}
)
SELECT doc_id, band, band_key FROM bands
""",
    tags=["llm", "dedup", "streaming", "cdc", "index"],
)
def stream_ingest_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED streaming service loop as an oracle-checked roundtrip
    (streaming.run_docs_ingest_with_band_index — VERDICT r8 item 6 with a
    driver row): two landing-zone batches arrive as file-source
    micro-batch ticks — the even half of the corpus, then the odd half
    PLUS in-place updates of the % 14 == 0 docs (same doc_id, new text)
    — and each tick both lands the batch in the docs snapshot table
    (replay-idempotent merge-keys commits) and advances the persisted
    band index through the table's CDC cursor in the same foreachBatch
    call. The result is the index after tick 2; the oracle recomputes
    the banding from the FINAL corpus, so a tick that lost the carry, a
    stale band row for an updated doc, or an index that lagged a tick
    all break the hash.

    Scale shape: per tick the index work is O(|batch| signatures +
    touched id-buckets) and the data commit O(touched partitions) —
    the rolling-dedup service contract, here exercised through the
    actual Structured Streaming sink rather than direct calls."""
    import shutil
    import tempfile

    from callio_etl_spark.queries.sinks import _materialize_and_clean
    from callio_etl_spark.snapshots import snapshot_read
    from callio_etl_spark.streaming.incremental import (
        read_docs_stream,
        run_docs_ingest_with_band_index,
    )

    root = tempfile.mkdtemp(prefix="callio_streamidx_")
    src_dir, ck = f"{root}/src", f"{root}/ck"
    docs_p, idx_p = f"{root}/docs", f"{root}/idx"
    cursor = f"{root}/cursor.json"
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    def tick(batch: DataFrame) -> None:
        batch.write.mode("append").parquet(src_dir)
        run_docs_ingest_with_band_index(
            read_docs_stream(spark, src_dir), ck, docs_p, idx_p, cursor,
            "source",
            # a doc's source never changes across ticks here: skip the
            # moved-key lookup, keeping each tick O(touched partitions)
            stable_partitions=True,
        )

    tick(d.where(F.col("doc_id") % 2 == 0))
    updates = (
        d.where(F.col("doc_id") % 14 == 0)
        .withColumn("text", F.concat("text", F.lit(" v2")))
    )
    tick(d.where(F.col("doc_id") % 2 == 1).unionByName(updates))

    docs_n = snapshot_read(spark, docs_p).count()
    expect = d.count()
    if docs_n != expect:
        shutil.rmtree(root, ignore_errors=True)
        raise AssertionError(f"landed corpus wrong: {docs_n} != {expect}")
    idx = snapshot_read(spark, idx_p).select("doc_id", "band", "band_key")
    return _materialize_and_clean(idx, root)


@register(
    "maintain_band_index",
    oracle=f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS text
  FROM base WHERE doc_id % 5 <> 1 AND doc_id % {INDEX_BUCKETS} <> 9
  UNION ALL
  SELECT doc_id + {2000 * INDEX_BUCKETS} AS doc_id, text
  FROM documents WHERE doc_id % 3 = 0 AND doc_id % {INDEX_BUCKETS} <> 9
),
bands AS (
{_bands_union_sql(table="final")}
)
SELECT doc_id, band, band_key FROM bands
""",
    tags=["llm", "dedup", "cdc", "index", "sink"],
)
def maintain_band_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _band_index_roundtrip — the FIXED default-geometry form."""
    return _band_index_roundtrip(spark, sf_dir, plan_geometry=False)


def predicted_bucket_occupancy(
    n_docs: int, row_collision: float, rows_per_band: int
) -> float:
    """Expected occupants of a given doc's bucket under the independence
    model: 1 (the doc) + (n-1) * p^r, where p is the measured probability
    that two random docs agree on ONE minhash row. Band keys are r
    concatenated rows, so an unrelated pair collides with probability
    ~p^r — the squaring law the grown geometry exploits."""
    return 1.0 + max(0, n_docs - 1) * row_collision**rows_per_band


def plan_band_geometry(
    n_docs: int,
    row_collision: float,
    num_hashes: int = NUM_HASHES,
    target_occupancy: float = TARGET_OCCUPANCY,
) -> tuple[int, int]:
    """Pick the band geometry for an index of ``n_docs``: the SHORTEST
    feasible band key whose predicted mean bucket occupancy stays within
    ``target_occupancy`` — recall-maximal subject to the probe-cost
    bound. Falls back to the longest key (single band) when even that
    cannot hold the bound (a pathologically self-similar corpus; the
    remedy there is more hash budget, not shorter keys).

    This is the re-quantize-as-N-grows policy every production LSH/ANN
    index runs (FAISS re-trains its coarse quantizer the same way): as
    the index grows 10x, p^r must shrink 10x to hold occupancy, so keys
    lengthen by log(10)/log(1/p) rows. Deterministic: same stats in,
    same geometry out — safe for resumable pipelines.

    Caveat: the independence model UNDERESTIMATES occupancy when minhash
    rows are correlated across docs (shared-stopword corpora share their
    per-row minima) — use plan_band_geometry_measured when the corpus is
    at hand; this closed form is for planning ahead from scalar stats
    (e.g. sizing next year's index)."""
    if not 0.0 <= row_collision <= 1.0:
        raise ValueError(f"row_collision must be in [0,1], got {row_collision}")
    geometries = feasible_band_geometries(num_hashes)
    for r, b in geometries:
        if predicted_bucket_occupancy(n_docs, row_collision, r) <= target_occupancy:
            return (r, b)
    return geometries[-1]


def measured_bucket_occupancy(
    d: DataFrame, rows_per_band: int, n_bands: int
) -> float:
    """The quantity the planner budgets, MEASURED: the expected number of
    occupants of a random doc's bucket (averaged over bands) =
    avg over bands of sum_buckets c^2 / sum_buckets c. One banded
    projection + two aggregates; sample the corpus at 100 TB."""
    bands = band_projection(d, rows_per_band=rows_per_band, n_bands=n_bands)
    per = bands.groupBy("band", "band_key").agg(F.count("*").alias("c"))
    row = (
        per.groupBy("band")
        .agg(
            (
                F.sum(F.col("c").cast("double") * F.col("c"))
                / F.sum("c").cast("double")
            ).alias("occ")
        )
        .agg(F.avg("occ").alias("occ"))
        .first()
    )
    return float(row["occ"] or 0.0)


def plan_band_geometry_measured(
    d: DataFrame,
    num_hashes: int = NUM_HASHES,
    target_occupancy: float = TARGET_OCCUPANCY,
) -> tuple[int, int]:
    """plan_band_geometry with MEASURED occupancies instead of the
    independence model — the form the curate CLI runs. The closed form
    underestimates occupancy when minhash rows are correlated across
    docs (a stopword-dominated corpus shares its per-row minima, so
    agreeing on one row predicts agreeing on the next); measuring each
    feasible geometry directly is robust to that, at the cost of one
    cheap aggregate per candidate geometry over (a sample of) the
    corpus. Same contract: shortest key within budget, longest-key
    fallback when nothing holds (the fixture-style dense corpus — the
    remedy there is a bigger hash budget / wider hash space)."""
    geometries = feasible_band_geometries(num_hashes)
    for r, b in geometries:
        if measured_bucket_occupancy(d, r, b) <= target_occupancy:
            return (r, b)
    return geometries[-1]


#: Reference single-row collision rate for SIZE-DRIVEN geometry planning:
#: the probability two UNRELATED documents agree on one minhash row, for a
#: realistic open-vocabulary corpus (~1% — real web corpora measure
#: 10^-3..10^-2; estimate_row_collision measures ~0.61 on the SYNTHETIC
#: fixture because its vocabulary is tiny, which is a property of the
#: fixture, not of text). Size-driven planning holds p fixed at this
#: reference value and lets the INDEX SIZE pick the key length — the knob
#: that actually moves per tick in a rolling service — so the plan is a
#: pure function of COUNT(*) and both engines can derive it exactly.
P_REF = 0.01


def planned_geometry_thresholds(
    num_hashes: int = NUM_HASHES,
    p_ref: float = P_REF,
    target_occupancy: float = TARGET_OCCUPANCY,
) -> list[tuple[int, int, int]]:
    """(rows_per_band, n_bands, max_index_size) steps of the size-driven
    policy: the shortest feasible band key holds while
    1 + (n-1) * p_ref^r <= target_occupancy, i.e. n <= the INTEGER
    threshold floor(1 + (target-1)/p_ref^r). Integer thresholds are the
    cross-engine parity trick: the oracle compares COUNT(*) to the same
    baked-in integers, so no floating-point pow() in either engine can
    flip the geometry choice at a boundary."""
    import math

    return [
        (r, b, math.floor(1 + (target_occupancy - 1.0) / p_ref**r))
        for r, b in feasible_band_geometries(num_hashes)
    ]


def plan_band_geometry_for_size(
    n_docs: int,
    num_hashes: int = NUM_HASHES,
    p_ref: float = P_REF,
    target_occupancy: float = TARGET_OCCUPANCY,
) -> tuple[int, int]:
    """The size-driven form of plan_band_geometry: geometry from the
    index size alone, at the reference collision rate. Deterministic,
    integer-thresholded (see planned_geometry_thresholds) — the form a
    rolling dedup service re-plans with on every compaction, and the one
    the registered ``minhash_incremental_planned`` query runs."""
    steps = planned_geometry_thresholds(num_hashes, p_ref, target_occupancy)
    for r, b, thr in steps:
        if n_docs <= thr:
            return (r, b)
    return steps[-1][:2]


def _planned_incremental_oracle() -> str:
    """The delta-vs-index pair oracle with the SAME size-driven geometry
    derivation in SQL: COUNT(*) picks rows_per_band through the identical
    integer thresholds, and only the selected banding branch contributes
    rows. Exact parity with plan_band_geometry_for_size at any corpus
    size — the planning function and this CASE are generated from one
    threshold table."""
    steps = planned_geometry_thresholds()
    case = " ".join(f"WHEN n <= {thr} THEN {r}" for r, _b, thr in steps[:-1])
    branches = "\nUNION ALL\n".join(
        f"SELECT * FROM (\n{_bands_union_sql(r, b)}\n) AS g{r} "
        f"WHERE (SELECT r FROM sel) = {r}"
        for r, b, _thr in steps
    )
    return f"""
WITH sel AS (
  SELECT CASE {case} ELSE {steps[-1][0]} END AS r
  FROM (SELECT COUNT(*) AS n FROM documents)
),
bands AS (
{branches}
),
delta AS (SELECT * FROM bands WHERE doc_id % {DELTA_MOD} = 0)
SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
                GREATEST(a.doc_id, b.doc_id) AS doc_b
FROM delta a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id <> b.doc_id
"""


def rebuild_band_index(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    cursor_file: str,
    keep_snapshots: int = 3,
    target_occupancy: float = TARGET_OCCUPANCY,
) -> tuple[int, int]:
    """EXPLICIT RE-KEY of the rolling band index — the rebuild verb the
    geometry pin points to: re-plan (rows_per_band, n_bands) from the
    CURRENT corpus size through the integer occupancy thresholds, band
    the whole live corpus at the new geometry in one pass, replace the
    index (buckets emptied since the last geometry are retired in the
    SAME commit via retire_leaves), re-pin the new geometry as table
    properties, and acknowledge the consumer cursor at the docs version
    the rebuild derived from — a full re-derivation supersedes every
    change up to that version, so the next maintain tick consumes only
    commits that landed after it (commits racing the rebuild are simply
    the next tick's delta). This is the compaction-cadence operation a
    production service runs when the index crosses an occupancy
    threshold; between rebuilds `maintain_band_index` refuses to drift.

    The new geometry is re-pinned ATOMICALLY with the index overwrite
    (one manifest publish carries data + properties — no crash window
    between them), and the whole read -> overwrite -> cursor-ack
    sequence holds the index's SERVICE lock, so a maintain tick can
    never interleave: it either completes before the rebuild reads (its
    commits are part of the rebuilt corpus) or starts after the cursor
    is acked at the rebuild version. Returns the (rows_per_band,
    n_bands) now pinned."""
    from callio_etl_spark.io import (
        _exists,
        _hadoop,
        acquire_service_lock,
        release_service_lock,
    )
    from callio_etl_spark.snapshots import (
        _write_cursor,
        snapshot_manifest,
        snapshot_partition_overwrite,
        snapshot_read,
        snapshot_versions,
    )

    docs_path, index_path = docs_path.rstrip("/"), index_path.rstrip("/")
    acquire_service_lock(spark, index_path)
    try:
        # resolve the version BEFORE reading: a commit racing the rebuild
        # lands after v and stays in the feed for the next tick
        v = snapshot_versions(spark, docs_path)[-1]
        docs = snapshot_read(spark, docs_path, version=v).select(
            "doc_id", "text"
        )
        n = docs.count()
        if n == 0:
            raise ValueError("rebuild needs a non-empty corpus")
        r, b = plan_band_geometry_for_size(
            n, target_occupancy=target_occupancy
        )
        bkt = (F.col("doc_id") % INDEX_BUCKETS).cast("int").alias("bkt")
        fresh = (
            band_projection(docs, r, b)
            .select("doc_id", "band", "band_key", bkt)
            .localCheckpoint(eager=True)
        )
        present = {
            row["bkt"] for row in fresh.select("bkt").distinct().collect()
        }
        retire: list[str] = []
        jvm, fs, _ = _hadoop(spark, index_path)
        if _exists(jvm, fs, index_path + "/__snap__"):
            # membership probe of the fixed residue set via the
            # partial-leaves path (O(INDEX_BUCKETS) metadata even on a
            # spilled manifest), never a full segment enumeration
            leaves = snapshot_manifest(
                spark,
                index_path,
                leaves=[f"bkt={b_}" for b_ in range(INDEX_BUCKETS)],
            )["partitions"]
            retire = sorted(
                leaf
                for leaf in leaves
                if int(leaf.split("=", 1)[1]) not in present
            )
        from callio_etl_spark.io import assert_service_fencing

        assert_service_fencing(spark, index_path)
        snapshot_partition_overwrite(
            spark, fresh, index_path, "bkt",
            keep_snapshots=keep_snapshots, retire_leaves=retire or None,
            properties={"band.rows_per_band": r, "band.n_bands": b},
        )
        _write_cursor(cursor_file, v, docs_path)
        return r, b
    finally:
        release_service_lock(spark, index_path)


def _maintained_planned_oracle() -> str:
    """The maintained-index oracle with the SAME size-driven geometry
    derivation in SQL as plan_band_geometry_for_size: the INITIAL
    corpus's COUNT(*) picks rows_per_band through the identical integer
    thresholds (geometry is pinned at first build — the index table
    property — so the FINAL corpus is banded at the initial choice),
    and only the selected banding branch contributes rows."""
    steps = planned_geometry_thresholds()
    case = " ".join(f"WHEN n <= {thr} THEN {r}" for r, _b, thr in steps[:-1])
    branches = "\nUNION ALL\n".join(
        f"SELECT * FROM (\n{_bands_union_sql(r, b, table='final')}\n) AS g{r} "
        f"WHERE (SELECT r FROM sel) = {r}"
        for r, b, _thr in steps
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
sel AS (
  SELECT CASE {case} ELSE {steps[-1][0]} END AS r
  FROM (SELECT COUNT(*) AS n FROM base)
),
final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS text
  FROM base WHERE doc_id % 5 <> 1 AND doc_id % {INDEX_BUCKETS} <> 9
  UNION ALL
  SELECT doc_id + {2000 * INDEX_BUCKETS} AS doc_id, text
  FROM documents WHERE doc_id % 3 = 0 AND doc_id % {INDEX_BUCKETS} <> 9
),
bands AS (
{branches}
)
SELECT doc_id, band, band_key FROM bands
"""


@register(
    "maintain_band_index_planned",
    oracle=_maintained_planned_oracle(),
    tags=["llm", "dedup", "cdc", "index", "sink", "scale-path"],
)
def maintain_band_index_planned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band-index service at the SIZE-PLANNED, PROPERTY-PINNED
    geometry — maintain_band_index(plan_geometry=True): the first tick
    derives (rows_per_band, n_bands) from the corpus size through the
    integer occupancy thresholds and records it as TABLE PROPERTIES on
    the index manifest (snapshot_set_properties); the second tick is
    deliberately called with a WRONG geometry argument and must use the
    pinned properties instead — key-compatibility by construction, the
    drift class a rolling service must exclude. Same adversarial change
    classes and oracle shape as ``maintain_band_index``, but the oracle
    derives the geometry from COUNT(*) of the initial corpus through the
    SAME baked-in thresholds, so a service that re-planned mid-life,
    ignored the pin, or recorded the wrong choice breaks the hash."""
    return _band_index_roundtrip(spark, sf_dir, plan_geometry=True)


@register(
    "rebuild_band_index",
    oracle=_maintained_planned_oracle(),
    tags=["llm", "dedup", "cdc", "index", "sink", "scale-path"],
)
def rebuild_band_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXPLICIT RE-KEY verb as an oracle-checked roundtrip — the
    rebuild half of the geometry-pin story (``rebuild_band_index``; the
    maintain half is ``maintain_band_index_planned``): the index is
    FIRST built from a tiny seed corpus (doc_id % 97 == 7 of the base —
    the planner pins the short-key geometry its size warrants), then the
    FULL base corpus lands and a maintain tick grows the index AT THE
    OLD PIN (pins forbid drift, so the now-overcrowded geometry is kept
    — exactly the occupancy debt a production service accrues), then
    ``rebuild_band_index`` re-plans from the grown corpus size through
    the integer occupancy thresholds, re-bands EVERYTHING at the new
    geometry, re-pins it ATOMICALLY with the overwrite, and acks the
    consumer cursor — and finally the standard adversarial rewrite
    (deletes / band-key edits / id-shifted inserts / the emptied-bucket
    class) lands and a maintain tick with DELIBERATELY WRONG geometry
    arguments must band the delta at the REBUILT pin. The oracle
    recomputes the banding of the final corpus at the geometry the BASE
    corpus size selects (the rebuild-time choice, via the same baked-in
    integer thresholds), so a rebuild that kept the seed-era keys, a
    tick that ignored the new pin, or a cursor ack that replayed the
    pre-rebuild feed all break the hash.

    Cost shape at 100 TB: the rebuild is the one deliberate O(corpus)
    pass (compaction cadence — FAISS's re-train); every tick around it
    stays O(delta + touched id-buckets)."""
    from callio_etl_spark.queries.sinks import _materialize_and_clean, _tmp
    from callio_etl_spark.snapshots import (
        snapshot_partition_overwrite,
        snapshot_properties,
        snapshot_read,
    )

    root = _tmp("bandrebuild")
    docs_p, idx_p = f"{root}/docs", f"{root}/idx"
    cursor = f"{root}/cursor.json"
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    part = (F.col("doc_id") % 4).cast("string").alias("p")
    base = d.where(F.col("doc_id") % 3 != 0).select("doc_id", "text", part)

    # 1. seed build: tiny corpus -> planner pins the short-key geometry
    seed = base.where(F.col("doc_id") % 97 == 7)
    snapshot_partition_overwrite(spark, seed, docs_p, "p", keep_snapshots=5)
    v0 = maintain_band_index(
        spark, docs_p, idx_p, cursor, plan_geometry=True
    )
    seed_geom = plan_band_geometry_for_size(seed.count())

    # 2. growth: the full base lands; the tick must keep the seed pin
    snapshot_partition_overwrite(spark, base, docs_p, "p", keep_snapshots=5)
    v1 = maintain_band_index(
        spark, docs_p, idx_p, cursor, plan_geometry=True
    )
    got = snapshot_properties(spark, idx_p)
    pinned = (
        int(got.get("band.rows_per_band", -1)),
        int(got.get("band.n_bands", -1)),
    )
    if pinned != seed_geom:
        raise AssertionError(
            f"growth tick drifted the pin: {pinned} != {seed_geom}"
        )

    # 3. explicit rebuild: re-plan from the grown size, re-key, re-pin
    want = plan_band_geometry_for_size(base.count())
    got_rb = rebuild_band_index(spark, docs_p, idx_p, cursor)
    if got_rb != want:
        raise AssertionError(f"rebuild planned {got_rb}, expected {want}")
    if maintain_band_index(spark, docs_p, idx_p, cursor) is not None:
        raise AssertionError(
            "rebuild did not ack the cursor: the next tick replayed the "
            "pre-rebuild feed"
        )

    # 4. adversarial rewrite at the NEW pin; wrong args must lose
    survivors = (
        base.where(
            (F.col("doc_id") % 5 != 1) & (F.col("doc_id") % INDEX_BUCKETS != 9)
        ).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 2, F.concat("text", F.lit(" rev2"))
            ).otherwise(F.col("text")),
        )
    )
    inserts = (
        d.where(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % INDEX_BUCKETS != 9)
        )
        .select(
            (F.col("doc_id") + 2000 * INDEX_BUCKETS).alias("doc_id"), "text"
        )
        .select("doc_id", "text", part)
    )
    snapshot_partition_overwrite(
        spark, survivors.unionByName(inserts), docs_p, "p", keep_snapshots=5
    )
    v2 = maintain_band_index(
        spark, docs_p, idx_p, cursor, rows_per_band=NUM_HASHES, n_bands=1
    )
    if v0 is None or v1 is None or v2 is None or not v0 < v1 < v2:
        raise AssertionError(f"index did not advance: {v0} -> {v1} -> {v2}")
    idx = snapshot_read(spark, idx_p)
    if idx.where(F.col("bkt") == 9).count() != 0:
        raise AssertionError("emptied id-bucket 9 not retired from the index")
    return _materialize_and_clean(
        idx.select("doc_id", "band", "band_key"), root
    )


@register(
    "minhash_incremental_planned",
    oracle=_planned_incremental_oracle(),
    tags=["llm", "dedup", "incremental", "scale-path"],
)
def minhash_incremental_planned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash-LSH dedup at the SIZE-PLANNED band geometry —
    the production form: a newly arrived batch (doc_id % {DELTA_MOD} == 0
    plays the delta) is checked against the already-indexed corpus AND
    against itself, never re-pairing the index with the index, and the
    band-key length is DERIVED from the index size by the occupancy
    policy (plan_band_geometry_for_size) instead of being frozen — keys
    lengthen as the index crosses each planned threshold, holding bucket
    occupancy and keeping the probe join linear in the delta (the
    FAISS-re-trains-its-quantizer move, SCALE_CURVE's
    ``minhash_incremental_held`` measured it: exp 1.57 fixed -> 1.13
    held across the sf0.1 -> sf1 decade). Subsumes the fixed-geometry
    ``minhash_incremental_pairs`` of earlier rounds: at driver scale the
    planner picks the same (2, 4) geometry, so the result rows are
    identical; at 10x it switches to (4, 2) where the fixed form went
    quadratic-ish.

    Scale shape: the band-signature table is the persisted index (in
    production a bucketed parquet table keyed on (band, band_key));
    each tick computes signatures for |delta| docs only and probes with
    a delta-to-index equi-join — cost sum over buckets of
    |delta_bucket| x |bucket|, linear in the delta at held occupancy.
    The index size the planner reads is one COUNT(*) (at 100 TB: the
    table stats / manifest row count, free). The full-corpus pair set
    is the union of every tick's output — the C4/RefinedWeb rolling
    dedup service contract. Composes downstream like any pair source:
    verify with ngram_jaccard_pairs' exact Jaccard, then
    connected_components_star."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    r, b = plan_band_geometry_for_size(d.count())
    return incremental_pairs_banded(d, r, b)


def plan_cell_bits(
    n_vecs: int, n_base_cells: int, target_cell_size: int = 64
) -> int:
    """The embedding-cells analog of the band planner: how many sign-
    hyperplane refinement bits neardup_cells_pairs needs so the expected
    cell size n / (base_cells * 2^bits) stays within target — the
    corpus-proportional-cells policy that keeps the pair join's
    sum(|cell|^2) linear as the corpus grows (IVF re-training's role).
    Closed form, deterministic; reproduces the SCALE_CURVE held run
    exactly: plan_cell_bits(500, 10) = 0 (sf0.1), plan_cell_bits(5000,
    10) = 3 (sf1)."""
    import math

    if n_vecs <= 0 or n_base_cells <= 0:
        raise ValueError("n_vecs and n_base_cells must be positive")
    if target_cell_size < 1:
        raise ValueError("target_cell_size must be >= 1")
    return max(
        0, math.ceil(math.log2(n_vecs / (n_base_cells * target_cell_size)))
    )


def estimate_row_collision(d: DataFrame, num_hashes: int = NUM_HASHES) -> float:
    """Measure the single-row minhash collision probability on a corpus
    (run it on the exact-text REP set — verbatim copies collide at 1.0 by
    construction and are the exact-collapse family's job, not the
    geometry's): for each of the ``num_hashes`` rows, the probability two
    random docs share that row's value is sum_v c_v(c_v-1) / (n(n-1));
    averaged over rows. One banded projection (rows_per_band=1) -> one
    (band, value) count -> one scalar aggregate; at 100 TB run it on a
    sampled slice — the estimate is a mean over ~n^2 pairs, so even a 1%
    sample is tight."""
    bands = band_projection(d, rows_per_band=1, n_bands=num_hashes)
    per_value = bands.groupBy("band", "band_key").agg(F.count("*").alias("c"))
    row = (
        per_value.groupBy("band")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1)).alias("coll"),
            F.sum("c").alias("n"),
        )
        .agg(
            F.avg(
                F.col("coll").cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
            ).alias("p")
        )
        .first()
    )
    return float(row["p"] or 0.0)


@register(
    "minhash_incremental_grown",
    oracle=f"""
WITH bands AS (
{_bands_union_sql(GROWN_ROWS_PER_BAND, GROWN_N_BANDS)}
),
delta AS (SELECT * FROM bands WHERE doc_id % {DELTA_MOD} = 0)
SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
                GREATEST(a.doc_id, b.doc_id) AS doc_b
FROM delta a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id <> b.doc_id
""",
    tags=["llm", "dedup", "incremental", "scale-path"],
)
def minhash_incremental_grown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta-vs-index probe at the FIXED GROWN band geometry
    ({GROWN_ROWS_PER_BAND} rows/band x {GROWN_N_BANDS} bands) — the
    registered proof that the occupancy-holding knob is a working
    operator, not prose: same signature fold, same delta-vs-index probe,
    but band keys twice as long, so buckets hold ~sqrt the occupants and
    the probe join's per-bucket term stays flat as the index grows. The
    recall trade is explicit and standard: longer keys target a higher
    Jaccard threshold (r=4,b=2 ~ J>=0.84 at 50% capture vs r=2,b=4 ~
    J>=0.7) — the service keeps capture constant by adding hash functions
    as it lengthens keys (NUM_HASHES is the budget knob). Measured:
    SCALE_CURVE.json ``minhash_incremental_held`` holds this geometry
    growth across the sf0.1 -> sf1 decade."""
    d = _spread(load_table(spark, sf_dir, "documents"))
    return incremental_pairs_banded(d, GROWN_ROWS_PER_BAND, GROWN_N_BANDS)
