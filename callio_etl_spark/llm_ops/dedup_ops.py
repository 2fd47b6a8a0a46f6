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
from pyspark.sql import DataFrame, SparkSession

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
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    return (
        d.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def _minhash_bands_oracle() -> str:
    band_selects = []
    for b in range(N_BANDS):
        parts = " || ".join(
            _minhash_sql(b * ROWS_PER_BAND + r) for r in range(ROWS_PER_BAND)
        )
        band_selects.append(
            f"SELECT d.doc_id, {b} AS band, ({parts}) AS band_key FROM documents d"
        )
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH bands AS (
{bands}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
"""


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
    sig = d.select("doc_id", _minhash_sig(_words(F.col("text"))).alias("mins"))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(
                *[
                    F.element_at("mins", b * ROWS_PER_BAND + r + 1)
                    for r in range(ROWS_PER_BAND)
                ]
            ).alias("band_key"),
        )
        for b in range(N_BANDS)
    ]
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bk"))
        .select(
            "doc_id",
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )
        # materialize once: a self-join evaluates its input subtree on BOTH
        # sides (broadcast + stream), which would run the whole
        # tokenize->minhash signature pass twice. The band table is 4 short
        # rows per doc — at scale this is the signature table you'd persist
        # anyway before pair generation.
        .localCheckpoint(eager=True)
    )
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
    components give each doc a cluster id = min doc_id reachable (the
    canonical survivor). Oracle: DuckDB recursive-CTE transitive closure —
    exact same fixpoint, closed-form.

    Uses the same deterministic doc_id%5 sample as ngram_jaccard_pairs
    (the all-pairs verification is quadratic on this vocabulary-degenerate
    corpus; production feeds LSH candidates)."""
    d = _spread(load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0))
    nodes = d.select(F.col("doc_id").alias("node"))
    edges = ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(nodes, edges).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


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
    the drop counts in one result."""
    clusters = dedup_cluster_assign(spark, sf_dir)
    return clusters.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size"),
        (F.count("*") - 1).cast("long").alias("n_dropped"),
    )
