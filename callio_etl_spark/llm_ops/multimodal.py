"""Multimodal column plumbing (SURVEY.md section 7.4): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The container ships no media libraries, so the decode step is a clearly
marked stub: ``decode_image_stub`` produces deterministic fake features (and
``decode_image_real`` raises NotImplementedError behind an import-try for
PIL). Everything Spark-side — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested.

Scale notes: payload bytes never hit the driver; mapInPandas streams Arrow
batches through Python with spark.sql.execution.arrow.maxRecordsPerBatch
bounding memory. Binary columns inflate row size, so production stores
payloads in their own parquet column chunk (automatic) and prunes it unless
the decode stage is in the plan (column pruning keeps metadata-only queries
payload-free).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from callio_etl_spark.registry import register
from callio_etl_spark.tables import load_table

#: Output schema of the (stubbed) decoder — what a real image decoder yields.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal layout from documents: payload = UTF-8 bytes
    of text as an opaque binary column + typed metadata. A real pipeline
    reads (uri, payload, media_type, meta) from parquet in exactly this
    shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("source").alias("uri"),
    )


@register(
    "multimodal_meta",
    oracle="""
SELECT d.doc_id,
       CASE WHEN d.doc_id % 3 = 0 THEN 'image'
            WHEN d.doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END                       AS media_type,
       octet_length(encode(d.text))                AS byte_len,
       md5(d.text)                                 AS content_md5,
       upper(substr(hex(encode(d.text)), 1, 8))    AS magic_prefix
FROM documents d
""",
    tags=["llm", "multimodal"],
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pass over binary payloads — byte length, content hash, magic
    prefix — entirely JVM-side; column pruning means the payload column is
    read but never shipped to Python. This is the dedup/partitioning key
    layer for multimodal corpora."""
    m = media_table(spark, sf_dir)
    # md5 over the binary payload == md5 of the text it encodes (UTF-8), so
    # no join back to documents is needed — one scan, zero shuffles.
    return m.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("byte_len"),
        F.md5("payload").alias("content_md5"),
        F.upper(F.substring(F.hex("payload"), 1, 8)).alias("magic_prefix"),
    )


def has_pillow() -> bool:
    """Probe for the optional real-decode dependency."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decoder behind the optional Pillow dependency: actual
    dimensions plus a 4-dim feature vector (mean R/G/B in [0,1] and aspect
    ratio). Same signature as decode_image_stub, so it drops into
    extract_media_features(decoder=...) without touching the plan; raises
    NotImplementedError when Pillow is absent (this container ships none —
    tests skip-mark accordingly)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires Pillow; container ships none — "
            "use decode_image_stub (deterministic fake) instead"
        ) from exc
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    width, height = img.size
    n = float(width * height)
    # mean per channel without numpy: PIL histogram is 256 bins x 3 channels
    hist = img.histogram()
    means = [
        sum(i * hist[c * 256 + i] for i in range(256)) / (255.0 * n)
        for c in range(3)
    ]
    features = [round(m, 6) for m in means] + [round(width / float(height), 6)]
    return width, height, features


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dimensions and a 4-dim feature vector
    derived from the payload bytes (stable across runs/engines)."""
    import hashlib

    h = hashlib.md5(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    features = [round(b / 255.0, 6) for b in h[2:6]]
    return width, height, features


def extract_media_features(media: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The UDF consumes (doc_id, payload, media_type) Arrow batches and yields
    MEDIA_FEATURES_SCHEMA batches. ``decoder`` is any
    ``bytes -> (width, height, features)`` callable — ``decode_image_stub``
    (default) or ``decode_image_real`` when Pillow is installed; swapping it
    does not touch the plan."""
    decoder = decoder or decode_image_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats, lens = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                w, h, f = decoder(b)
                ws.append(w)
                hs.append(h)
                feats.append(f)
                lens.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": lens,
                    "width": ws,
                    "height": hs,
                    "features": feats,
                }
            )

    return media.select("doc_id", "payload", "media_type").mapInPandas(
        run, MEDIA_FEATURES_SCHEMA
    )


@register("media_features", oracle=None, tags=["llm", "multimodal"])
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pass (stubbed decoder, real plumbing): binary
    payloads -> mapInPandas -> typed features. No oracle — mapInPandas is not
    SQL-expressible; the driver records a rows-only check, and
    tests/test_llm_ops.py asserts the deterministic feature values.

    The input is spread to the session's parallelism first: a single-file
    scan would otherwise funnel every Arrow batch through one Python worker.

    Output is scalar-only: the 4-dim feature vector is projected to f0..f3
    DOUBLE columns because the driver's rows-only canonicalizer cannot sort
    array cells (pandas raises on numpy.ndarray). The array-typed plumbing
    (extract_media_features / MEDIA_FEATURES_SCHEMA) is unchanged."""
    from callio_etl_spark.tables import spread

    feats = extract_media_features(spread(media_table(spark, sf_dir)))
    return feats.select(
        "doc_id",
        "media_type",
        "byte_len",
        "width",
        "height",
        *[F.col("features").getItem(i).alias(f"f{i}") for i in range(4)],
    )


FRAME_BYTES = 64  # stub frame stride: payload bytes per pseudo-frame
FRAME_EVERY_N = 4  # keep every Nth frame


@register(
    "frame_sample",
    oracle=f"""
WITH v AS (
  SELECT d.doc_id, hex(encode(d.text)) AS payload_hex,
         octet_length(encode(d.text)) AS byte_len
  FROM documents d WHERE d.doc_id % 3 = 2
),
idx AS (
  SELECT v.doc_id, v.payload_hex, u.i AS frame_idx
  FROM v CROSS JOIN UNNEST(range(0, v.byte_len // {FRAME_BYTES})) AS u(i)
  WHERE u.i % {FRAME_EVERY_N} = 0
)
-- DuckDB has no BLOB substring; slicing the hex string is byte-equivalent:
-- hex(payload[k : k+{FRAME_BYTES}])[:16] == substr(hex(payload), 2*k+1, 16)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       UPPER(substr(payload_hex, CAST(frame_idx * {FRAME_BYTES} * 2 + 1 AS INT), 16)) AS frame_sig
FROM idx
""",
    tags=["llm", "multimodal"],
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling — the fan-out shape (one payload row -> many
    frame rows), entirely JVM-side: frame offsets from a sequence, every
    Nth kept, the frame's bytes sliced out of the binary payload with
    substr and fingerprinted. The stub 'codec' treats each {FRAME_BYTES}-
    byte stride as a frame (deterministic, oracle-checkable); a real codec
    swaps the slice+fingerprint for a mapInPandas decode exactly like
    extract_media_features — the distribution shape (in-row offset
    generation, explode, no shuffle) is the part that survives at 100 TB.
    Partial tail bytes are dropped, as a real GOP-aligned sampler would."""
    v = media_table(spark, sf_dir).where(F.col("media_type") == "video")
    n_frames = F.floor(F.octet_length("payload") / FRAME_BYTES).cast("long")
    idx = v.select(
        "doc_id",
        "payload",
        F.explode(
            F.filter(
                F.sequence(F.lit(0).cast("long"), n_frames - 1),
                lambda i: i % FRAME_EVERY_N == 0,
            )
        ).alias("frame_idx"),
    ).where(n_frames > 0)
    frame = F.col("payload").substr(
        (F.col("frame_idx") * FRAME_BYTES + 1).cast("int"), F.lit(FRAME_BYTES)
    )
    return idx.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.upper(F.substring(F.hex(frame), 1, 16)).alias("frame_sig"),
    )


RESIZE_BOX = (32, 32)  # fit-in-box target for the resize pass

MEDIA_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("new_width", LongType()),
        StructField("new_height", LongType()),
        StructField("scale", DoubleType()),
    ]
)


def resize_media(media: DataFrame, box=RESIZE_BOX, decoder=None) -> DataFrame:
    """Resize pass over binary payloads via the same Arrow mapInPandas
    plumbing as extract_media_features: decode dimensions (stub or real),
    compute aspect-preserving fit-in-box dims. With Pillow installed the
    decoder is decode_image_real and a real pipeline would also emit the
    re-encoded payload — the plan (scan -> Arrow batches -> Python -> Arrow
    out, payload never on the driver) is identical."""
    decoder = decoder or decode_image_stub
    bw, bh = box

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, nws, nhs, scales = [], [], [], [], []
            for payload in pdf["payload"]:
                w, h, _ = decoder(bytes(payload))
                s = min(bw / float(w), bh / float(h), 1.0)
                ws.append(w)
                hs.append(h)
                nws.append(max(1, int(w * s)))
                nhs.append(max(1, int(h * s)))
                scales.append(round(s, 6))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": ws,
                    "height": hs,
                    "new_width": nws,
                    "new_height": nhs,
                    "scale": scales,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, MEDIA_RESIZE_SCHEMA)


@register("media_resize", oracle=None, tags=["llm", "multimodal"])
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over image payloads (stub decoder,
    real Arrow plumbing — rows-only like media_features: mapInPandas is
    not SQL-expressible). Scalar output only; deterministic values
    asserted in tests/test_llm_ops.py."""
    from callio_etl_spark.tables import spread

    m = spread(media_table(spark, sf_dir).where(F.col("media_type") == "image"))
    return resize_media(m)
