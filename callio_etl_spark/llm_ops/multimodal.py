"""Multimodal column plumbing (SURVEY.md section 7.4): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The container ships no media libraries, so dimension decode is done by a
vendored pure-Python header parser (``parse_image_header``: PNG IHDR, JPEG
SOFn segment walk, GIF screen descriptor) — real bytes in, real dimensions
out, no Pillow. ``decode_media`` is the default decoder (header parse with
``decode_image_stub`` as the deterministic fallback for unrecognized
formats); ``decode_image_real`` adds full pixel statistics behind an
import-try for PIL. Everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.

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


#: Header sizes of the synthesized payloads (see image_table): PNG magic(8) +
#: IHDR chunk(4 len + 4 type + 13 data + 4 crc) = 33; JPEG SOI(2) + APP0(18) +
#: SOF0 marker+length(2+17) = 39.
PNG_HEADER_LEN = 33
JPEG_HEADER_LEN = 39

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0..SOF15 minus DHT/JPG/DAC


def parse_image_header(payload: bytes) -> tuple[int, int] | None:
    """Vendored pure-Python image dimension sniffer — no Pillow needed.
    Reads (width, height) from real format headers: PNG IHDR (big-endian
    at bytes 16-23), JPEG SOFn segments (scans the segment chain from SOI,
    skipping APPn/COM/quant tables until a start-of-frame marker), and GIF
    87a/89a logical screen descriptor (little-endian at bytes 6-9).
    Returns None for anything unrecognized so callers can fall back to a
    stub decoder. Only header bytes are touched — O(#segments), never the
    pixel data — which is exactly what a 100 TB metadata pass wants."""
    n = len(payload)
    # PNG: magic, then IHDR must be the first chunk.
    if n >= 24 and payload[:8] == _PNG_MAGIC and payload[12:16] == b"IHDR":
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        return (width, height) if width > 0 and height > 0 else None
    # GIF: 6-byte signature then 2x little-endian u16.
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        return (width, height) if width > 0 and height > 0 else None
    # JPEG: walk marker segments until a SOFn frame header.
    if n >= 4 and payload[0] == 0xFF and payload[1] == 0xD8:
        i = 2
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None  # desynced — not a well-formed segment chain
            marker = payload[i + 1]
            if marker == 0xD9 or marker == 0xDA:  # EOI / start-of-scan
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > n:
                    return None
                height = int.from_bytes(payload[i + 5 : i + 7], "big")
                width = int.from_bytes(payload[i + 7 : i + 9], "big")
                return (width, height) if width > 0 and height > 0 else None
            i += 2 + seg_len
        return None
    return None


def _be_bytes(col, width_bytes: int):
    """Big-endian fixed-width binary encoding of a non-negative int column,
    built JVM-side: hex -> left-pad -> unhex."""
    return F.unhex(F.lpad(F.hex(col), 2 * width_bytes, "0"))


def _hex_byte(md5_col, pos: int):
    """Integer value of the md5 hex pair starting at 1-based ``pos``."""
    return F.conv(F.substring(md5_col, pos, 2), 16, 10).cast("int")


def image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-typed documents with payloads carrying REAL format headers:
    even doc_ids get a valid PNG signature + IHDR chunk, odd doc_ids a JPEG
    SOI + APP0 + SOF0 chain, each followed by the document text as opaque
    'pixel data'. Width/height are 64 + the first/second md5 byte of the
    text, embedded as genuine big-endian header fields — so a decoder must
    actually parse the bytes to recover them, and an SQL oracle can
    recompute them independently from md5. Construction is entirely
    JVM-side (concat of binary literals + unhex'd ints): one scan, zero
    shuffles, no Python."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    body = F.encode(F.col("text"), "UTF-8")
    mh = F.md5(body)
    w = (F.lit(64) + _hex_byte(mh, 1)).cast("int")
    h = (F.lit(64) + _hex_byte(mh, 3)).cast("int")
    png = F.concat(
        F.lit(_PNG_MAGIC),
        F.lit(b"\x00\x00\x00\x0dIHDR"),
        _be_bytes(w, 4),
        _be_bytes(h, 4),
        F.lit(b"\x08\x02\x00\x00\x00"),  # bit depth 8, truecolor, defaults
        F.lit(b"\x00\x00\x00\x00"),  # CRC placeholder (parsers don't verify)
        body,
    )
    jpeg = F.concat(
        F.lit(b"\xff\xd8"),  # SOI
        F.lit(b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
        F.lit(b"\xff\xc0\x00\x11\x08"),  # SOF0, length 17, precision 8
        _be_bytes(h, 2),
        _be_bytes(w, 2),
        F.lit(b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"),
        body,
    )
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("format"),
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg).alias("payload"),
        F.col("source").alias("uri"),
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


def decode_media(payload: bytes) -> tuple[int, int, list[float]]:
    """Default decoder: REAL header parse (PNG/JPEG/GIF via
    parse_image_header) with the deterministic stub as fallback for
    unrecognized formats. Dimensions come from the payload bytes; the
    4-dim feature vector uses power-of-two denominators so the doubles are
    exact and bit-identical across engines (oracle-checkable)."""
    dims = parse_image_header(payload)
    if dims is None:
        return decode_image_stub(payload)
    width, height = dims
    n = len(payload)
    features = [
        width / 256.0,
        height / 256.0,
        n / 1024.0,
        (width * height) / 65536.0,
    ]
    return width, height, features


def extract_media_features(media: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The UDF consumes (doc_id, payload, media_type) Arrow batches and yields
    MEDIA_FEATURES_SCHEMA batches. ``decoder`` is any
    ``bytes -> (width, height, features)`` callable — ``decode_media``
    (default: real header parse, stub fallback) or ``decode_image_real``
    when Pillow is installed; swapping it does not touch the plan."""
    decoder = decoder or decode_media

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


@register(
    "media_features",
    oracle="""
WITH img AS (
  SELECT d.doc_id, md5(d.text) AS mh,
         octet_length(encode(d.text)) AS text_len,
         CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
  FROM documents d WHERE d.doc_id % 3 = 0
), dims AS (
  -- width/height = 64 + first/second md5 byte, recomputed here straight
  -- from the hash; Spark instead embeds them as big-endian header fields
  -- and the decoder re-reads them from the payload bytes, so any parser
  -- offset/endianness bug breaks the match.
  SELECT doc_id, fmt,
         64 + (strpos('0123456789abcdef', substr(mh, 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(mh, 2, 1)) - 1) AS width,
         64 + (strpos('0123456789abcdef', substr(mh, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(mh, 4, 1)) - 1) AS height,
         text_len + CASE WHEN fmt = 'png' THEN 33 ELSE 39 END AS byte_len
  FROM img
)
SELECT doc_id, fmt AS media_type,
       CAST(byte_len AS BIGINT) AS byte_len,
       CAST(width  AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       width / 256.0            AS f0,
       height / 256.0           AS f1,
       byte_len / 1024.0        AS f2,
       (width * height) / 65536.0 AS f3
FROM dims
""",
    tags=["llm", "multimodal"],
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pass with a REAL decoder: image_table payloads
    carry genuine PNG IHDR / JPEG SOF0 headers, and decode_media
    (parse_image_header) reads width/height out of the header bytes inside
    the Arrow mapInPandas stage. The oracle recomputes the expected
    dimensions independently (from the md5 the construction used), so the
    parse itself is what's being checked. Features use power-of-two
    denominators — exact doubles, bit-identical across engines.

    The input is spread to the session's parallelism first: a single-file
    scan would otherwise funnel every Arrow batch through one Python worker.

    Output is scalar-only: the 4-dim feature vector is projected to f0..f3
    DOUBLE columns because the driver's canonicalizer cannot sort array
    cells. The array-typed plumbing (extract_media_features /
    MEDIA_FEATURES_SCHEMA) is unchanged."""
    from callio_etl_spark.tables import spread

    imgs = image_table(spark, sf_dir).withColumnRenamed("format", "media_type")
    feats = extract_media_features(spread(imgs))
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
    decoder = decoder or decode_media
    bw, bh = box

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, nws, nhs, scales = [], [], [], [], []
            for payload in pdf["payload"]:
                w, h, _ = decoder(bytes(payload))
                # raw IEEE double (no rounding): min/div/mul are exactly
                # rounded ops, so any engine reproduces the same bits
                s = min(bw / float(w), bh / float(h), 1.0)
                ws.append(w)
                hs.append(h)
                nws.append(max(1, int(w * s)))
                nhs.append(max(1, int(h * s)))
                scales.append(s)
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


@register(
    "media_resize",
    oracle="""
WITH img AS (
  SELECT d.doc_id, md5(d.text) AS mh,
         octet_length(encode(d.text)) AS text_len
  FROM documents d WHERE d.doc_id % 3 = 0
), dims AS (
  SELECT doc_id,
         64 + (strpos('0123456789abcdef', substr(mh, 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(mh, 2, 1)) - 1) AS w,
         64 + (strpos('0123456789abcdef', substr(mh, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(mh, 4, 1)) - 1) AS h
  FROM img
), fit AS (
  SELECT doc_id, w, h, LEAST(32.0 / w, 32.0 / h, 1.0) AS s FROM dims
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       GREATEST(1, CAST(floor(w * s) AS BIGINT)) AS new_width,
       GREATEST(1, CAST(floor(h * s) AS BIGINT)) AS new_height,
       s AS scale
FROM fit
""",
    tags=["llm", "multimodal"],
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over image payloads with the real
    header decoder (see media_features): dimensions parsed from PNG/JPEG
    header bytes inside mapInPandas, fit-in-box math in raw IEEE doubles so
    the SQL oracle reproduces scale bit-for-bit (division, min, multiply,
    floor are all exactly-rounded ops in both engines)."""
    from callio_etl_spark.tables import spread

    return resize_media(spread(image_table(spark, sf_dir)))


# ---------------------------------------------------------------- audio

#: Canonical 44-byte PCM WAV header: RIFF(12) + fmt chunk(8+16) + data
#: chunk header(8).
WAV_HEADER_LEN = 44


def parse_audio_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Vendored pure-Python WAV/RIFF header parser — the audio twin of
    ``parse_image_header``. Walks the RIFF chunk chain (skipping LIST/fact/
    any non-fmt chunk, honoring the spec's even-byte padding) and returns
    (channels, sample_rate, bits_per_sample, data_len) from the ``fmt `` and
    ``data`` chunks, or None for non-WAV payloads. Only chunk headers are
    read — O(#chunks), never the samples."""
    n = len(payload)
    if n < WAV_HEADER_LEN or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    channels = rate = bits = data_len = None
    i = 12
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt " and body + 16 <= n:
            channels = int.from_bytes(payload[body + 2 : body + 4], "little")
            rate = int.from_bytes(payload[body + 4 : body + 8], "little")
            bits = int.from_bytes(payload[body + 14 : body + 16], "little")
        elif cid == b"data":
            # declared size, clamped to the bytes actually present
            data_len = min(size, n - body)
            break
        i = body + size + (size & 1)  # chunks are word-aligned
    if channels and rate and bits and data_len is not None:
        return channels, rate, bits, data_len
    return None


def _le_bytes(col, width_bytes: int):
    """Little-endian fixed-width binary encoding of a non-negative int
    column, built JVM-side: per-byte hex pairs concatenated in reverse."""
    col = col.cast("long")
    pairs = [
        F.lpad(F.hex(F.shiftright(col, 8 * i).bitwiseAND(F.lit(0xFF))), 2, "0")
        for i in range(width_bytes)
    ]
    return F.unhex(F.concat(*pairs))


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-typed documents with payloads carrying REAL 44-byte PCM WAV
    headers: channels = 1 + (first md5 byte of the text & 1), sample_rate =
    8000 + 128 * second md5 byte, 16-bit samples, followed by the text bytes
    as the data chunk. All fields are genuine little-endian RIFF values
    built JVM-side, so a decoder must parse the chunk chain to recover them
    and the SQL oracle can recompute them from md5 independently."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 1)
    body = F.encode(F.col("text"), "UTF-8")
    mh = F.md5(body)
    channels = (_hex_byte(mh, 1) % 2 + 1).cast("int")
    rate = (F.lit(8000) + _hex_byte(mh, 3) * 128).cast("int")
    bits = F.lit(16)
    data_len = F.octet_length(body)
    block_align = (channels * bits / 8).cast("int")
    byte_rate = (rate * block_align).cast("int")
    payload = F.concat(
        F.lit(b"RIFF"),
        _le_bytes(data_len + (WAV_HEADER_LEN - 8), 4),
        F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 4),  # fmt chunk size
        _le_bytes(F.lit(1), 2),  # PCM
        _le_bytes(channels, 2),
        _le_bytes(rate, 4),
        _le_bytes(byte_rate, 4),
        _le_bytes(block_align, 2),
        _le_bytes(bits, 2),
        F.lit(b"data"),
        _le_bytes(data_len, 4),
        body,
    )
    return d.select(
        "doc_id", payload.alias("payload"), F.col("source").alias("uri")
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits", LongType()),
        StructField("data_len", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", DoubleType()),
    ]
)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Arrow-batched WAV metadata extraction over mapInPandas — same plumbing
    shape as extract_media_features; unparseable payloads are dropped (a real
    pipeline routes them to a quarantine sink)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_audio_header(bytes(payload))
                if parsed is None:
                    continue
                ch, rate, bits, dlen = parsed
                frames = dlen // (ch * bits // 8)
                rows["doc_id"].append(doc_id)
                rows["channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["bits"].append(bits)
                rows["data_len"].append(dlen)
                rows["n_frames"].append(frames)
                # frames/rate then *1000: both ops exactly-rounded IEEE, so
                # any engine evaluating this order reproduces the bits
                rows["duration_ms"].append(frames / rate * 1000.0)
            yield pd.DataFrame(rows)

    return audio.select("doc_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


@register(
    "audio_features",
    oracle="""
WITH aud AS (
  SELECT d.doc_id, md5(d.text) AS mh,
         octet_length(encode(d.text)) AS data_len
  FROM documents d WHERE d.doc_id % 3 = 1
), parsed AS (
  SELECT doc_id, data_len,
         ((strpos('0123456789abcdef', substr(mh, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(mh, 2, 1)) - 1)) % 2 + 1 AS channels,
         8000 + ((strpos('0123456789abcdef', substr(mh, 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(mh, 4, 1)) - 1)) * 128 AS sample_rate
  FROM aud
)
SELECT doc_id,
       CAST(channels AS BIGINT) AS channels,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(16 AS BIGINT) AS bits,
       CAST(data_len AS BIGINT) AS data_len,
       CAST(data_len // (channels * 2) AS BIGINT) AS n_frames,
       (data_len // (channels * 2)) / sample_rate * 1000.0 AS duration_ms
FROM parsed
""",
    tags=["llm", "multimodal", "audio"],
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata pass with a REAL decoder: audio_table payloads carry
    genuine little-endian RIFF/WAV headers; parse_audio_header walks the
    chunk chain inside the Arrow mapInPandas stage to recover channel
    count, sample rate, bit depth, and data length; duration derives from
    parsed values only. The oracle recomputes every field independently
    from the md5 the construction used — chunk-walk or endianness bugs
    break the match. Registered beyond the 50-slot driver window this
    round; locally oracle-checked (tools/check_correctness.py) and slated
    for the r5 rotation."""
    from callio_etl_spark.tables import spread

    return extract_audio_features(spread(audio_table(spark, sf_dir)))
