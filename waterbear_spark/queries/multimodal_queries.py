"""Multimodal catalog queries: binary media columns exercised end-to-end
against the DuckDB oracle.

The payloads are deterministic fakes derived from document text
(``functions/multimodal.py attach_fake_media``: md5 -> 128 bytes), so
every byte is reproducible in SQL and the oracle can recompute the same
features — which is the point: the *plumbing* (binary columns, JVM-side
slicing, Arrow-batched decode, typed metadata structs) is what these
queries certify, while the real codec stays stubbed per the environment
contract (see ``decode_media``).

Scale posture: everything except ``fake_decode_features``'s explicit
mapInPandas stays in whole-stage codegen (binary substr/hex/conv), so
multimodal triage — filter by magic number, bucket by dimensions, sample
frames — never pays a Python hop at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.functions.multimodal import (
    attach_fake_media,
    fake_decode_features,
    sample_frames,
)
from waterbear_spark.queries.tables import table

_DOC_LIMIT = 500  # decode is per-row Python (Arrow-batched); bound the fan-in


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _DOC_LIMIT)
    )
    return attach_fake_media(docs)


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode (stub features: n_bytes, mean_byte, head_hex)
    rolled up per media kind. The mapInPandas stage is the genuine decode
    contract — same schema/batch shape a real codec UDF would use.
    """
    feats = fake_decode_features(_media(spark, sf_dir))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
            F.count_distinct("head_hex").alias("distinct_heads"),
        )
        .orderBy("kind")
    )


# mean_byte of md5(text) repeated 8x == floor(mean of the 16 md5 bytes);
# the oracle expands the same 16 hex pairs arithmetically.
_MD5_BYTE_SUM = " + ".join(
    f"CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS INTEGER)" for i in range(16)
)

_DECODE_STATS_SQL = f"""
WITH feats AS (
    SELECT 'image' AS kind,
           128 AS n_bytes,
           CAST(FLOOR(({_MD5_BYTE_SUM}) / 16.0) AS INTEGER) AS mean_byte,
           substr(md5(text), 1, 8) AS head_hex
    FROM documents WHERE doc_id < {_DOC_LIMIT}
)
SELECT kind,
       COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       ROUND(AVG(mean_byte), 4) AS avg_mean_byte,
       CAST(COUNT(DISTINCT head_hex) AS BIGINT) AS distinct_heads
FROM feats
GROUP BY kind
ORDER BY kind
"""


_FRAME_BYTES = 32
_EVERY_K = 2


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over fixed-frame "video" payloads — JVM-side binary
    slicing (substr before any Python), one row per sampled frame with a
    frame fingerprint. 128-byte payloads at 32 bytes/frame sample frames
    0 and 2.
    """
    frames = sample_frames(
        _media(spark, sf_dir), frame_bytes=_FRAME_BYTES, every_k=_EVERY_K
    )
    return frames.select(
        "media_id",
        "frame_no",
        F.lower(F.hex(F.substring("frame", 1, 4))).alias("frame_head"),
    ).orderBy("media_id", "frame_no")


_FRAME_SQL = f"""
WITH media AS (
    SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
           repeat(md5(text), 8) AS payload_hex
    FROM documents WHERE doc_id < {_DOC_LIMIT}
),
frames AS (
    SELECT media_id, 0 AS frame_no,
           substr(payload_hex, 1, 8) AS frame_head
    FROM media
    UNION ALL
    SELECT media_id, 2 AS frame_no,
           substr(payload_hex, {2 * _FRAME_BYTES * 2} + 1, 8) AS frame_head
    FROM media
)
SELECT media_id, frame_no, frame_head
FROM frames
ORDER BY media_id, frame_no
"""


def multimodal_header_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codegen-only header parsing: build PNG payloads (real IHDR layout,
    big-endian dims derived from doc_id), mix in non-PNG payloads, and
    triage by magic number + parsed dimensions — the cheap pre-decode
    filter pattern. Zero Python anywhere in this plan.
    """
    from waterbear_spark.functions.multimodal import png_dimensions

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _DOC_LIMIT)
    )
    w = (F.col("doc_id") % 64 + 1).cast("int")
    h = (F.col("doc_id") % 48 + 1).cast("int")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),          # signature
        F.unhex(F.lit("0000000D49484452")),          # IHDR len + tag
        F.unhex(F.lpad(F.hex(w), 8, "0")),           # width  (BE u32)
        F.unhex(F.lpad(F.hex(h), 8, "0")),           # height (BE u32)
    )
    raw = F.unhex(F.md5("text"))                     # non-PNG payload
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, png).otherwise(raw).alias("data"),
    )
    parsed = png_dimensions(media)
    return (
        parsed.groupBy(F.col("png_width").isNotNull().alias("is_png"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("png_width").alias("sum_width"),
            F.sum("png_height").alias("sum_height"),
        )
        .orderBy("is_png")
    )


_HEADER_SQL = f"""
WITH media AS (
    SELECT doc_id,
           doc_id % 3 = 0 AS is_png,
           CASE WHEN doc_id % 3 = 0 THEN doc_id % 64 + 1 END AS w,
           CASE WHEN doc_id % 3 = 0 THEN doc_id % 48 + 1 END AS h
    FROM documents WHERE doc_id < {_DOC_LIMIT}
)
SELECT is_png,
       COUNT(*) AS n_media,
       CAST(SUM(w) AS BIGINT) AS sum_width,
       CAST(SUM(h) AS BIGINT) AS sum_height
FROM media
GROUP BY is_png
ORDER BY is_png
"""


def multimodal_gif_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little-endian roundtrip proof for the third header parser: build
    GIF payloads (GIF87a/GIF89a Logical Screen Descriptor, LE u16 dims
    derived from doc_id), mix in junk payloads, parse the dims back with
    ``gif_dimensions``, and aggregate. The oracle never touches bytes —
    it computes the same census from doc_id arithmetic — so the Spark
    side only matches if construction AND parsing are both exactly
    right (any endianness slip breaks the sums). Zero Python.
    """
    from waterbear_spark.functions.multimodal import gif_dimensions

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _DOC_LIMIT)
    )
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")

    def le16(col):
        lo = F.lpad(F.hex(col % 256), 2, "0")
        hi = F.lpad(F.hex((col / 256).cast("int")), 2, "0")
        return F.unhex(F.concat(lo, hi))

    sig = F.when(F.col("doc_id") % 2 == 0, F.lit("GIF89a")).otherwise(
        F.lit("GIF87a")
    )
    gif = F.concat(sig.cast("binary"), le16(w), le16(h))
    junk = F.unhex(F.md5("text"))
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, junk).otherwise(gif).alias("data"),
    )
    parsed = gif_dimensions(media)
    return (
        parsed.groupBy(F.col("gif_width").isNotNull().alias("is_gif"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("gif_width").alias("sum_width"),
            F.sum("gif_height").alias("sum_height"),
            F.max("gif_width").alias("max_width"),
        )
        .orderBy("is_gif")
    )


_GIF_SQL = f"""
WITH media AS (
    SELECT doc_id,
           doc_id % 4 <> 0 AS is_gif,
           CASE WHEN doc_id % 4 <> 0 THEN doc_id % 640 + 1 END AS w,
           CASE WHEN doc_id % 4 <> 0 THEN doc_id % 480 + 1 END AS h
    FROM documents WHERE doc_id < {_DOC_LIMIT}
)
SELECT is_gif,
       COUNT(*) AS n_media,
       CAST(SUM(w) AS BIGINT) AS sum_width,
       CAST(SUM(h) AS BIGINT) AS sum_height,
       CAST(MAX(w) AS INTEGER) AS max_width
FROM media
GROUP BY is_gif
ORDER BY is_gif
"""


def multimodal_jpeg_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-offset parsing proof for the JPEG marker walk: build
    JPEG payloads whose SOF0 sits at a doc-dependent offset (APP0 and
    COM segments with doc_id-derived padding lengths precede it), mix in
    junk rows, and parse the dims back with ``jpeg_dimensions``. The
    oracle computes the census from doc_id arithmetic alone, so the
    Spark side matches only if the walk correctly hops BOTH
    variable-length segments on every row — a fixed-offset "parser"
    fails immediately. Zero Python.
    """
    from waterbear_spark.functions.multimodal import jpeg_dimensions

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _DOC_LIMIT)
    )
    w = (F.col("doc_id") % 320 + 1).cast("int")
    h = (F.col("doc_id") % 240 + 1).cast("int")
    pad0 = (F.col("doc_id") % 13).cast("int")  # APP0 payload bytes
    pad1 = (F.col("doc_id") % 7).cast("int")   # COM payload bytes

    def be16(col):
        return F.unhex(F.lpad(F.hex(col.cast("int")), 4, "0"))

    def seg(marker_hex, pad):
        return F.concat(
            F.unhex(F.lit(marker_hex)),
            be16(pad + 2),
            F.unhex(F.repeat(F.lit("00"), pad)),
        )

    sof0 = F.concat(
        F.unhex(F.lit("FFC0")),
        be16(F.lit(17)),          # frame header length
        F.unhex(F.lit("08")),     # precision
        be16(h),
        be16(w),
    )
    jpeg = F.concat(
        F.unhex(F.lit("FFD8")), seg("FFE0", pad0), seg("FFFE", pad1), sof0
    )
    junk = F.unhex(F.md5("text"))
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, junk).otherwise(jpeg).alias("data"),
    )
    parsed = jpeg_dimensions(media)
    return (
        parsed.groupBy(F.col("jpeg_width").isNotNull().alias("is_jpeg"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("jpeg_width").alias("sum_width"),
            F.sum("jpeg_height").alias("sum_height"),
            F.max("jpeg_height").alias("max_height"),
        )
        .orderBy("is_jpeg")
    )


_JPEG_SQL = f"""
WITH media AS (
    SELECT doc_id,
           doc_id % 5 <> 0 AS is_jpeg,
           CASE WHEN doc_id % 5 <> 0 THEN doc_id % 320 + 1 END AS w,
           CASE WHEN doc_id % 5 <> 0 THEN doc_id % 240 + 1 END AS h
    FROM documents WHERE doc_id < {_DOC_LIMIT}
)
SELECT is_jpeg,
       COUNT(*) AS n_media,
       CAST(SUM(w) AS BIGINT) AS sum_width,
       CAST(SUM(h) AS BIGINT) AS sum_height,
       CAST(MAX(h) AS INTEGER) AS max_height
FROM media
GROUP BY is_jpeg
ORDER BY is_jpeg
"""


def multimodal_mp4_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-offset parsing proof for the ISO-BMFF box walk: build
    REAL-layout MP4 payloads — ftyp + variable-size free + moov
    CONTAINING an mvhd FullBox child (v0 for even doc_ids, v1 with u64
    timestamps for odd; every fifth doc also gets a 'free' child BEFORE
    mvhd, so the mvhd offset inside moov varies too) + mdat. The outer
    free box's doc-dependent padding shifts every later box, so only a
    real walk recovers the duration and mdat size — mix in junk rows,
    and parse with ``mp4_box_walk``. The oracle recomputes the census
    from doc_id arithmetic alone. Zero Python.
    """
    from waterbear_spark.functions.multimodal import mp4_box_walk

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _DOC_LIMIT)
    )
    dur = (F.col("doc_id") % 3600 + 1).cast("int")
    mdat_n = (F.col("doc_id") % 25).cast("int")
    pad = (F.col("doc_id") % 19).cast("int")
    brand = F.when(F.col("doc_id") % 2 == 0, "isom").otherwise("mp42")

    def be32(col):
        return F.unhex(F.lpad(F.hex(col.cast("int")), 8, "0"))

    def zeros(n):
        return F.unhex(F.repeat(F.lit("00"), F.lit(n)))

    ftyp = F.concat(
        be32(F.lit(16)),
        F.unhex(F.lit("66747970")),  # 'ftyp'
        F.encode(brand, "UTF-8"),
        be32(F.lit(0)),
    )
    free = F.concat(
        be32(pad + 8),
        F.unhex(F.lit("66726565")),  # 'free'
        F.unhex(F.repeat(F.lit("00"), pad)),
    )
    # mvhd v0 (108 bytes): header, ver/flags=0, creation, modification,
    # timescale, u32 duration, then 80 bytes (rate/volume/reserved/
    # matrix/predefined/next_track_id — zeros suffice for the walk)
    mvhd_v0 = F.concat(
        be32(F.lit(108)),
        F.unhex(F.lit("6D766864")),  # 'mvhd'
        be32(F.lit(0)),              # version 0 + flags
        be32(F.lit(3600)),           # creation_time
        be32(F.lit(3601)),           # modification_time
        be32(F.lit(1000)),           # timescale
        be32(dur),                   # duration (u32)
        zeros(80),
    )
    # mvhd v1 (120 bytes): u64 creation/modification, u32 timescale,
    # u64 duration (low word carries the value)
    mvhd_v1 = F.concat(
        be32(F.lit(120)),
        F.unhex(F.lit("6D766864")),
        F.unhex(F.lit("01000000")),  # version 1 + flags
        zeros(8),                    # creation_time (u64)
        zeros(8),                    # modification_time (u64)
        be32(F.lit(1000)),           # timescale
        zeros(4),                    # duration high word
        be32(dur),                   # duration low word
        zeros(80),
    )
    mvhd = F.when(F.col("doc_id") % 2 == 0, mvhd_v0).otherwise(mvhd_v1)
    mvhd_size = F.when(F.col("doc_id") % 2 == 0, F.lit(108)).otherwise(
        F.lit(120)
    )
    # every fifth doc: a 12-byte free child ahead of mvhd, so mvhd is
    # NOT moov's first child and a fixed-offset parse would misread it
    inner_free = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(be32(F.lit(12)), F.unhex(F.lit("66726565")), zeros(4)),
    ).otherwise(F.lit(b""))
    inner_free_size = F.when(F.col("doc_id") % 5 == 0, F.lit(12)).otherwise(
        F.lit(0)
    )
    moov = F.concat(
        be32(mvhd_size + inner_free_size + 8),
        F.unhex(F.lit("6D6F6F76")),  # 'moov'
        inner_free,
        mvhd,
    )
    mdat = F.concat(
        be32(mdat_n + 8),
        F.unhex(F.lit("6D646174")),  # 'mdat'
        F.substr(F.unhex(F.repeat(F.md5("text"), 2)), F.lit(1), mdat_n),
    )
    junk = F.unhex(F.md5("text"))
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, junk)
        .otherwise(F.concat(ftyp, free, moov, mdat))
        .alias("data"),
    )
    parsed = mp4_box_walk(media)
    return (
        parsed.groupBy(F.col("mp4_brand").isNotNull().alias("is_mp4"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("mp4_duration").alias("sum_duration"),
            F.sum("mp4_mdat_bytes").alias("sum_mdat_bytes"),
            F.count_distinct("mp4_brand").alias("n_brands"),
            F.max("mp4_n_boxes").alias("max_boxes"),
        )
        .orderBy("is_mp4")
    )


_MP4_SQL = f"""
WITH media AS (
    SELECT doc_id,
           doc_id % 7 <> 0 AS is_mp4,
           CASE WHEN doc_id % 7 <> 0 THEN doc_id % 3600 + 1 END AS dur,
           CASE WHEN doc_id % 7 <> 0 THEN doc_id % 25 END AS mdat_n,
           CASE WHEN doc_id % 7 <> 0 THEN
                CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END
           END AS brand
    FROM documents WHERE doc_id < {_DOC_LIMIT}
)
SELECT is_mp4,
       COUNT(*) AS n_media,
       CAST(SUM(dur) AS BIGINT) AS sum_duration,
       CAST(SUM(mdat_n) AS BIGINT) AS sum_mdat_bytes,
       CAST(COUNT(DISTINCT brand) AS BIGINT) AS n_brands,
       CASE WHEN is_mp4 THEN 4 END AS max_boxes
FROM media
GROUP BY is_mp4
ORDER BY is_mp4
"""


QUERIES = {
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_jpeg_dims": multimodal_jpeg_dims,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_header_triage": multimodal_header_triage,
    "multimodal_gif_dims": multimodal_gif_dims,
    "multimodal_mp4_walk": multimodal_mp4_walk,
}
ORACLES = {
    "multimodal_decode_stats": _DECODE_STATS_SQL,
    "multimodal_jpeg_dims": _JPEG_SQL,
    "multimodal_frame_sample": _FRAME_SQL,
    "multimodal_header_triage": _HEADER_SQL,
    "multimodal_gif_dims": _GIF_SQL,
    "multimodal_mp4_walk": _MP4_SQL,
}
