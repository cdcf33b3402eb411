"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED
(clearly marked below): ``decode_media`` raises ``NotImplementedError``
unless a codec library is importable, and ``fake_decode_features`` is a
deterministic byte-level stand-in. Everything around the stub — the
typed schema, the mapInPandas batch shape, binary slicing for frame
sampling, partition behavior — is real Spark plumbing and is tested.

Scale notes: binary payloads ride in Arrow record batches; mapInPandas
streams an iterator of batches per partition (bounded memory regardless
of partition size); frame sampling slices binary **before** any Python
step so the JVM drops unneeded bytes first; `read_binary_files` uses the
binaryFile source with pathGlobFilter + partition pruning on directories.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("kind", StringType()),        # image | audio | video
        StructField("format", StringType()),      # png, wav, raw, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("data", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", IntegerType()),
        StructField("head_hex", StringType()),
    ]
)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content).

    Directory layout `<root>/kind=image/...` gives free partition pruning
    on the kind column at 100 TB.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode path — requires a codec library.

    STUB: the execution container ships no image/audio codecs (no PIL,
    no libav); this raises until one is available. The Spark-side
    contract (input MEDIA_SCHEMA, output FEATURE_SCHEMA via mapInPandas)
    is identical to ``fake_decode_features`` below, which is what tests
    exercise.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "no codec library in this environment - use fake_decode_features "
            "for the deterministic stand-in"
        ) from err
    return fake_decode_features(df)  # pragma: no cover - codec not present


def fake_decode_features(df: DataFrame) -> DataFrame:
    """Deterministic FAKE decode: byte-level features standing in for real
    pixel/sample decoding. The mapInPandas batch shape, schema, and
    distribution behavior are exactly what the real decoder would use.
    """

    def batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            data = pdf["data"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["meta"].map(
                        lambda m: m["kind"] if m is not None else None
                    ),
                    "n_bytes": data.map(lambda b: 0 if b is None else len(b)),
                    "mean_byte": data.map(
                        lambda b: 0 if not b else int(sum(b) / len(b))
                    ),
                    "head_hex": data.map(
                        lambda b: bytes(b[:4]).hex() if b else ""
                    ),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int, every_k: int, max_frames: int = 8
) -> DataFrame:
    """Frame sampling for fixed-frame-size "video" payloads: keep every
    k-th frame, entirely JVM-side (binary substr before any Python step),
    exploded to one row per sampled frame.
    """
    slices = F.array(
        *[
            F.struct(
                F.lit(i).alias("frame_no"),
                F.substring("data", i * frame_bytes + 1, frame_bytes).alias("frame"),
            )
            for i in range(0, max_frames, every_k)
        ]
    )
    return (
        df.withColumn("n_frames_avail", (F.length("data") / frame_bytes).cast("int"))
        .select(
            "media_id",
            "n_frames_avail",
            F.explode(slices).alias("f"),
        )
        .filter(F.col("f.frame_no") < F.col("n_frames_avail"))
        .select(
            "media_id",
            F.col("f.frame_no").alias("frame_no"),
            F.col("f.frame").alias("frame"),
        )
    )


_PNG_SIG_HEX = "89504E470D0A1A0A"


def png_dimensions(df: DataFrame, data_col: str = "data") -> DataFrame:
    """REAL (not stubbed) metadata extraction: PNG width/height parsed
    from the IHDR chunk — entirely JVM-side (`substring` on binary +
    `hex` + `conv`), no codec library and no Python worker. Non-PNG
    payloads get NULL dimensions via the signature check.

    This is the pattern for cheap multimodal triage at 100 TB: header
    fields (dimensions, magic numbers, frame counts) come out of the
    first bytes in whole-stage codegen, so filtering/bucketing by media
    shape never pays a decode or a Python hop; the expensive decoder
    only ever sees rows that survive.
    """
    sig_ok = F.hex(F.substring(F.col(data_col), 1, 8)) == F.lit(_PNG_SIG_HEX)
    width = F.conv(F.hex(F.substring(F.col(data_col), 17, 4)), 16, 10).cast("int")
    height = F.conv(F.hex(F.substring(F.col(data_col), 21, 4)), 16, 10).cast("int")
    return df.withColumn("png_width", F.when(sig_ok, width)).withColumn(
        "png_height", F.when(sig_ok, height)
    )


def _le_uint(data_col: str, start: int, n_bytes: int) -> "F.Column":
    """Little-endian unsigned int from `n_bytes` bytes at 1-based `start`
    — per-byte hex→int with positional weights, all in codegen."""
    total = F.lit(0)
    for i in range(n_bytes):
        byte = F.conv(
            F.hex(F.substring(F.col(data_col), start + i, 1)), 16, 10
        ).cast("long")
        total = total + byte * F.lit(256**i)
    return total


def wav_metadata(df: DataFrame, data_col: str = "data") -> DataFrame:
    """REAL (not stubbed) audio metadata: channel count and sample rate
    parsed from the RIFF/WAVE fmt chunk — the little-endian counterpart
    to ``png_dimensions`` (PNG's IHDR is big-endian), again zero Python.
    Non-WAV payloads get NULLs via the double signature check
    (bytes 1-4 ``RIFF``, 9-12 ``WAVE``).
    """
    sig_ok = (
        F.substring(F.col(data_col), 1, 4).cast("string") == "RIFF"
    ) & (F.substring(F.col(data_col), 9, 4).cast("string") == "WAVE")
    channels = _le_uint(data_col, 23, 2).cast("int")
    sample_rate = _le_uint(data_col, 25, 4).cast("int")
    return df.withColumn("wav_channels", F.when(sig_ok, channels)).withColumn(
        "wav_sample_rate", F.when(sig_ok, sample_rate)
    )


def gif_dimensions(df: DataFrame, data_col: str = "data") -> DataFrame:
    """REAL (not stubbed) metadata extraction #3: GIF width/height from
    the Logical Screen Descriptor (little-endian u16 pair right after
    the 6-byte signature) — joins ``png_dimensions`` (big-endian) and
    ``wav_metadata`` (RIFF) as the third zero-Python header parser.
    Accepts both GIF87a and GIF89a; anything else gets NULLs.
    """
    sig6 = F.substring(F.col(data_col), 1, 6).cast("string")
    sig_ok = sig6.isin("GIF87a", "GIF89a")
    width = _le_uint(data_col, 7, 2).cast("int")
    height = _le_uint(data_col, 9, 2).cast("int")
    return df.withColumn("gif_width", F.when(sig_ok, width)).withColumn(
        "gif_height", F.when(sig_ok, height)
    )


_JPEG_MAX_SEGMENTS = 8


def jpeg_dimensions(df: DataFrame, data_col: str = "data") -> DataFrame:
    """REAL metadata extraction #4, and the first VARIABLE-OFFSET one:
    JPEG width/height from the SOF0 frame header. Unlike PNG/GIF/WAV,
    JPEG dims live at no fixed byte position — the parser must walk the
    segment chain (marker FFxx, big-endian u16 length, payload) from SOI
    until it hits FFC0. The walk is a bounded fold (``F.aggregate`` over
    ``_JPEG_MAX_SEGMENTS`` steps) carrying (offset, h, w) in a struct:
    each step reads the marker at the current offset, captures dims on
    SOF0, freezes on anything malformed, and otherwise hops
    ``2 + length`` forward. Entirely JVM-side; no codec, no Python.

    Scale: per-row bounded work (<= 8 marker reads of <= 4 bytes each on
    a binary column) — map-only, no shuffle, and the fold never touches
    payload bytes, so cost is independent of media size.
    """

    def be16(pos):
        return F.conv(F.hex(F.substr(F.col(data_col), pos, F.lit(2))), 16, 10)

    sig_ok = F.hex(F.substring(F.col(data_col), 1, 2)) == F.lit("FFD8")

    def step(acc, _):
        marker = F.hex(F.substr(F.col(data_col), acc.off, F.lit(2)))
        is_marker = marker.startswith("FF")
        is_sof0 = marker == F.lit("FFC0")
        seg_len = be16(acc.off + 2).cast("int")
        done = acc.h.isNotNull() | ~is_marker
        return F.struct(
            F.when(done | is_sof0, acc.off)
            .otherwise(acc.off + 2 + seg_len)
            .alias("off"),
            F.when(acc.h.isNotNull(), acc.h)
            .when(is_sof0, be16(acc.off + 5).cast("int"))
            .alias("h"),
            F.when(acc.w.isNotNull(), acc.w)
            .when(is_sof0, be16(acc.off + 7).cast("int"))
            .alias("w"),
        )

    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(_JPEG_MAX_SEGMENTS)),
        F.struct(
            F.lit(3).alias("off"),
            F.lit(None).cast("int").alias("h"),
            F.lit(None).cast("int").alias("w"),
        ),
        step,
    )
    return df.withColumn("_jw", F.when(sig_ok, walked)).select(
        "*",
        F.col("_jw.w").alias("jpeg_width"),
        F.col("_jw.h").alias("jpeg_height"),
    ).drop("_jw")


def attach_fake_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test helper: derive a deterministic binary payload from document
    text (md5 -> bytes, repeated), shaped into MEDIA_SCHEMA."""
    data = F.unhex(F.repeat(F.md5("text"), 8))  # 128 deterministic bytes
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        data.alias("data"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit("raw").alias("format"),
            F.lit(8).alias("width"),
            F.lit(4).alias("height"),
            F.lit(4).alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


_MP4_MAX_BOXES = 6
_FTYP_HEX = "66747970"  # 'ftyp'
_MOOV_HEX = "6D6F6F76"  # 'moov'
_MDAT_HEX = "6D646174"  # 'mdat'
_MVHD_HEX = "6D766864"  # 'mvhd'
_MVHD_MAX_HITS = 4  # false-positive 'mvhd' spellings tolerated in the scan
# how far into the moov payload the mvhd child is searched for: mvhd is
# conventionally moov's first child, but ISO-BMFF does not require it,
# so a bounded scan (not a fixed offset) locates it
_MVHD_SCAN_BYTES = 256


def mp4_box_walk(df: DataFrame, data_col: str = "data") -> DataFrame:
    """REAL metadata extraction #5: ISO-BMFF (MP4) top-level box walk.
    MP4 files are a sequence of boxes — big-endian u32 size, 4-char type,
    payload — so, like the JPEG marker chain, nothing sits at a fixed
    offset past the first box. The walk is a bounded fold over
    ``_MP4_MAX_BOXES`` steps carrying (offset, brand, duration,
    mdat_bytes, n_boxes): each step reads the box header at the current
    offset, captures the ftyp major brand, the movie duration, and the
    mdat payload size, then hops ``size`` forward; it freezes on a
    malformed header (size < 8 or overrunning the buffer). A payload
    whose first box is not ``ftyp`` is not an MP4: all fields null.

    The duration lives in the ``mvhd`` FullBox NESTED inside ``moov``
    (moov is a pure container): the walk scans the first
    ``_MVHD_SCAN_BYTES`` of the moov payload for the mvhd header
    (byte-aligned hex search), then branches on the mvhd version —
    v0: u32 duration at mvhd offset +24 (after 8-byte header,
    version/flags, creation, modification, timescale); v1: u64 at +32
    (the timestamps widen to u64). An unlocatable or misaligned mvhd
    yields NULL duration, never a garbage read. Entirely JVM-side
    binary slicing — no codec, no Python.

    Scale: <= 6 header reads of <= 4 bytes per row plus one bounded
    256-byte scan, map-only; payload bytes (mdat can be gigabytes in
    real files) are never touched, so triage cost is independent of
    media size — the property that makes header-level routing viable
    at 100 TB.
    """

    def be32(pos):
        return F.conv(F.hex(F.substr(F.col(data_col), pos, F.lit(4))), 16, 10)

    def be64(pos):
        return F.conv(F.hex(F.substr(F.col(data_col), pos, F.lit(8))), 16, 10)

    first_type = F.hex(F.substring(F.col(data_col), 5, 4))
    sig_ok = first_type == F.lit(_FTYP_HEX)

    def mvhd_duration(moov_off):
        """Scan the moov payload for the mvhd child; parse per version.

        A content byte-pair can spell 'mvhd' before the real header
        (byte-misaligned, or aligned inside another child's payload),
        so the walk tries up to ``_MVHD_MAX_HITS`` successive hex hits
        and takes the first that is byte-aligned AND whose preceding
        4-byte size field reads as a sane in-bounds box size — a false
        positive earlier in the payload no longer masks a valid mvhd
        after it."""
        window = F.hex(
            F.substr(F.col(data_col), moov_off + 8, F.lit(_MVHD_SCAN_BYTES))
        )

        def parse_at(hit):
            # a hit at an even hex position straddles a byte boundary —
            # not a real type field; (hit-1)/2 is the byte offset of
            # 'mvhd' in the payload, the box header starts 4 bytes back
            aligned = (hit > 0) & (hit % 2 == 1)
            byte_off = ((hit - 1) / 2).cast("long")  # exact: hit is odd
            s = moov_off + 8 + byte_off - 4  # mvhd box start (1-based)
            size = be32(s).cast("long")
            plausible = (
                (byte_off >= 4)  # size field stays inside the payload
                & (size >= 8)
                & (s + size <= F.length(data_col).cast("long") + 1)
            )
            version = F.conv(
                F.hex(F.substr(F.col(data_col), s + 8, F.lit(1))), 16, 10
            )
            dur = F.when(version == 1, be64(s + 32)).otherwise(be32(s + 24))
            return F.when(aligned & plausible, dur.cast("long"))

        hit = F.instr(window, F.lit(_MVHD_HEX))  # 1-based in hex chars
        attempts = []
        for _ in range(_MVHD_MAX_HITS):
            attempts.append(parse_at(hit))
            hit = F.when(
                hit > 0,
                F.call_function(
                    "locate", F.lit(_MVHD_HEX), window, hit + 1
                ),
            ).otherwise(F.lit(0))
        return F.coalesce(*attempts)

    def step(acc, _):
        live = acc.off.isNotNull()
        size = be32(acc.off).cast("long")
        type_hex = F.hex(F.substr(F.col(data_col), acc.off + 4, F.lit(4)))
        fits = (
            live
            & (size >= 8)
            & (acc.off + size <= F.length(data_col).cast("long") + 1)
        )
        return F.struct(
            F.when(fits, acc.off + size).alias("off"),
            F.when(acc.brand.isNotNull(), acc.brand)
            .when(
                fits & (type_hex == _FTYP_HEX),
                F.decode(F.substr(F.col(data_col), acc.off + 8, F.lit(4)), "UTF-8"),
            )
            .alias("brand"),
            F.when(acc.dur.isNotNull(), acc.dur)
            .when(fits & (type_hex == _MOOV_HEX), mvhd_duration(acc.off))
            .alias("dur"),
            F.when(acc.mdat.isNotNull(), acc.mdat)
            .when(fits & (type_hex == _MDAT_HEX), (size - 8).cast("int"))
            .alias("mdat"),
            (acc.n + F.when(fits, 1).otherwise(0)).alias("n"),
        )

    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MP4_MAX_BOXES)),
        F.struct(
            F.lit(1).cast("long").alias("off"),
            F.lit(None).cast("string").alias("brand"),
            F.lit(None).cast("long").alias("dur"),
            F.lit(None).cast("int").alias("mdat"),
            F.lit(0).alias("n"),
        ),
        step,
    )
    return (
        df.withColumn("_mw", F.when(sig_ok, walked))
        .select(
            "*",
            F.col("_mw.brand").alias("mp4_brand"),
            F.col("_mw.dur").alias("mp4_duration"),
            F.col("_mw.mdat").alias("mp4_mdat_bytes"),
            F.col("_mw.n").alias("mp4_n_boxes"),
        )
        .drop("_mw")
    )
