"""Multimodal (image/audio/video) column plumbing.

Model: opaque ``binary`` payload column + typed metadata struct, processed
with Arrow-batched ``mapInPandas`` featurizers.  Container-HEADER decode is
REAL byte-level parsing (PNG IHDR / JPEG SOFn marker walk / WAV fmt chunk —
``parse_media_header``/``probe_media``; PNG even has a zero-UDF JVM
expression path, ``png_dims_expr``), verified end-to-end against real
container bytes built by ``synthesize_real_media``.  Only PIXEL/SAMPLE
decode is stubbed (no PIL/ffmpeg in this container) — that one kernel is a
deterministic fake; schemas, batch iteration and partitioning are the
production contract (tests/test_multimodal.py).

At 100 TB: payloads stay columnar in parquet; mapInPandas streams
Arrow batches so an executor never materializes a partition of blobs at
once; `spark.sql.files.maxPartitionBytes` (plus parquet row-group sizing at
write time) bounds per-task memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<float>"

_HAS_CODECS = False  # no PIL/ffmpeg in this container — stubbed decode
_FEATURE_DIM = 16


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8 bytes
    (stand-in blob), media_type round-robin, meta struct populated."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake decode: real codecs are unavailable (see module
    docstring).  Produces a length-_FEATURE_DIM float vector from byte
    statistics — stable across runs/partitions."""
    if not _HAS_CODECS:
        if payload is None:
            return [0.0] * _FEATURE_DIM
        return [float(payload[i % len(payload)]) / 255.0 for i in range(_FEATURE_DIM)]
    raise NotImplementedError("real image/audio decode requires codec libraries")


def extract_features(media: DataFrame) -> DataFrame:
    """Featurize payloads via mapInPandas (Arrow batch iterator).

    The UDF signature/batch shape is the production contract; swapping
    _decode_stub for a real decoder is a one-line change.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf.apply(
                        lambda r: _decode_stub(r["payload"], r["media_type"]), axis=1
                    ),
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: updates meta, passes payload through the same
    mapInPandas contract (decode+resize stubbed)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def frame_sample_stub(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: explodes n_frames into frame rows
    (payload decode stubbed — frame index is the real output)."""
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        "payload",
    )


# ---------------------------------------------------------------------------
# Real container-header parsing (pure byte-level, no codec libraries)
# ---------------------------------------------------------------------------
#
# The sandbox has no PIL/ffmpeg, but container HEADERS are just bytes:
# PNG IHDR, JPEG SOFn, and WAV fmt chunks fully determine width/height/
# channels/sample-rate without any pixel/sample decode.  These parsers are
# the real production surface for "typed metadata from opaque blobs"; only
# pixel-level decode remains stubbed.

PROBE_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "channels int, sample_rate int, n_bytes long"
)


def parse_media_header(payload: bytes | None):
    """(format, width, height, channels, sample_rate) from container bytes;
    format=None when the payload matches no known magic."""
    if not payload:
        return (None, None, None, None, None)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        return ("png", w, h, channels, None)
    if b[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments to SOFn
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                break
            # 0xFF fill bytes may pad between segments (spec B.1.1.2):
            # skip them one at a time rather than reading a bogus length
            if b[i + 1] == 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker in (0xD9, 0xDA):
                break  # EOI / SOS: entropy-coded data follows, stop walking
            if i + 4 > len(b):
                break
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    break
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                channels = b[i + 9] if i + 9 < len(b) else None
                return ("jpeg", w, h, channels, None)
            i += 2 + seg_len
        return ("jpeg", None, None, None, None)
    if b[:4] == b"RIFF" and len(b) >= 12 and b[8:12] == b"WAVE":
        # Walk RIFF chunks to the 'fmt ' chunk — bext/LIST/JUNK chunks
        # commonly precede it in broadcast-WAV files; fixed offsets would
        # read garbage there.
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            csize = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 16 <= len(b):
                channels = int.from_bytes(b[i + 10 : i + 12], "little")
                rate = int.from_bytes(b[i + 12 : i + 16], "little")
                return ("wav", None, None, channels, rate)
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        return ("wav", None, None, None, None)
    return (None, None, None, None, None)


def probe_media(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """Typed header metadata from opaque payload bytes via Arrow-batched
    mapInPandas — format sniffing (magic bytes) + per-format header parse.
    Column-pruned input (id + payload only) so Arrow never ships unused
    metadata columns."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # single pass over the batch: parse + byte length together
            rows = [
                (*parse_media_header(p), 0 if p is None else len(p))
                for p in pdf[payload_col]
            ]
            fmt, w, h, ch, sr, nb = zip(*rows) if rows else ((),) * 6
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "format": fmt,
                    "width": w,
                    "height": h,
                    "channels": ch,
                    "sample_rate": sr,
                    "n_bytes": nb,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(parse, PROBE_SCHEMA)


def png_dims_expr(payload_col: str = "payload"):
    """PNG width/height as pure JVM expressions — fixed IHDR offsets mean
    no Python is needed at all for this format: big-endian uint32 from
    hex(substring(binary)).  The zero-UDF path for header extraction at
    scale; `probe_media` covers variable-offset formats (JPEG)."""
    is_png = F.hex(F.substring(F.col(payload_col), 1, 8)) == F.lit(
        "89504E470D0A1A0A"
    )
    width = F.conv(F.hex(F.substring(F.col(payload_col), 17, 4)), 16, 10).cast("int")
    height = F.conv(F.hex(F.substring(F.col(payload_col), 21, 4)), 16, 10).cast("int")
    return (
        F.when(is_png, width).alias("width"),
        F.when(is_png, height).alias("height"),
    )


def _build_png(width: int, height: int) -> bytes:
    """Minimal real PNG: signature + IHDR (8-bit RGB) + empty IDAT + IEND.
    CRCs are zeroed (parsers here don't verify them; a full encoder would)."""
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00" * 4
        + (0).to_bytes(4, "big") + b"IDAT" + b"\x00" * 4
        + (0).to_bytes(4, "big") + b"IEND" + b"\x00" * 4
    )


def _build_jpeg(width: int, height: int) -> bytes:
    """Minimal real JPEG: SOI + APP0/JFIF + SOF0 (3-component) + EOI."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _build_wav(sample_rate: int, channels: int, n_samples: int = 4) -> bytes:
    """Minimal real WAV: RIFF/WAVE + PCM fmt chunk + silent data chunk."""
    block_align = channels * 2
    data = b"\x00" * (n_samples * block_align)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def synthesize_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real container bytes, deterministically derived from the id:
    id%3=0 → PNG (16+id%241 × 16+id%181), 1 → JPEG (same dims),
    2 → WAV (8000+4000·(id%8) Hz, 1+id%2 channels).  Because the payloads
    are REAL containers built from a closed-form of the id, an oracle can
    verify the header PARSERS end-to-end without any codec library: parsed
    fields must equal the generation formula's values."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]

            def payload(i):
                i = int(i)
                w, h = 16 + i % 241, 16 + i % 181
                kind = i % 3
                if kind == 0:
                    return _build_png(w, h)
                if kind == 1:
                    return _build_jpeg(w, h)
                return _build_wav(8000 + 4000 * (i % 8), 1 + i % 2)

            yield pd.DataFrame(
                {"media_id": ids, "payload": ids.map(payload)}
            )

    return df.select(id_col).mapInPandas(build, "media_id long, payload binary")
