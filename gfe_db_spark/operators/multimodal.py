"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partition-sized Arrow batches,
mapInPandas signatures, metadata propagation) is real and tested; the
actual media decode is stubbed behind `DECODERS` because the image/audio
libraries are not in this container — swap in PIL/torchaudio decoders by
registering a callable, nothing else changes.

Scale notes: binary payloads ride in the same parquet row group as their
metadata; `spark.sql.files.maxPartitionBytes` bounds batch memory, and
frame-sample/resize run as Arrow-batched mapInPandas so bytes never leave
the executor except through the declared output schema.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _stub_decode(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake decoder: a tiny feature vector derived from the
    payload digest. Replace via DECODERS[kind] = real_decoder."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:8]]


DECODERS: dict[str, Callable[[str, bytes], list[float]]] = {
    "image": _stub_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Decode/feature-extract as Arrow-batched mapInPandas. The UDF sees
    pandas batches of (media_id, kind, payload) and emits FEATURE_SCHEMA
    rows; executors never materialize more than one Arrow batch of
    payloads at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS.get(k, _stub_decode)(k, bytes(p)) if p is not None else None
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": feats,
                }
            )

    from gfe_db_spark.operators import spread_small_input

    cols = spread_small_input(media.select("media_id", "kind", "payload"), key="media_id")
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real decoders for self-contained formats (no external libs): 24-bit BMP
# and 8-bit PCM WAV are fully specified public formats parseable with
# struct. These make the decode path REAL — header validation, dimension
# extraction, pixel/sample arithmetic — while PIL/torchaudio decoders for
# compressed formats (JPEG/MP3/H.264) slot into the same functions by kind.
# ---------------------------------------------------------------------------

import struct


def encode_bmp_rgb24(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding). `pixels` supplies width*height*3 bytes of the
    CANONICAL top-down grid (cycled if short); like any real BMP encoder,
    rows are written bottom-up into the file — so the same `pixels` bytes
    given to `encode_png_rgb8` produce the same IMAGE, which is what lets
    the cross-container perceptual-hash property hold."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    need = width * height * 3
    px = (pixels * (need // max(len(pixels), 1) + 2))[:need] if pixels else b"\x00" * need
    for r in range(height - 1, -1, -1):  # canonical top row lands last in file
        body += px[r * row_raw : (r + 1) * row_raw]
        body += b"\x00" * pad
    size = 14 + 40 + len(body)
    return (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit BMP → (width, height, CANONICAL top-down RGB
    bytes). BMP stores rows bottom-up; flipping here means every decoder
    in the module hands out the same grid orientation, so pixel-level
    consumers (perceptual hashing, resize) are container-independent.
    Raises on anything that isn't the supported subset — decode errors
    are data errors, surfaced not swallowed; header-declared dimensions
    are validated against the actual payload length."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, width, height, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if hdr_sz < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (header {hdr_sz}, {bpp} bpp)")
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    need = offset + height * (row_raw + pad)
    if need > len(payload):
        raise ValueError(
            f"truncated BMP: header declares {width}x{height} "
            f"({need} bytes needed, {len(payload)} present)"
        )
    out = bytearray()
    for r in range(height - 1, -1, -1):  # file bottom row = image last row
        start = offset + r * (row_raw + pad)
        out += payload[start : start + row_raw]
    return width, height, bytes(out)


def decode_bmp_rgb24(payload: bytes) -> tuple[int, int, float]:
    """Parse a 24-bit BMP → (width, height, mean pixel byte). Same error
    contract as `decode_bmp_pixels` (which it delegates to)."""
    width, height, px = decode_bmp_pixels(payload)
    return width, height, sum(px) / len(px)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# bytes per pixel for the supported 8-bit color types
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_rgb8(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit RGB PNG (color type 2, filter 0 scanlines, one IDAT,
    stdlib zlib). `pixels` supplies width*height*3 bytes, cycled if short —
    the deterministic fixture builder for the compressed decode path."""
    import zlib as _z

    need = width * height * 3
    px = (pixels * (need // max(len(pixels), 1) + 2))[:need] if pixels else b"\x00" * need
    raw = bytearray()
    stride = width * 3
    for r in range(height):
        raw.append(0)  # filter type None
        raw += px[r * stride : (r + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth) —
    the full public filter set, so any encoder's output decodes."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for r in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = r * stride
        prev_base = base - stride
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for i, x in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                out[base + i] = (x + left) & 0xFF
        elif ftype == 2:  # Up
            for i, x in enumerate(line):
                up = out[prev_base + i] if r > 0 else 0
                out[base + i] = (x + up) & 0xFF
        elif ftype == 3:  # Average
            for i, x in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                up = out[prev_base + i] if r > 0 else 0
                out[base + i] = (x + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i, x in enumerate(line):
                a = out[base + i - bpp] if i >= bpp else 0
                b = out[prev_base + i] if r > 0 else 0
                c = out[prev_base + i - bpp] if (r > 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[base + i] = (x + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png_pixels(payload: bytes, max_pixels: int = 1 << 24) -> tuple[int, int, int, bytes]:
    """Parse an 8-bit grayscale/RGB/RGBA non-interlaced PNG → (width,
    height, channels, top-down unfiltered channel bytes) with stdlib zlib only. Same error contract
    as the BMP decoder: unsupported variants, bad CRCs-at-structure-level,
    dimension forgery, and truncated streams raise — never a silently
    wrong mean. `max_pixels` bounds the inflate (zip-bomb guard: header
    dimensions are attacker-controlled; decompressed size is checked
    against them, not trusted from the stream)."""
    import zlib as _z

    if len(payload) < len(_PNG_SIG) + 25 or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    bpp = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(payload):
        clen, tag = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        if pos + clen + 4 > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        body = payload[pos : pos + clen]
        pos += clen + 4  # skip CRC
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG variant (depth {depth}, color type {ctype})"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/filter/interlace")
            if width <= 0 or height <= 0 or width * height > max_pixels:
                raise ValueError(f"invalid PNG dimensions {width}x{height}")
            bpp = _PNG_CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
    if width is None or bpp is None:
        raise ValueError("PNG missing IHDR")
    if not idat or not seen_end:
        raise ValueError("PNG missing IDAT/IEND")
    expected = height * (1 + width * bpp)
    raw = _z.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError(
            f"PNG pixel data mismatch: header declares {width}x{height} "
            f"({expected} filtered bytes, {len(raw)} inflated)"
        )
    out = _png_unfilter(raw, width, height, bpp)
    return width, height, bpp, bytes(out)


def decode_png(payload: bytes, max_pixels: int = 1 << 24) -> tuple[int, int, float]:
    """Parse an 8-bit PNG → (width, height, mean channel byte). Same
    error contract as `decode_png_pixels` (which it delegates to)."""
    width, height, _bpp, out = decode_png_pixels(payload, max_pixels)
    return width, height, sum(out) / len(out)


def encode_wav_pcm8(sample_rate: int, samples: bytes) -> bytes:
    """Minimal RIFF/WAVE container, 8-bit PCM mono."""
    data_sz = len(samples)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + data_sz, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + struct.pack("<4sI", b"data", data_sz)
        + samples
    )


def decode_wav_pcm8(payload: bytes) -> tuple[int, int, float]:
    """Parse 8-bit PCM WAV → (n_samples, sample_rate, mean sample).

    Walks the RIFF chunk list instead of assuming fixed offsets, so
    standard layouts with an 18-byte fmt chunk (PCM + cbSize) or extra
    chunks (LIST/fact) before 'data' decode correctly rather than
    producing silently wrong stats."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if tag == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            if len(body) < sz:
                raise ValueError(f"truncated WAV data chunk ({len(body)} of {sz} bytes)")
            data = body
            break
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    fmt_tag, channels, rate, _byte_rate, _align, bits = fmt
    if fmt_tag != 1 or channels != 1 or bits != 8:
        raise ValueError(f"unsupported WAV variant (fmt {fmt_tag}, {channels}ch, {bits}bit)")
    return len(data), rate, sum(data) / max(len(data), 1)


MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_media_stats(media: DataFrame) -> DataFrame:
    """REAL decode pass over binary media columns: BMP and PNG images
    (zlib-inflated, scanlines unfiltered) and PCM WAV audio are parsed
    inside an Arrow-batched mapInPandas — header validation, dimensions,
    and content statistics all computed from the actual bytes, with the
    container chosen by magic-byte sniffing. Unsupported/corrupt payloads
    land in `decode_error` (never a silently wrong row). Codec-library
    formats (JPEG/H.264) register the same way once their libs exist —
    the Spark plan does not change."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w = h = rate = None
                n_samp = None
                mean = None
                err = None
                try:
                    b = bytes(payload) if payload is not None else b""
                    if kind == "image":
                        # sniff the container magic, as real ingestion must:
                        # the kind column says "image", the bytes say which
                        if b[: len(_PNG_SIG)] == _PNG_SIG:
                            w, h, mean = decode_png(b)
                        else:
                            w, h, mean = decode_bmp_rgb24(b)
                    elif kind == "audio":
                        n_samp, rate, mean = decode_wav_pcm8(b)
                    else:
                        err = f"no decoder for kind {kind!r}"
                except Exception as e:  # noqa: BLE001 — error channel by contract
                    err = str(e)
                rows.append((mid, kind, w, h, n_samp, rate, mean, err))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_STATS_SCHEMA.fields]
            )

    from gfe_db_spark.operators import spread_small_input

    cols = spread_small_input(media.select("media_id", "kind", "payload"), key="media_id")
    return cols.mapInPandas(run, schema=MEDIA_STATS_SCHEMA)


def _bmp_pixels(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a supported BMP into top-down rows of raw RGB triples
    (shares validation with decode_bmp_rgb24)."""
    decode_bmp_rgb24(payload)  # full header/truncation validation
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, width, height, _, _ = struct.unpack_from("<IiiHH", payload, 14)
    height = abs(height)
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    rows = [
        payload[offset + r * (row_raw + pad) : offset + r * (row_raw + pad) + row_raw]
        for r in range(height - 1, -1, -1)  # file is bottom-up; flip to top-down
    ]
    return width, height, rows


def resize_bmp_nearest(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for the self-contained BMP format: nearest-neighbor
    resample of the decoded RGB grid, re-encoded as BMP. Raises on
    non-BMP input (PIL/libvips decoders for compressed formats register
    in RESIZERS the same way)."""
    sw, sh, rows = _bmp_pixels(payload)
    out = bytearray()
    for ty in range(height):
        sy = min(sh - 1, ty * sh // height)
        src = rows[sy]
        for tx in range(width):
            sx = min(sw - 1, tx * sw // width)
            out += src[sx * 3 : sx * 3 + 3]
    return encode_bmp_rgb24(width, height, bytes(out))


RESIZERS: dict[str, Callable[[bytes, int, int], bytes]] = {"image": resize_bmp_nearest}


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: image-kind payloads route through an Arrow-batched
    mapInPandas whose pixel transform comes from RESIZERS['image'] — real
    nearest-neighbor BMP resampling by default (resize_bmp_nearest);
    register a PIL round-trip for compressed formats. Non-image rows pass
    through untouched; an undecodable image payload yields payload NULL
    with the reason in `resize_error` (same errors-surface-not-swallow
    contract as decode_media_stats)."""
    import pyspark.sql.types as T

    resizer = RESIZERS.get("image", lambda payload, w, h: payload)
    out_schema = T.StructType(
        [*media.schema.fields, T.StructField("resize_error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            payloads, errs = [], []
            for kind, b in zip(pdf["kind"], pdf["payload"]):
                if kind != "image" or b is None:
                    payloads.append(b)
                    errs.append(None)
                    continue
                try:
                    payloads.append(resizer(bytes(b), width, height))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — error channel by contract
                    payloads.append(None)
                    errs.append(str(e))
            pdf["payload"] = payloads
            pdf["resize_error"] = errs
            yield pdf

    resized = media.mapInPandas(run, schema=out_schema)
    resized_meta = F.struct(
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return resized.withColumn("meta", resized_meta)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp
    (metadata-driven; payload decode stubbed). Emits (media_id, frame_ts_ms,
    frame_payload) with frame_payload = None until a video decoder is
    registered — the explode/timestamp arithmetic is the Spark-side work."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn("frame_payload", F.lit(None).cast("binary"))


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("ahash_error", T.StringType()),
    ]
)


def perceptual_ahash(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Average-hash (aHash) over REALLY decoded pixels — the multimodal
    dedup key computed from content, not container bytes. Because both
    decoders hand out the CANONICAL top-down grid (BMP rows flipped, PNG
    unfiltered), identical pixel content hashes identically whichever
    container shipped it — so the hash equi-join collapses cross-format
    duplicates that the payload-digest dedup (multimodal_dedup) cannot.

    Integer-only arithmetic keeps it bit-portable to the SQL oracle:
    gray_p = r+g+b (or 3×the single channel), bit p set iff
    n_pixels·gray_p > Σgray. Hash width = pixel count; for arbitrary
    images compose with `resize_images` down to 8×8 first (≤64 pixels —
    bit 63 wraps to the sign bit exactly like `_simhash`; larger grids
    error rather than silently truncate). Malformed payloads route to
    the error column; Arrow-batched mapInPandas throughout.
    """
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # columns were aliased to media_id/payload in the select below
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    out.append((int(mid), None, None, "null payload"))
                    continue
                b = bytes(payload)
                try:
                    if b[:2] == b"BM":
                        container = "bmp"
                        w, h, px = decode_bmp_pixels(b)
                        ch = 3
                    elif b[: len(_PNG_SIG)] == _PNG_SIG:
                        container = "png"
                        w, h, ch, px = decode_png_pixels(b)
                    else:
                        raise ValueError("no pixel decoder for payload")
                    n = w * h
                    if n > 64:
                        raise ValueError(
                            f"aHash grid too large ({w}x{h}): resize to <=64 pixels first"
                        )
                    grays = []
                    for p in range(n):
                        base = p * ch
                        if ch == 1:
                            grays.append(3 * px[base])
                        else:  # RGB / RGBA: alpha ignored
                            grays.append(px[base] + px[base + 1] + px[base + 2])
                    total = sum(grays)
                    hv = 0
                    for p, g in enumerate(grays):
                        if n * g > total:
                            hv |= 1 << p
                    if hv >= 1 << 63:  # 64-pixel grid: wrap to signed long
                        hv -= 1 << 64
                    out.append((int(mid), container, hv, None))
                except (ValueError, IndexError, struct.error, zlib.error) as ex:
                    out.append((int(mid), None, None, str(ex)))
            yield pd.DataFrame(
                out, columns=["media_id", "container", "ahash", "ahash_error"]
            )

    from gfe_db_spark.operators import spread_small_input

    cols = spread_small_input(
        media.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")),
        key="media_id",
    )
    return cols.mapInPandas(run, schema=AHASH_SCHEMA)
