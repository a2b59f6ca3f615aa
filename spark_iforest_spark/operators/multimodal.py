"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signature, and batch shape are real and tested; the
actual media decode is STUBBED (no image/audio libs in this container)
behind ``register_decoder`` / a deterministic byte-level feature fake.

At scale: payloads stay off the driver, flow executor-to-executor as Arrow
binary buffers; `repartition(n)` before heavy decode spreads hot partitions;
metadata-only predicates (`media_type`, `n_bytes`) are plain Catalyst
filters that prune before any Python worker sees bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# media_type -> decoder(payload bytes) -> np.ndarray feature vector
_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Plug a real decoder (PIL, torchaudio, ...) when the libs exist."""
    _DECODERS[media_type] = fn


def decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode': 16-bin byte histogram, L1-normalized.

    Stands in for image/audio feature extraction; replace via
    register_decoder. Raises like a real decoder would on empty payloads.
    """
    if not payload:
        raise NotImplementedError("empty payload: no decoder registered")
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16)
    return hist / hist.sum()


def decode_png_header(payload: bytes) -> np.ndarray:
    """REAL (non-stub) PNG decode of the header plane: pure-Python ``struct``
    parse of the signature + IHDR chunk — no media libs needed. Features:
    [width, height, bit_depth, color_type, compression, filter, interlace,
    n_chunks, total_bytes]. Pixel decode would slot in the same way with
    zlib+Paeth; the metadata plane is what corpus triage filters on
    (resolution/color-type predicates) before any expensive decode.
    """
    import struct

    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    n_chunks, off = 0, 8
    while off + 8 <= len(payload):
        clen = struct.unpack(">I", payload[off : off + 4])[0]
        n_chunks += 1
        off += 12 + clen  # length + type + data + crc
    return np.array(
        [w, h, depth, color, comp, filt, interlace, n_chunks, len(payload)],
        dtype=np.float64,
    )


def decode_wav_header(payload: bytes) -> np.ndarray:
    """REAL (non-stub) WAV decode of the RIFF/fmt/data headers via
    ``struct``. Features: [n_channels, sample_rate, bits_per_sample,
    n_frames, duration_ms, byte_rate, audio_format, data_bytes, total_bytes].
    """
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt = None
    data_size = 0
    off = 12
    while off + 8 <= len(payload):
        cid, clen = struct.unpack("<4sI", payload[off : off + 8])
        # bound the unpack by the actual payload: a fmt chunk whose declared
        # length runs past the end must raise the documented ValueError, not
        # struct.error from a short slice
        if cid == b"fmt " and clen >= 16:
            if off + 24 > len(payload):
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", payload[off + 8 : off + 24])
        elif cid == b"data":
            data_size = clen
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    audio_format, n_ch, rate, byte_rate, block_align, bits = fmt
    n_frames = data_size // block_align if block_align else 0
    duration_ms = 1000.0 * n_frames / rate if rate else 0.0
    return np.array(
        [n_ch, rate, bits, n_frames, duration_ms, byte_rate, audio_format, data_size, len(payload)],
        dtype=np.float64,
    )


def decode_jpeg_header(payload: bytes) -> np.ndarray:
    """REAL (non-stub) JPEG decode of the marker plane: walk the marker
    stream to the SOFn frame header. Features: [width, height, precision,
    n_components, progressive, n_segments, total_bytes] — progressive=1
    for SOF2 (the web's progressive JPEG), 0 for baseline SOF0/1/3.
    Entropy-coded pixel data (after SOS) is never touched; the marker
    plane is what triage predicates (resolution, channel count,
    progressive-ness) filter on before any expensive decode."""
    import struct

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    off, n_segments = 2, 0
    sof = None
    while off + 4 <= len(payload):
        if payload[off] != 0xFF:
            raise ValueError("JPEG marker stream corrupt")
        marker = payload[off + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            off += 1
            continue
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            off += 2  # standalone markers carry no length
            continue
        seg_len = struct.unpack(">H", payload[off + 2 : off + 4])[0]
        if seg_len < 2 or off + 2 + seg_len > len(payload):
            raise ValueError("JPEG segment truncated")
        n_segments += 1
        # SOFn frame headers: C0-CF minus DHT (C4), JPGn (C8), DAC (CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 8:
                raise ValueError("JPEG SOF truncated")
            precision, h, w, n_comp = struct.unpack(
                ">BHHB", payload[off + 4 : off + 10]
            )
            sof = (w, h, precision, n_comp, 1.0 if marker == 0xC2 else 0.0)
        if marker == 0xDA:  # SOS: entropy data follows, header plane done
            break
        off += 2 + seg_len
    if sof is None:
        raise ValueError("JPEG missing SOF frame header")
    w, h, precision, n_comp, progressive = sof
    return np.array(
        [w, h, precision, n_comp, progressive, n_segments, len(payload)],
        dtype=np.float64,
    )


def decode_gif_header(payload: bytes) -> np.ndarray:
    """REAL (non-stub) GIF decode of the header + logical screen
    descriptor. Features: [width, height, version (87/89), has_gct,
    gct_colors, bg_color_index, total_bytes]."""
    import struct

    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise ValueError("not a GIF payload")
    version = 87.0 if payload[4:6] == b"7a" else 89.0
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    has_gct = (packed >> 7) & 1
    gct_colors = 2 ** ((packed & 0x07) + 1) if has_gct else 0
    return np.array(
        [w, h, version, has_gct, gct_colors, bg, len(payload)], dtype=np.float64
    )


def decode_mp4_header(payload: bytes) -> np.ndarray:
    """REAL (non-stub) MP4/ISO-BMFF decode of the box plane: walk the
    top-level boxes (size+fourcc, 64-bit largesize and to-end sizes
    handled), then the ``moov`` children to the ``mvhd`` movie header.
    Features: [duration_seconds, timescale, duration_units, mvhd_version,
    n_top_boxes, has_ftyp, total_bytes] — the video triage plane
    (duration/brand predicates) without touching a single sample; frame
    extraction would hang off ``frame_sample`` the same way."""
    import struct

    def walk(lo: int, hi: int):
        off = lo
        while off + 8 <= hi:
            size, box = struct.unpack(">I4s", payload[off : off + 8])
            body = off + 8
            if size == 1:  # 64-bit largesize follows the fourcc
                if body + 8 > hi:
                    raise ValueError("MP4 largesize truncated")
                size = struct.unpack(">Q", payload[body : body + 8])[0]
                body += 8
            elif size == 0:  # box extends to the end of the enclosure
                size = hi - off
            if size < 8 or off + size > hi:
                raise ValueError("MP4 box size out of bounds")
            yield box, body, off + size
            off += size

    if len(payload) < 8:
        raise ValueError("not an MP4 payload")
    n_top, has_ftyp, mvhd = 0, 0.0, None
    try:
        for box, body, end in walk(0, len(payload)):
            n_top += 1
            if box == b"ftyp":
                has_ftyp = 1.0
            elif box == b"moov":
                for cbox, cbody, _cend in walk(body, end):
                    if cbox == b"mvhd":
                        version = payload[cbody]
                        if version == 1:
                            timescale, duration = struct.unpack(
                                ">IQ", payload[cbody + 20 : cbody + 32]
                            )
                        else:
                            timescale, duration = struct.unpack(
                                ">II", payload[cbody + 12 : cbody + 20]
                            )
                        mvhd = (float(version), float(timescale), float(duration))
    except (struct.error, IndexError) as exc:  # truncated fixed-width field
        raise ValueError("MP4 box truncated") from exc
    if n_top == 0 or (not has_ftyp and mvhd is None):
        raise ValueError("not an MP4 payload (no ftyp/moov)")
    version, timescale, duration = mvhd if mvhd else (0.0, 0.0, 0.0)
    secs = duration / timescale if timescale else 0.0
    return np.array(
        [secs, timescale, duration, version, n_top, has_ftyp, len(payload)],
        dtype=np.float64,
    )


# Builtin header decoders: registered at import so the register_decoder plug
# point always has real (non-stub) users; decode_stub stays the fallback for
# media types with no registered decoder (full pixel/sample decode needs
# libs this container doesn't ship).
register_decoder("image/png", decode_png_header)
register_decoder("audio/wav", decode_wav_header)
register_decoder("image/jpeg", decode_jpeg_header)
register_decoder("image/gif", decode_gif_header)
register_decoder("video/mp4", decode_mp4_header)


def attach_binary_payload(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_type: str = "text/plain",
) -> DataFrame:
    """Demo constructor: wrap a text column as (payload binary, meta struct).

    Real pipelines read payloads via spark.read.format('binaryFile') or a
    parquet column; this gives the same shape from the synthetic tables.
    """
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    feature_dim: int = 16,
    media_type: str = "text/plain",
    media_type_col: str | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Output: (id, n_bytes, content_md5, features array<double>). The md5 and
    byte length are computed from the same bytes the decoder sees — they
    double as integrity checks against the SQL oracle.

    Decoder dispatch: ``media_type_col`` names a string column for per-row
    dispatch (mixed-modality tables); otherwise every row decodes as
    ``media_type``. A type with no registered decoder falls back to
    decode_stub; builtin real decoders cover image/png and audio/wav.

    Per-row fault isolation: one malformed/truncated payload in a 100 TB
    corpus must not fail the whole mapInPandas task, so decoder errors
    (ValueError/struct.error) degrade that ROW to the stub histogram — and
    to null features when even the stub can't run (empty payload). Direct
    decoder calls still raise; only the batch pipeline degrades.
    """
    import struct

    cols = [id_col, payload_col] + ([media_type_col] if media_type_col else [])

    def safe_decode(decoder, raw: bytes):
        try:
            return decoder(raw)
        except (ValueError, struct.error):
            pass
        try:
            return decode_stub(raw)
        except NotImplementedError:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_bytes, md5s, feats = [], [], [], []
            mts = pdf[media_type_col] if media_type_col else [media_type] * len(pdf)
            for did, payload, mt in zip(pdf[id_col], pdf[payload_col], mts):
                raw = bytes(payload)
                ids.append(did)
                n_bytes.append(len(raw))
                md5s.append(hashlib.md5(raw).hexdigest())
                decoder = _DECODERS.get(mt, decode_stub)
                vec = safe_decode(decoder, raw)
                feats.append(
                    None
                    if vec is None
                    else [round(float(x), 6) for x in vec[:feature_dim]]
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": n_bytes,
                    "content_md5": md5s,
                    "features": feats,
                }
            )

    return media.select(*cols).mapInPandas(
        run, schema=f"{id_col} long, n_bytes int, content_md5 string, features array<double>"
    )


def frame_sample(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """'Frame sampling' plumbing demo: emits one row per sampled chunk of the
    payload (stand-in for video frame extraction). Output rows explode
    1→many inside the Python worker with bounded batch memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_ids, offsets, sizes = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                for fi, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(did)
                    frame_ids.append(fi)
                    offsets.append(off)
                    sizes.append(min(every_n_bytes, len(raw) - off))
            yield pd.DataFrame(
                {id_col: ids, "frame_id": frame_ids, "offset": offsets, "n_bytes": sizes}
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, frame_id int, offset int, n_bytes int"
    )
