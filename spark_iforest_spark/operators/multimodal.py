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
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Output: (id, n_bytes, content_md5, features array<double>). The md5 and
    byte length are computed from the same bytes the decoder sees — they
    double as integrity checks against the SQL oracle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_bytes, md5s, feats = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                ids.append(did)
                n_bytes.append(len(raw))
                md5s.append(hashlib.md5(raw).hexdigest())
                decoder = _DECODERS.get("text/plain", decode_stub)
                feats.append([round(float(x), 6) for x in decoder(raw)[:feature_dim]])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": n_bytes,
                    "content_md5": md5s,
                    "features": feats,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
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
