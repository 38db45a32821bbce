"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` operators.  The decode libraries are
not present in this container, so the decode kernel is STUBBED: a
deterministic fake decoder (seeded by the payload hash) stands in,
and real libs plug into ``_decode_image_bytes`` without touching the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape
— all real and tested in tests/test_multimodal.py).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("doc_key string, media_idx int, kind string, "
                "payload binary, meta struct<width:int, height:int, "
                "n_frames:int, sample_rate:int>")

FEATURE_SCHEMA = ("doc_key string, media_idx int, kind string, "
                  "n_bytes int, content_crc long, width int, height int, "
                  "embedding array<float>")

_EMB_DIM = 16


def _decode_image_bytes(payload: bytes) -> np.ndarray:
    """STUB decode: a real build imports PIL/libvips here.  The fake is
    deterministic in the payload bytes so tests are stable."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError(
            "real image decode requires PIL/libvips (not in container)")
    seed = zlib.crc32(payload)
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(4, 16)), int(rng.integers(4, 16))
    return rng.random((h, w, 3), dtype=np.float32)


def _embed(img: np.ndarray) -> np.ndarray:
    """Deterministic feature extract: per-channel moments + fixed
    projection — stands in for a vision encoder."""
    flat = img.reshape(-1, 3).astype(np.float32)
    moments = np.concatenate([flat.mean(0), flat.std(0),
                              flat.min(0), flat.max(0)])
    rng = np.random.default_rng(7)
    proj = rng.standard_normal((len(moments), _EMB_DIM)).astype(np.float32)
    return (moments @ proj).astype(np.float32)


def media_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item features via one Arrow batch op.

    Real plumbing: batch iterator, per-row kernel, typed output —
    swapping the stub kernels for real decoders changes nothing here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_key", "media_idx", "kind",
                                   "n_bytes", "content_crc", "width",
                                   "height", "embedding")}
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                img = _decode_image_bytes(payload)
                emb = _embed(img)
                out["doc_key"].append(r.doc_key)
                out["media_idx"].append(r.media_idx)
                out["kind"].append(r.kind)
                out["n_bytes"].append(len(payload))
                out["content_crc"].append(zlib.crc32(payload))
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["embedding"].append(emb.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
