"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
partition-friendly transforms; the codec step is a deterministic stub
(``decode_image_stub``) because no image/audio libraries ship in this
container. Swapping in a real decoder (PIL/torchaudio/ffmpeg) changes ONE
function body, nothing in the plan.

Design rules for 100 TB of media:
* media bytes travel in their own column; metadata predicates (mime, width,
  duration) are plain columns so pruning/pushdown never touches the blob.
* feature extraction is mapInPandas over (key, bytes) only — never ship
  unused columns through Python.
* frame/window sampling happens inside the UDF batch (one Arrow transfer).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["decode_image_stub", "image_features", "frame_sample",
           "resize_stub", "resize_images", "decode_audio_stub",
           "audio_features"]

FEATURE_DIM = 16


def decode_image_stub(data: bytes) -> np.ndarray | None:
    """STUB decoder: a real deployment replaces this with PIL/libjpeg.

    Deterministic fake: derives an (8, 8, 3) uint8 'image' from a blake2b
    stream of the bytes, so downstream feature math is exercised with
    stable values. Returns None for empty payloads (the error path real
    codecs need)."""
    if not data:
        return None
    digest = hashlib.shake_256(data).digest(8 * 8 * 3)
    return np.frombuffer(digest, dtype=np.uint8).reshape(8, 8, 3)


def image_features(df: DataFrame, bytes_col: str = "data",
                   key_col: str = "media_id") -> DataFrame:
    """(key, bytes) -> (key, ok, feature array<float>): decode + mean-pool
    color histogram features. One Arrow batch in, one out."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, feats = [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                img = decode_image_stub(b)
                keys.append(k)
                if img is None:
                    oks.append(False)
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                total = float(hist.sum()) or 1.0
                oks.append(True)
                feats.append([float(h) / total for h in hist])
            yield pd.DataFrame({key_col: keys, "ok": oks, "feature": feats})

    return df.select(key_col, bytes_col).mapInPandas(
        gen, f"{key_col} long, ok boolean, feature array<float>")


def frame_sample(df: DataFrame, bytes_col: str = "data",
                 key_col: str = "media_id", every: int = 4,
                 n_frames: int = 16) -> DataFrame:
    """Video-style frame sampling over the stub codec: emit one row per
    sampled frame index with its feature vector. Demonstrates the
    one-to-many batch shape (explode inside the UDF, not after)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, feats = [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                if not b:
                    continue
                for fi in range(0, n_frames, every):
                    frame = decode_image_stub(b + fi.to_bytes(2, "big"))
                    hist, _ = np.histogram(frame, bins=FEATURE_DIM,
                                           range=(0, 256))
                    total = float(hist.sum()) or 1.0
                    keys.append(k)
                    idxs.append(fi)
                    feats.append([float(h) / total for h in hist])
            yield pd.DataFrame({key_col: keys, "frame": idxs, "feature": feats})

    return df.select(key_col, bytes_col).mapInPandas(
        gen, f"{key_col} long, frame int, feature array<float>")


def resize_stub(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy — real math over the stub
    decode; a deployment swaps in PIL's resampling, same shape contract."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows][:, cols]


def resize_images(df: DataFrame, height: int = 4, width: int = 4,
                  bytes_col: str = "data",
                  key_col: str = "media_id") -> DataFrame:
    """(key, bytes) -> (key, ok, height, width, pixels binary): decode +
    resize, re-emitting raw pixel bytes as an opaque binary column (the
    blob-stays-binary rule holds on output too — downstream predicates get
    the typed height/width columns, never the pixels)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, hs, ws, px = [], [], [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                img = decode_image_stub(b)
                keys.append(k)
                if img is None:
                    oks.append(False); hs.append(0); ws.append(0)
                    px.append(b"")
                    continue
                r = resize_stub(img, height, width)
                oks.append(True); hs.append(height); ws.append(width)
                px.append(r.tobytes())
            yield pd.DataFrame({key_col: keys, "ok": oks, "height": hs,
                                "width": ws, "pixels": px})

    return df.select(key_col, bytes_col).mapInPandas(
        gen, f"{key_col} long, ok boolean, height int, width int, "
             "pixels binary")


def decode_audio_stub(data: bytes, n_samples: int = 256) -> np.ndarray | None:
    """STUB audio decoder (swap for torchaudio/ffmpeg): deterministic
    float32 waveform in [-1, 1) derived from a shake_256 stream."""
    if not data:
        return None
    raw = hashlib.shake_256(b"audio" + data).digest(n_samples)
    return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0


def audio_features(df: DataFrame, bytes_col: str = "data",
                   key_col: str = "media_id", n_windows: int = 8) -> DataFrame:
    """(key, bytes) -> (key, ok, rms array<float>, zero_crossings int):
    windowed RMS energy + zero-crossing count over the decoded waveform —
    the audio twin of image_features, same Arrow batch shape."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, rms, zc = [], [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                wave = decode_audio_stub(b)
                keys.append(k)
                if wave is None:
                    oks.append(False); rms.append([0.0] * n_windows)
                    zc.append(0)
                    continue
                wins = np.array_split(wave, n_windows)
                oks.append(True)
                rms.append([float(np.sqrt(np.mean(w * w))) for w in wins])
                zc.append(int(np.sum(np.signbit(wave[1:]) !=
                                     np.signbit(wave[:-1]))))
            yield pd.DataFrame({key_col: keys, "ok": oks, "rms": rms,
                                "zero_crossings": zc})

    return df.select(key_col, bytes_col).mapInPandas(
        gen, f"{key_col} long, ok boolean, rms array<float>, "
             "zero_crossings int")
