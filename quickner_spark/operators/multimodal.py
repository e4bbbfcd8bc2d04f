"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
partition-friendly transforms. The CODEC is an injection seam: every
operator takes a ``decoder=`` callable; the default is resolved by
:func:`default_image_decoder` / :func:`default_audio_decoder`, which pick
the real library-backed decoder (PIL / soundfile) when the library is
importable — same gated-import pattern as pyahocorasick in
``matcher.py`` — and the deterministic stub otherwise (this container
ships neither library). Swapping in a production codec is therefore a
zero-plan-change operation: pass the callable, or install the library.
The seam itself is proven by a contract test that injects a fake "real"
decoder (``tests/test_multimodal.py``).

Design rules for 100 TB of media:
* media bytes travel in their own column; metadata predicates (mime, width,
  duration) are plain columns so pruning/pushdown never touches the blob.
* feature extraction is mapInPandas over (key, bytes) only — never ship
  unused columns through Python.
* frame/window sampling happens inside the UDF batch (one Arrow transfer).
* the decoder callable is captured in the UDF closure, so it must be
  picklable (module-level functions are); library imports live INSIDE the
  decoder body so executors resolve them at first batch, not at ship time.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["decode_image_stub", "decode_image_pil", "default_image_decoder",
           "image_features", "frame_sample", "decode_frame_stub",
           "resize_stub", "resize_images", "decode_audio_stub",
           "decode_audio_soundfile", "default_audio_decoder",
           "audio_features"]

FEATURE_DIM = 16

try:  # gated import: the container has no PIL — the stub path is the
    import PIL.Image  # noqa: F401  # one exercised by this repo's tests
    _HAVE_PIL = True
except ImportError:  # pragma: no cover — no PIL in this container
    _HAVE_PIL = False

try:  # gated import: soundfile, the audio twin
    import soundfile  # noqa: F401
    _HAVE_SOUNDFILE = True
except ImportError:  # pragma: no cover
    _HAVE_SOUNDFILE = False


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


def decode_image_pil(data: bytes) -> np.ndarray | None:
    """REAL decoder (used when PIL is importable): any format PIL reads
    → (h, w, 3) uint8 RGB array; None on empty/corrupt payloads (the
    same error contract as the stub). PIL is imported inside the body so
    the function pickles into executor closures cleanly."""
    if not data:
        return None
    import io

    from PIL import Image
    try:
        with Image.open(io.BytesIO(data)) as img:
            return np.asarray(img.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


def default_image_decoder() -> Callable[[bytes], np.ndarray | None]:
    """The codec seam's default: PIL-backed when PIL is importable, the
    deterministic stub otherwise. Resolved once on the driver; the chosen
    module-level function ships in the UDF closure."""
    return decode_image_pil if _HAVE_PIL else decode_image_stub


def image_features(df: DataFrame, bytes_col: str = "data",
                   key_col: str = "media_id",
                   decoder: Callable[[bytes], np.ndarray | None]
                   | None = None) -> DataFrame:
    """(key, bytes) -> (key, ok, feature array<float>): decode + mean-pool
    color histogram features. One Arrow batch in, one out. ``decoder``
    overrides the codec (default: :func:`default_image_decoder`)."""
    decode = decoder or default_image_decoder()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, feats = [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                img = decode(b)
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


def decode_frame_stub(data: bytes, frame_index: int) -> np.ndarray | None:
    """STUB frame decoder (swap for an ffmpeg/pyav seek-and-decode): a
    deterministic per-frame image derived from the payload + frame index."""
    if not data:
        return None
    return decode_image_stub(data + frame_index.to_bytes(2, "big"))


def frame_sample(df: DataFrame, bytes_col: str = "data",
                 key_col: str = "media_id", every: int = 4,
                 n_frames: int = 16,
                 frame_decoder: Callable[[bytes, int], np.ndarray | None]
                 | None = None) -> DataFrame:
    """Video-style frame sampling: emit one row per sampled frame index
    with its feature vector. Demonstrates the one-to-many batch shape
    (explode inside the UDF, not after). ``frame_decoder(data, index)``
    overrides the codec (default: the stub — no video library ships in
    any container we target, so there is no auto-detected real default;
    the seam is the parameter)."""
    decode = frame_decoder or decode_frame_stub

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, feats = [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                if not b:
                    continue
                for fi in range(0, n_frames, every):
                    frame = decode(b, fi)
                    if frame is None:
                        continue
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
                  key_col: str = "media_id",
                  decoder: Callable[[bytes], np.ndarray | None]
                  | None = None) -> DataFrame:
    """(key, bytes) -> (key, ok, height, width, pixels binary): decode +
    resize, re-emitting raw pixel bytes as an opaque binary column (the
    blob-stays-binary rule holds on output too — downstream predicates get
    the typed height/width columns, never the pixels). The nearest-
    neighbor resize is real math over whatever array the ``decoder``
    yields — it works unchanged under the stub and under PIL."""
    decode = decoder or default_image_decoder()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, hs, ws, px = [], [], [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                img = decode(b)
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


def decode_audio_soundfile(data: bytes) -> np.ndarray | None:
    """REAL decoder (used when soundfile is importable): WAV/FLAC/OGG →
    mono float32 waveform; None on empty/corrupt payloads. Import inside
    the body, same closure-pickling rule as :func:`decode_image_pil`."""
    if not data:
        return None
    import io

    import soundfile as sf
    try:
        wave, _sr = sf.read(io.BytesIO(data), dtype="float32")
    except Exception:
        return None
    wave = np.asarray(wave, dtype=np.float32)
    if wave.ndim > 1:  # downmix channels — features below are mono
        wave = wave.mean(axis=1)
    return wave


def default_audio_decoder() -> Callable[[bytes], np.ndarray | None]:
    """soundfile-backed when importable, deterministic stub otherwise."""
    return decode_audio_soundfile if _HAVE_SOUNDFILE else decode_audio_stub


def audio_features(df: DataFrame, bytes_col: str = "data",
                   key_col: str = "media_id", n_windows: int = 8,
                   decoder: Callable[[bytes], np.ndarray | None]
                   | None = None) -> DataFrame:
    """(key, bytes) -> (key, ok, rms array<float>, zero_crossings int):
    windowed RMS energy + zero-crossing count over the decoded waveform —
    the audio twin of image_features, same Arrow batch shape. ``decoder``
    overrides the codec (default: :func:`default_audio_decoder`)."""
    decode = decoder or default_audio_decoder()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, rms, zc = [], [], [], []
            for k, b in zip(pdf[key_col].values, pdf[bytes_col].values):
                wave = decode(b)
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
