"""Real stdlib codecs behind the multimodal seam (round-4 verdict item 5+).

The container ships neither PIL nor soundfile, so the AUTO decoders carry
genuinely decodable formats with nothing but the stdlib + numpy: binary
Netpbm (P6 PPM / P5 PGM), uncompressed 24/32-bit BI_RGB BMP, and PCM WAV
via the ``wave`` module. These tests feed GENUINE bytes of each format —
built here with independent writers (struct-packed headers; the stdlib
``wave`` writer for WAV) — through both the raw decoders and the Spark
operators, and pin the corrupt / unrecognized-fallback contracts.
"""

from __future__ import annotations

import io
import struct
import wave as wave_mod

import numpy as np
import pytest

from quickner_spark.operators.multimodal import (FEATURE_DIM,
                                                 audio_features,
                                                 decode_audio_auto,
                                                 decode_audio_stub,
                                                 decode_audio_wav,
                                                 decode_image_auto,
                                                 decode_image_bmp,
                                                 decode_image_ppm,
                                                 decode_image_stub,
                                                 image_features)

# --- independent writers (test-side, not the code under test) -------------


def make_ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = img.shape
    hdr = b"P6\n"
    if comment:
        hdr += b"# a netpbm comment line\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + img.tobytes()


def make_pgm(gray: np.ndarray) -> bytes:
    h, w = gray.shape
    return f"P5 {w} {h} 255\n".encode() + gray.tobytes()


def make_bmp(img: np.ndarray, bitcount: int = 24,
             top_down: bool = False) -> bytes:
    """Struct-packed BITMAPFILEHEADER + BITMAPINFOHEADER + padded BGR(A)
    raster — an independent writer so the decoder is tested against the
    spec, not against itself."""
    h, w, _ = img.shape
    bpp = bitcount // 8
    stride = (bitcount * w + 31) // 32 * 4
    raster = bytearray()
    row_order = range(h) if top_down else range(h - 1, -1, -1)
    for r in row_order:
        row = bytearray()
        for c in range(w):
            red, green, blue = (int(v) for v in img[r, c])
            row += bytes([blue, green, red] + ([0xFF] if bpp == 4 else []))
        row += b"\x00" * (stride - len(row))
        raster += row
    pixel_off = 14 + 40
    file_size = pixel_off + len(raster)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1,
                      bitcount, 0, len(raster), 2835, 2835, 0, 0)
    return file_hdr + dib + bytes(raster)


def make_wav(samples: np.ndarray, n_channels: int = 1,
             sampwidth: int = 2, framerate: int = 8000) -> bytes:
    """stdlib wave writer; ``samples`` is int16 (or uint8 for width 1),
    shaped (n,) mono or (n, channels)."""
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(framerate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def rgb_img() -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)


# --- image: PPM / PGM ------------------------------------------------------


def test_ppm_roundtrip_exact(rgb_img):
    out = decode_image_ppm(make_ppm(rgb_img))
    assert out.shape == (5, 3, 3) and (out == rgb_img).all()


def test_ppm_header_comments_and_whitespace(rgb_img):
    assert (decode_image_ppm(make_ppm(rgb_img, comment=True))
            == rgb_img).all()


def test_pgm_grayscale_replicates_channels():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_image_ppm(make_pgm(gray))
    assert out.shape == (3, 4, 3)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()


def test_ppm_corrupt_contract(rgb_img):
    whole = make_ppm(rgb_img)
    assert decode_image_ppm(whole[:-1]) is None          # truncated raster
    assert decode_image_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24) is None  # 16-bit
    assert decode_image_ppm(b"P6\n2 x\n255\n" + b"\0" * 12) is None  # bad token
    assert decode_image_ppm(b"P6\n2 2") is None          # header runs out


# --- image: BMP -------------------------------------------------------------


def test_bmp24_bottom_up_roundtrip(rgb_img):
    out = decode_image_bmp(make_bmp(rgb_img, bitcount=24))
    assert out.shape == (5, 3, 3) and (out == rgb_img).all()


def test_bmp32_top_down_roundtrip(rgb_img):
    out = decode_image_bmp(make_bmp(rgb_img, bitcount=32, top_down=True))
    assert (out == rgb_img).all()  # alpha dropped, row order restored


def test_bmp_corrupt_contract(rgb_img):
    whole = make_bmp(rgb_img)
    assert decode_image_bmp(whole[:-1]) is None            # truncated raster
    assert decode_image_bmp(whole[:40]) is None            # truncated header
    # compressed (BI_RLE8 = 1) rejected: patch the compression field
    rle = bytearray(whole)
    rle[30:34] = struct.pack("<I", 1)
    assert decode_image_bmp(bytes(rle)) is None


# --- image: auto dispatch ---------------------------------------------------


def test_image_auto_dispatch_and_fallback(rgb_img):
    assert (decode_image_auto(make_ppm(rgb_img)) == rgb_img).all()
    assert (decode_image_auto(make_bmp(rgb_img)) == rgb_img).all()
    # unrecognized payload -> deterministic stub (fixture stability)
    blob = b"payload-0"
    assert (decode_image_auto(blob) == decode_image_stub(blob)).all()
    assert decode_image_auto(b"") is None
    assert decode_image_auto(make_ppm(rgb_img)[:6]) is None  # magic, corrupt


# --- audio: WAV -------------------------------------------------------------


def test_wav16_mono_roundtrip():
    ints = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    out = decode_audio_wav(make_wav(ints))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ints.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_wav8_unsigned_midpoint():
    ints = np.array([0, 128, 255], dtype=np.uint8)
    out = decode_audio_wav(make_wav(ints, sampwidth=1))
    np.testing.assert_allclose(
        out, (ints.astype(np.float32) - 128.0) / 128.0, atol=1e-7)


def test_wav_stereo_downmix():
    stereo = np.array([[1000, 3000], [-2000, 2000]], dtype="<i2")
    out = decode_audio_wav(make_wav(stereo, n_channels=2))
    np.testing.assert_allclose(out, np.array([2000.0, 0.0]) / 32768.0,
                               atol=1e-7)


def test_wav24_packed():
    # hand-pack two 24-bit LE samples: +2^22 and -2^22
    frames = (0x400000).to_bytes(3, "little") + \
        (0x1000000 - 0x400000).to_bytes(3, "little")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(3); wf.setframerate(8000)
        wf.writeframes(frames)
    out = decode_audio_wav(buf.getvalue())
    # full scale for 24-bit is 2^23: +-2^22 -> +-0.5
    np.testing.assert_allclose(out, [0.5, -0.5], atol=1e-7)


def test_wav_corrupt_and_auto_contract():
    good = make_wav(np.array([1, 2, 3], dtype="<i2"))
    assert decode_audio_wav(good[:20]) is None          # truncated header
    assert decode_audio_wav(b"RIFF1234WAVEjunk") is None
    np.testing.assert_allclose(decode_audio_auto(good),
                               decode_audio_wav(good))
    blob = b"payload-3"
    np.testing.assert_allclose(decode_audio_auto(blob),
                               decode_audio_stub(blob))
    assert decode_audio_auto(b"") is None


# --- end-to-end: genuine bytes through the Spark operators ------------------


def test_image_features_over_real_bytes(spark, rgb_img):
    rows = [(1, make_ppm(rgb_img)), (2, make_bmp(rgb_img)),
            (3, b"opaque-blob"), (4, b"")]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r["media_id"]: r
           for r in image_features(df, decoder=decode_image_auto).collect()}
    assert out[1]["ok"] and out[2]["ok"] and out[3]["ok"]
    assert not out[4]["ok"]
    # PPM and BMP carry the SAME pixels -> identical histogram features
    assert out[1]["feature"] == out[2]["feature"]
    hist, _ = np.histogram(rgb_img, bins=FEATURE_DIM, range=(0, 256))
    expected = [float(h) / float(hist.sum()) for h in hist]
    np.testing.assert_allclose(out[1]["feature"], expected, atol=1e-6)


def test_audio_features_over_real_bytes(spark):
    t = np.arange(64, dtype=np.float32)
    ints = (np.sin(t / 3.0) * 20000).astype("<i2")
    rows = [(1, make_wav(ints)), (2, b"opaque-blob"), (3, b"")]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r["media_id"]: r
           for r in audio_features(df, n_windows=4,
                                   decoder=decode_audio_auto).collect()}
    assert out[1]["ok"] and out[2]["ok"] and not out[3]["ok"]
    wave = ints.astype(np.float32) / 32768.0
    exp_rms = [float(np.sqrt(np.mean(w * w)))
               for w in np.array_split(wave, 4)]
    np.testing.assert_allclose(out[1]["rms"], exp_rms, atol=1e-6)
    assert out[1]["zero_crossings"] == int(np.sum(
        np.signbit(wave[1:]) != np.signbit(wave[:-1])))
