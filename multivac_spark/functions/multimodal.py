"""Multimodal column processing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages (the reference pipeline is text-only; this is part of the
training-data-pipeline mandate).

Real decode kernels, no codec libraries required:

* **image** — P6 PPM and 24-bit uncompressed BMP, parsed with pure
  numpy from the public format specs; nearest-neighbor resize via
  integer index striding.
* **audio** — PCM WAV via the stdlib ``wave`` module (8/16/32-bit,
  any channel count, downmixed to mono float32).
* **video** — PPM *stream* (concatenated P6 frames — the
  ``image2pipe``/``ppm_pipe`` interchange format), with evenly-spaced
  frame sampling.

Compressed codecs (JPEG/PNG/MP3/MP4) still raise
``DecoderUnavailable`` — their decoders are not in this container;
the per-row failure isolation keeps one bad payload from failing a
10^12-row job (the reference's try/except-continue pattern,
rdf_extract.py:861-869).

Features are REAL 32-dim content descriptors (channel stats + 4x4
luma thumbnail + histogram for images; RMS/ZCR/envelope/spectrum for
audio; frame-averaged image features for video), so downstream ANN /
near-dup operators work on content, not hashes. ``_fake_feature``
remains available as an explicit stand-in for embedding-model
deployments.

Layout follows the documents table convention: payloads come in as
``(url, kind, media, meta)`` where ``media`` is the raw bytes.
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd

MEDIA_SCHEMA = ("url string, kind string, media binary, "
                "meta struct<mime:string, width:int, height:int, "
                "duration_ms:int>")

FEATURES_SCHEMA = ("url string, kind string, n_bytes int, sha256 string, "
                   "feature array<float>, decode_error string")

FEATURE_DIM = 32


class DecoderUnavailable(NotImplementedError):
    """Raised for formats whose decoders are not in this container
    (JPEG/PNG/MP3/MP4 need libjpeg/ffmpeg; install at deploy time)."""


# ---------------------------------------------------------------------------
# image: P6 PPM + 24-bit BMP (numpy-only)
# ---------------------------------------------------------------------------

def _ppm_parse_one(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    """Parse one binary-PPM (P6) image starting at ``off``; returns
    (H,W,3 uint8 array, offset past the pixel data). Header tokens may
    be separated by arbitrary whitespace and '#' comments per the spec."""
    tokens: list[int] = []
    i = off
    if buf[i:i + 2] != b"P6":
        raise DecoderUnavailable("not a P6 PPM header")
    i += 2
    while len(tokens) < 3:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        tokens.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise DecoderUnavailable("16-bit PPM not supported")
    end = i + w * h * 3
    if end > len(buf):
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3,
                        offset=i).reshape(h, w, 3)
    return arr, end


def _bmp_parse(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H,W,3 uint8, RGB). Bottom-up rows,
    4-byte row padding, BGR channel order per the BITMAPINFOHEADER spec."""
    if buf[:2] != b"BM":
        raise DecoderUnavailable("not a BMP file")
    pix_off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or compression != 0:
        raise DecoderUnavailable(f"BMP bpp={bpp} compression={compression} "
                                 "not supported (24-bit uncompressed only)")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """payload → (H, W, 3) uint8 RGB. Supports P6 PPM and 24-bit BMP."""
    if payload[:2] == b"P6":
        arr, _ = _ppm_parse_one(payload, 0)
        return arr
    if payload[:2] == b"BM":
        return _bmp_parse(payload)
    raise DecoderUnavailable("unsupported image format "
                             f"(magic {payload[:2]!r}); PPM/BMP only here, "
                             "JPEG/PNG need libjpeg at deploy time")


def resize_image(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index striding (pure numpy)."""
    h, w = arr.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return arr[ri][:, ci]


def image_features(arr: np.ndarray) -> np.ndarray:
    """32-dim content descriptor: [w/1k, h/1k, mean RGB, std RGB] (8)
    + 4x4 luma thumbnail (16) + 8-bin luma histogram (8)."""
    a = arr.astype(np.float32)
    luma = a @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    thumb = resize_image(luma[..., None], 4, 4)[..., 0] / 255.0
    hist = np.histogram(luma, bins=8, range=(0, 256))[0]
    hist = hist / max(1, luma.size)
    head = [arr.shape[1] / 1000.0, arr.shape[0] / 1000.0,
            *(a.reshape(-1, 3).mean(0) / 255.0),
            *(a.reshape(-1, 3).std(0) / 255.0)]
    return np.concatenate([np.asarray(head, dtype=np.float32),
                           thumb.reshape(-1).astype(np.float32),
                           hist.astype(np.float32)])


# ---------------------------------------------------------------------------
# audio: PCM WAV (stdlib wave)
# ---------------------------------------------------------------------------

def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (mono float32 samples in [-1, 1], sample rate)."""
    if payload[:4] != b"RIFF":
        raise DecoderUnavailable("unsupported audio format "
                                 f"(magic {payload[:4]!r}); PCM WAV only "
                                 "here, MP3/AAC need ffmpeg at deploy time")
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            n_ch, sampwidth, rate = (wf.getnchannels(), wf.getsampwidth(),
                                     wf.getframerate())
            raw = wf.readframes(wf.getnframes())
    except wave.Error as e:
        raise DecoderUnavailable(f"wave: {e}") from e
    if sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2**31
    else:
        raise DecoderUnavailable(f"WAV sample width {sampwidth}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """32-dim: [duration_s, rate/48k, rms, zcr] (4) + 16-segment RMS
    envelope + 12 coarse |FFT| bins (L1-normalized)."""
    n = max(1, len(x))
    rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    head = [n / rate, rate / 48000.0, rms, zcr]
    seg = np.array_split(x, 16)
    env = [float(np.sqrt(np.mean(s**2))) if len(s) else 0.0 for s in seg]
    spec = np.abs(np.fft.rfft(x[:min(len(x), 1 << 14)]))
    bins = np.array([float(b.sum()) for b in np.array_split(spec, 12)],
                    dtype=np.float32)
    tot = bins.sum()
    if tot > 0:
        bins = bins / tot
    return np.concatenate([np.asarray(head, dtype=np.float32),
                           np.asarray(env, dtype=np.float32), bins])


# ---------------------------------------------------------------------------
# video: PPM stream (concatenated P6 frames)
# ---------------------------------------------------------------------------

def sample_video_frames(payload: bytes, n: int = 4) -> list[np.ndarray]:
    """PPM-stream payload → ``n`` evenly-spaced decoded frames."""
    if payload[:2] != b"P6":
        raise DecoderUnavailable("unsupported video format "
                                 f"(magic {payload[:2]!r}); PPM stream only "
                                 "here, MP4/H.264 need ffmpeg at deploy time")
    frames: list[np.ndarray] = []
    off = 0
    while off < len(payload) and payload[off:off + 2] == b"P6":
        arr, off = _ppm_parse_one(payload, off)
        frames.append(arr)
    if not frames:
        raise ValueError("empty PPM stream")
    if len(frames) <= n:
        return frames
    idx = (np.arange(n) * len(frames)) // n
    return [frames[i] for i in idx]


def video_features(frames: list[np.ndarray]) -> np.ndarray:
    return np.mean([image_features(f) for f in frames],
                   axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# feature stage
# ---------------------------------------------------------------------------

def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic digest-seeded stand-in (for embedding-model slots
    that need a GPU model at deploy time)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _real_feature(kind: str, payload: bytes) -> np.ndarray:
    if kind == "image":
        return image_features(decode_image(payload))
    if kind == "audio":
        return audio_features(*decode_audio(payload))
    if kind == "video":
        return video_features(sample_video_frames(payload))
    raise DecoderUnavailable(f"unknown media kind {kind!r}")


def extract_features_stage(df, use_fake_decoder: bool = False):
    """media table → per-item 32-dim features. Decode failures land in
    the ``decode_error`` column (per-row isolation); with
    ``use_fake_decoder`` the digest-seeded stand-in replaces content
    decoding (plumbing tests / embedding-model slot)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "kind": [], "n_bytes": [], "sha256": [],
                   "feature": [], "decode_error": []}
            for url, kind, media in zip(pdf["url"], pdf["kind"],
                                        pdf["media"]):
                payload = bytes(media) if media is not None else b""
                out["url"].append(url)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                try:
                    feat = (_fake_feature(payload) if use_fake_decoder
                            else _real_feature(kind, payload))
                    out["feature"].append([float(x) for x in feat])
                    out["decode_error"].append(None)
                except (DecoderUnavailable, ValueError) as e:
                    out["feature"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return (df.select("url", "kind", "media")
            .mapInPandas(run, schema=FEATURES_SCHEMA))


# ---------------------------------------------------------------------------
# deterministic synthetic media
# ---------------------------------------------------------------------------

def _synth_ppm(i: int, w: int = 32, h: int = 24) -> bytes:
    x = np.arange(w, dtype=np.uint32)
    y = np.arange(h, dtype=np.uint32)[:, None]
    r = ((x + 3 * i) % 256).astype(np.uint8) * np.ones((h, 1), np.uint8)
    g = ((y * (i + 2)) % 256).astype(np.uint8) * np.ones((1, w), np.uint8)
    b = ((x[None, :] + y) * (i + 1) % 256).astype(np.uint8)
    arr = np.stack([r, g, b], axis=-1)
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _synth_bmp(i: int, w: int = 32, h: int = 24) -> bytes:
    arr, _ = _ppm_parse_one(_synth_ppm(i, w, h), 0)
    bgr = arr[:, :, ::-1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pix = rows[::-1].tobytes()  # bottom-up
    header = (b"BM" + (14 + 40 + len(pix)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
              + (2835).to_bytes(4, "little") * 2
              + (0).to_bytes(4, "little") * 2)
    return header + pix


def _synth_wav(i: int, rate: int = 8000, dur_s: float = 0.25) -> bytes:
    t = np.arange(int(rate * dur_s)) / rate
    freq = 220.0 * (1 + (i % 8))
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return bio.getvalue()


def _synth_ppm_stream(i: int, n_frames: int = 6) -> bytes:
    return b"".join(_synth_ppm(i * 10 + f, 16, 12) for f in range(n_frames))


def synth_media_df(spark, n: int = 50, decodable: bool = True):
    """Deterministic media table. ``decodable=True`` emits real
    PPM/BMP/WAV/PPM-stream payloads; ``decodable=False`` emits opaque
    digest bytes (exercises the error-isolation path)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if not decodable:
            payload = hashlib.sha256(f"media:{i}".encode()).digest() * 8
            meta = {"mime": "application/octet-stream", "width": 64,
                    "height": 64, "duration_ms": 1000}
        elif kind == "image":
            payload = _synth_bmp(i) if i % 2 else _synth_ppm(i)
            meta = {"mime": "image/bmp" if i % 2 else "image/x-portable-pixmap",
                    "width": 32, "height": 24, "duration_ms": 0}
        elif kind == "audio":
            payload = _synth_wav(i)
            meta = {"mime": "audio/wav", "width": 0, "height": 0,
                    "duration_ms": 250}
        else:
            payload = _synth_ppm_stream(i)
            meta = {"mime": "application/x-ppm-stream", "width": 16,
                    "height": 12, "duration_ms": 240}
        rows.append((f"https://host/media/{i}", kind, bytearray(payload),
                     meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
