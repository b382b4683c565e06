"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages. The *decode* kernels (image decode, resize, audio resample,
video frame-sample) depend on codec libraries that are not present in
this environment — they are stubbed behind ``DecoderUnavailable`` /
deterministic fakes, while everything Spark-side (schema, batching,
partitioning, UDF signatures, output shapes) is real and tested.

Layout follows the documents table convention: payloads come in as
``(url, kind, media, meta)`` where ``media`` is the raw bytes.
"""

from __future__ import annotations

import hashlib
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
    """Raised by real decode kernels; the codec libraries (PIL/ffmpeg/
    torchaudio) are not installed in this container."""


def decode_image(payload: bytes) -> "np.ndarray":
    raise DecoderUnavailable("image decode requires PIL/libjpeg; "
                             "install at deploy time")


def decode_audio(payload: bytes) -> "np.ndarray":
    raise DecoderUnavailable("audio decode requires ffmpeg/torchaudio")


def sample_video_frames(payload: bytes, n: int = 4) -> "list[np.ndarray]":
    raise DecoderUnavailable("video frame sampling requires ffmpeg")


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature: seeded by the payload digest, so
    the full pipeline (schema, batching, downstream ANN) is exercisable
    without codecs. Swap for a real embedding model at deploy time."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features_stage(df, use_fake_decoder: bool = True):
    """media table → per-item features. Real decode path raises
    DecoderUnavailable into the ``decode_error`` column (per-row failure
    isolation, the reference's try/except-continue pattern,
    rdf_extract.py:861-869); the deterministic fake keeps plumbing
    testable."""

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
                    if use_fake_decoder:
                        feat = _fake_feature(payload)
                    else:
                        if kind == "image":
                            decode_image(payload)
                        elif kind == "audio":
                            decode_audio(payload)
                        else:
                            sample_video_frames(payload)
                        feat = _fake_feature(payload)
                    out["feature"].append([float(x) for x in feat])
                    out["decode_error"].append(None)
                except DecoderUnavailable as e:
                    out["feature"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return (df.select("url", "kind", "media")
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def synth_media_df(spark, n: int = 50):
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * 8
        rows.append((f"https://host/media/{i}", kinds[i % 3],
                     bytearray(payload),
                     {"mime": "application/octet-stream", "width": 64,
                      "height": 64, "duration_ms": 1000}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
