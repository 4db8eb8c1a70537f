"""Multimodal column stages: image/audio payloads as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment — see repo instructions): ``DecodeBackend.decode_image``
raises ``NotImplementedError`` unless a real backend import succeeds, and
the deterministic ``FakeImageCodec`` stands in for tests. Everything
Ray-side — schema contract, actor signature, batch sizing, output layout
— is real and tested, so swapping in a real codec is a one-class change.

Schema contract:
    input:  ``media_id: int64, payload: binary, media_type: string``
    decode: adds ``width: int32, height: int32, n_bytes: int64``
    feats:  adds ``features: list<float>`` (fixed dim)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

FAKE_MAGIC = b"FIMG"


def encode_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image payload: magic + dims + seeded pixels."""
    rng = np.random.RandomState(media_id % (2**31))
    pixels = rng.randint(0, 256, size=min(width * height, 256), dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


class DecodeBackend:
    """Real-codec seam: tries PIL at init; otherwise only the fake
    format decodes and anything else raises NotImplementedError."""

    def __init__(self):
        try:  # pragma: no cover - not installed in this environment
            from PIL import Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def decode_image(self, payload: bytes) -> tuple[int, int]:
        if payload[:4] == FAKE_MAGIC:
            w, h = struct.unpack("<II", payload[4:12])
            return int(w), int(h)
        if not self.has_pil:
            raise NotImplementedError(
                "real image decode requires PIL; this environment ships none "
                "(stub per repo instructions)"
            )
        raise NotImplementedError("real codec path not exercised in sandbox")


class ImageDecoder:
    """Actor-pool stage: backend loads once per actor; decodes per batch.
    Keep ``batch_size`` small for wide binary payloads (SURVEY.md §7.4)."""

    def __init__(self):
        self.backend = DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, sizes = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h = self.backend.decode_image(payload)
            widths.append(w)
            heights.append(h)
            sizes.append(len(payload))
        out = batch.drop_columns(["payload"])  # decoded: drop the heavy bytes
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("n_bytes", pa.array(sizes, pa.int64()))
        return out


class ImageFeaturizer:
    """Actor-pool stage: deterministic 8-dim feature vector from payload
    bytes (the model-inference stand-in; batched like real inference)."""

    DIM = 8

    def __init__(self):
        self.backend = DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            w, h = self.backend.decode_image(payload)
            body = np.frombuffer(payload[12:], dtype=np.uint8).astype(np.float32)
            if body.size < self.DIM:
                body = np.pad(body, (0, self.DIM - body.size))
            chunks = np.array_split(body, self.DIM)
            vec = np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)
            feats.append((vec / 255.0).tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


def decode_images(
    media: rd.Dataset, *, concurrency: int | tuple = 2, batch_size: int = 256
) -> rd.Dataset:
    return media.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def featurize_images(
    media: rd.Dataset, *, concurrency: int | tuple = 2, batch_size: int = 256
) -> rd.Dataset:
    return media.map_batches(
        ImageFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
