"""Multimodal column stages: image/audio payloads as opaque ``binary``
columns with typed metadata.

Decode backends, in order of preference per payload:

* **PNG / WAV** — REAL decodes via the pure-stdlib codecs in
  ``osm_jigsaw_ray.codecs`` (zlib inflate + PNG scanline unfilter;
  stdlib ``wave`` PCM): no external codec library needed, so these two
  interchange formats work in any environment.
* **FIMG/FVID/FAUD fake payloads** — the deterministic test codec (its
  numeric features are SQL-oracle-recomputable, which PNG inflate is
  not — so the strict ``mm_*`` oracles pin the Ray plumbing on fakes
  while the PNG/WAV tests pin the real decode).
* **JPEG / MP3 / MP4 / ...** — still need a native backend (PIL is
  probed at actor init; absent in this environment) and raise
  ``NotImplementedError`` behind the same documented seam.

Everything Ray-side — schema contract, actor signature, batch sizing,
output layout — is identical across the three, so a native codec is a
one-class swap.

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

from .. import codecs

FAKE_MAGIC = b"FIMG"


def encode_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image payload: magic + dims + seeded pixels."""
    rng = np.random.RandomState(media_id % (2**31))
    pixels = rng.randint(0, 256, size=min(width * height, 256), dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


class DecodeBackend:
    """Codec seam: PNG decodes via the stdlib codec, the FIMG fake via
    header math, anything else probes PIL at init (absent here) and
    raises NotImplementedError."""

    def __init__(self):
        try:  # pragma: no cover - not installed in this environment
            from PIL import Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def decode_image(self, payload: bytes) -> tuple[int, int]:
        """(width, height) — metadata-only: PNG reads IHDR, no inflate."""
        if payload[:4] == FAKE_MAGIC:
            w, h = struct.unpack("<II", payload[4:12])
            return int(w), int(h)
        if codecs.is_png(payload):
            return codecs.png_dimensions(payload)
        if not self.has_pil:
            raise NotImplementedError(
                "this payload needs a native codec (PIL/ffmpeg); PNG and "
                "the FIMG fake decode without one"
            )
        raise NotImplementedError("real codec path not exercised in sandbox")

    def pixel_bytes(self, payload: bytes) -> np.ndarray:
        """Flat uint8 pixel view for feature extraction: the full
        unfiltered raster for PNG, the seeded sample block for FIMG."""
        if payload[:4] == FAKE_MAGIC:
            return np.frombuffer(payload[12:], dtype=np.uint8)
        if codecs.is_png(payload):
            return codecs.decode_png(payload).reshape(-1)
        raise NotImplementedError(
            "this payload needs a native codec (PIL/ffmpeg); PNG and "
            "the FIMG fake decode without one"
        )


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
            body = self.backend.pixel_bytes(payload).astype(np.float32)
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


# ---------------------------------------------------------------------------
# resize / video frame-sample / audio features — same stub-codec seam
# ---------------------------------------------------------------------------

class ImageResizer:
    """Actor-pool stage: payload → resized payload (``max_side`` cap,
    aspect preserved). The fake codec 'resizes' by rewriting the header
    dims and resampling the seeded pixel block deterministically; a real
    backend slots into :class:`DecodeBackend` unchanged. Output keeps
    the schema contract (payload column replaced in place + new dims)."""

    def __init__(self, max_side: int = 32):
        self.backend = DecodeBackend()
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, widths, heights = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h = self.backend.decode_image(payload)
            scale = min(1.0, self.max_side / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            if codecs.is_png(payload):
                # REAL resize: nearest-neighbor index grid over the
                # decoded raster, re-encoded as PNG
                px = codecs.decode_png(payload)
                ri = np.linspace(0, px.shape[0] - 1, nh).round().astype(np.int64)
                ci = np.linspace(0, px.shape[1] - 1, nw).round().astype(np.int64)
                out_payloads.append(codecs.encode_png(px[ri][:, ci]))
            else:
                body = np.frombuffer(payload[12:], dtype=np.uint8)
                n_out = min(nw * nh, 256)
                idx = (
                    np.linspace(0, max(body.size - 1, 0), n_out).astype(np.int64)
                    if body.size
                    else np.zeros(n_out, dtype=np.int64)
                )
                resampled = body[idx] if body.size else np.zeros(n_out, np.uint8)
                out_payloads.append(
                    FAKE_MAGIC + struct.pack("<II", nw, nh) + resampled.tobytes()
                )
            widths.append(nw)
            heights.append(nh)
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload", pa.array(out_payloads, pa.binary()))
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        return out


FAKE_VIDEO_MAGIC = b"FVID"


def encode_fake_video(media_id: int, n_frames: int, width: int, height: int) -> bytes:
    """Deterministic fake video payload: magic + frame count + dims +
    one seeded byte per frame (stands in for the frame stream)."""
    rng = np.random.RandomState(media_id % (2**31))
    frames = rng.randint(0, 256, size=n_frames, dtype=np.uint8)
    return (
        FAKE_VIDEO_MAGIC
        + struct.pack("<III", n_frames, width, height)
        + frames.tobytes()
    )


class VideoFrameSampler:
    """Actor-pool flat-map stage: one row per sampled frame (every
    ``stride``-th), payload dropped after sampling — the decode seam is
    the same stub contract as images. Output schema:
    (media_id, frame_index, frame_value, width, height)."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, fval, ws, hs = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if payload[:4] != FAKE_VIDEO_MAGIC:
                raise NotImplementedError(
                    "real video decode requires ffmpeg; this environment "
                    "ships none (stub per repo instructions)"
                )
            n, w, h = struct.unpack("<III", payload[4:16])
            frames = np.frombuffer(payload[16 : 16 + n], dtype=np.uint8)
            take = np.arange(0, n, self.stride, dtype=np.int64)
            ids.extend([mid] * take.size)
            fidx.extend(take.tolist())
            fval.extend(frames[take].tolist())
            ws.extend([w] * take.size)
            hs.extend([h] * take.size)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int64()),
                "frame_value": pa.array(fval, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )


FAKE_AUDIO_MAGIC = b"FAUD"


def encode_fake_audio(media_id: int, n_samples: int, sample_rate: int = 16000) -> bytes:
    """Deterministic fake audio payload: magic + sample count + rate +
    seeded int16 samples."""
    rng = np.random.RandomState(media_id % (2**31))
    samples = rng.randint(-(2**15), 2**15, size=n_samples, dtype=np.int16)
    return (
        FAKE_AUDIO_MAGIC
        + struct.pack("<II", n_samples, sample_rate)
        + samples.tobytes()
    )


class AudioFeaturizer:
    """Actor-pool stage: payload → (duration_s, rms, zero_crossings) —
    the audio-analysis stand-in; numeric features are exact integer /
    fixed arithmetic so a SQL oracle can recompute them."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zc = [], [], []
        for payload in batch["payload"].to_pylist():
            if codecs.is_wav(payload):
                # REAL decode: stdlib RIFF/PCM reader (16-bit)
                samples16, rate = codecs.decode_wav(payload)
                samples = samples16.astype(np.int64)
                n = samples.size
            elif payload[:4] == FAKE_AUDIO_MAGIC:
                n, rate = struct.unpack("<II", payload[4:12])
                samples = np.frombuffer(
                    payload[12 : 12 + 2 * n], dtype=np.int16
                ).astype(np.int64)
            else:
                raise NotImplementedError(
                    "this audio payload needs a native backend; WAV (PCM16) "
                    "and the FAUD fake decode without one"
                )
            dur.append(n / rate)
            rms.append(
                int(np.floor(np.sqrt((samples**2).mean() if n else 0.0)))
            )
            zc.append(int((np.diff(np.sign(samples)) != 0).sum()) if n > 1 else 0)
        out = batch.drop_columns(["payload"])
        out = out.append_column("duration_s", pa.array(dur, pa.float64()))
        out = out.append_column("rms", pa.array(rms, pa.int64()))
        out = out.append_column("zero_crossings", pa.array(zc, pa.int64()))
        return out


def resize_images(
    media: rd.Dataset, *, max_side: int = 32, concurrency: int | tuple = 2,
    batch_size: int = 256,
) -> rd.Dataset:
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    media: rd.Dataset, *, stride: int = 10, concurrency: int | tuple = 2,
    batch_size: int = 64,
) -> rd.Dataset:
    return media.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(
    media: rd.Dataset, *, concurrency: int | tuple = 2, batch_size: int = 256
) -> rd.Dataset:
    return media.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
