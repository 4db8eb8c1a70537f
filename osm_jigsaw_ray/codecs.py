"""Pure-stdlib media codecs for the multimodal stages.

The sandbox ships no codec library (PIL / cv2 / imageio / soundfile /
av all absent — probed and recorded in BENCH_RESULTS.md), but two real
interchange formats need nothing beyond the standard library:

* **PNG** — zlib inflate + the five scanline filters (public spec,
  RFC 2083). Supported: 8-bit depth, color types 0 (gray), 2 (RGB),
  4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else raises
  ``NotImplementedError`` (honest seam, same contract as the fake
  codec for JPEG et al.).
* **WAV** — RIFF PCM via the stdlib ``wave`` module (16-bit PCM).

These make ``stages/multimodal.py``'s decode path REAL for one image
and one audio format; heavier formats (JPEG/MP3/MP4) still need a
native backend and keep the documented ``NotImplementedError``.

The filter reconstruction loops over scanlines with numpy math per
row; filters with a left-pixel dependency (Sub/Average/Paeth) fall
back to a per-pixel loop on that row only. Fine for the metadata /
feature extraction these stages do; a production image pipeline would
swap in a native codec behind the same ``DecodeBackend`` seam.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
RIFF_MAGIC = b"RIFF"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def is_wav(payload: bytes) -> bool:
    return payload[:4] == RIFF_MAGIC and payload[8:12] == b"WAVE"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, c) uint8 array → PNG bytes (filter 0 rows,
    one IDAT). The test-side twin of :func:`decode_png`."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Reverse the PNG scanline filters; returns (h, w, c) uint8."""
    stride = w * c
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        f = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int64)
        prev = out[r - 1].astype(np.int64) if r else np.zeros(stride, np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left dependency
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                if f == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                    cur[i] = (line[i] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[r] = cur.astype(np.uint8)
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 pixel array (8-bit, non-interlaced,
    color types 0/2/4/6)."""
    if not is_png(payload):
        raise NotImplementedError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise NotImplementedError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} needs a native codec"
        )
    c = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    expected = height * (1 + width * c)
    if raw.size != expected:
        raise NotImplementedError(
            f"PNG stream size {raw.size} != expected {expected}"
        )
    return _unfilter(raw, height, width, c)


def png_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from IHDR — no inflate (metadata-only scans)."""
    if not is_png(payload) or payload[12:16] != b"IHDR":
        raise NotImplementedError("not a PNG payload")
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples [n, channels] flattened mono-first,
    sample_rate). 16-bit PCM only (the stdlib module's native case)."""
    if not is_wav(payload):
        raise NotImplementedError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV sample width {w.getsampwidth()} needs a native codec"
            )
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").astype(np.int16)
    return samples, int(rate)
