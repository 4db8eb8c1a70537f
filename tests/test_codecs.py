"""Pure-stdlib PNG/WAV codecs + their multimodal-stage wiring.

The PNG tests pin the decoder against a forward-filter reference
implemented here from the spec (RFC 2083 §6): encode with each filter
type, decode with the engine, compare rasters. The stage tests run the
REAL decode through the same Ray actor-pool plumbing the mm_* oracles
pin on the fake codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from osm_jigsaw_ray import codecs


def _rng(seed=0):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# PNG round trips (filter 0 encoder)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(3, 4), (3, 4, 2), (5, 7, 3), (5, 7, 4), (1, 1)])
def test_png_roundtrip_all_color_types(shape):
    px = _rng(1).randint(0, 256, size=shape, dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(px))
    want = px if px.ndim == 3 else px[:, :, None]
    assert np.array_equal(out, want)


def test_png_dimensions_no_inflate():
    px = _rng(2).randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert codecs.png_dimensions(codecs.encode_png(px)) == (13, 9)


def _forward_filter(px: np.ndarray, filters: list[int]) -> bytes:
    """Spec-side PNG scanline filtering (the encoder's side of RFC 2083
    §6.2-6.6) — the independent reference the decoder is checked
    against."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int64)
    out = bytearray()
    for r in range(h):
        f = filters[r % len(filters)]
        out.append(f)
        prev = flat[r - 1] if r else np.zeros(stride, np.int64)
        cur = flat[r]
        for i in range(stride):
            a = cur[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            out.append((cur[i] - pred) & 0xFF)
    return bytes(out)


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """A syntactically-complete PNG whose IDAT uses the given per-row
    filter cycle (the stdlib encoder only emits filter 0)."""
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = _forward_filter(px, filters)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        codecs.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_unfilter_matches_spec_reference(filters):
    px = _rng(3).randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    out = codecs.decode_png(_png_with_filters(px, filters))
    assert np.array_equal(out, px)


def test_png_unsupported_raises():
    # 16-bit depth: honest NotImplementedError, not a wrong decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    bad = codecs.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        codecs.decode_png(bad)


def test_wav_roundtrip():
    s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    payload = codecs.encode_wav(s, sample_rate=22050)
    got, rate = codecs.decode_wav(payload)
    assert rate == 22050 and np.array_equal(got, s)


# ---------------------------------------------------------------------------
# stage wiring: the REAL decode through the same Ray plumbing
# ---------------------------------------------------------------------------

def _png_media_ds(sizes):
    import ray.data as rd

    payloads = [
        codecs.encode_png(
            _rng(i).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        )
        for i, (w, h) in enumerate(sizes)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(len(sizes)), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["image/png"] * len(sizes), pa.string()),
            }
        )
    )


def test_decode_images_real_png(ray_session):
    from osm_jigsaw_ray.stages.multimodal import decode_images

    sizes = [(4, 3), (60, 40), (7, 7)]
    out = decode_images(_png_media_ds(sizes)).to_pandas().sort_values("media_id")
    assert list(zip(out["width"], out["height"])) == sizes
    assert "payload" not in out.columns


def test_decode_images_mixed_fake_and_png(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.stages.multimodal import decode_images, encode_fake_image

    png = codecs.encode_png(_rng(5).randint(0, 256, (8, 6, 3), np.uint8))
    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array(
                    [encode_fake_image(0, 32, 16), png], pa.binary()
                ),
                "media_type": pa.array(["image/fake", "image/png"], pa.string()),
            }
        )
    )
    out = decode_images(ds).to_pandas().sort_values("media_id")
    assert list(zip(out["width"], out["height"])) == [(32, 16), (6, 8)]


def test_featurize_real_png_matches_numpy(ray_session):
    from osm_jigsaw_ray.stages.multimodal import featurize_images

    px = _rng(6).randint(0, 256, size=(10, 9, 3), dtype=np.uint8)
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0], pa.int64()),
                "payload": pa.array([codecs.encode_png(px)], pa.binary()),
                "media_type": pa.array(["image/png"], pa.string()),
            }
        )
    )
    feats = featurize_images(ds).to_pandas()["features"].iloc[0]
    body = px.reshape(-1).astype(np.float32)
    want = [c.mean() / 255.0 for c in np.array_split(body, 8)]
    assert np.allclose(feats, want, atol=1e-6)


def test_resize_real_png(ray_session):
    from osm_jigsaw_ray.stages.multimodal import resize_images

    out = (
        resize_images(_png_media_ds([(64, 48)]), max_side=16)
        .to_pandas()
        .iloc[0]
    )
    assert (out["width"], out["height"]) == (16, 12)
    px = codecs.decode_png(out["payload"])
    assert px.shape == (12, 16, 3)
    # nearest-neighbor of the corner pixels survives the resize
    src = codecs.decode_png(_png_media_ds([(64, 48)]).take(1)[0]["payload"])
    assert np.array_equal(px[0, 0], src[0, 0])
    assert np.array_equal(px[-1, -1], src[-1, -1])


def test_audio_features_real_wav(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.stages.multimodal import audio_features

    s = _rng(7).randint(-(2**15), 2**15, size=1600, dtype=np.int16)
    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0], pa.int64()),
                "payload": pa.array(
                    [codecs.encode_wav(s, sample_rate=16000)], pa.binary()
                ),
                "media_type": pa.array(["audio/wav"], pa.string()),
            }
        )
    )
    out = audio_features(ds).to_pandas().iloc[0]
    s64 = s.astype(np.int64)
    assert out["duration_s"] == pytest.approx(0.1)
    assert out["rms"] == int(np.floor(np.sqrt((s64**2).mean())))
    assert out["zero_crossings"] == int((np.diff(np.sign(s64)) != 0).sum())


def test_unknown_codec_still_raises(ray_session):
    from osm_jigsaw_ray.stages.multimodal import DecodeBackend

    jpegish = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(NotImplementedError):
        DecodeBackend().decode_image(jpegish)
