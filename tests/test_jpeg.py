"""Baseline JPEG codec (ops/jpeg.py, ITU-T T.81) — round-trip PSNR,
marker framing, rejection paths, and the media-pipeline plumbing."""

import struct

import numpy as np
import pytest

from elasticsearch_ray.ops.jpeg import (
    ZIGZAG,
    _canonical_codes,
    _DC_LUM,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_is_spec_order():
    # First diagonal steps of the T.81 A.3.6 scan over raster indices.
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG) == list(range(64))


def test_canonical_codes_prefix_free():
    codes = _canonical_codes(*_DC_LUM)
    assert len(codes) == 12
    strs = [format(c, f"0{ln}b") for c, ln in codes.values()]
    for i, s in enumerate(strs):
        for j, t in enumerate(strs):
            if i != j:
                assert not t.startswith(s)


def test_gray_round_trip_psnr():
    y, x = np.mgrid[0:37, 0:53]  # non-multiples of 8 exercise padding
    img = ((np.sin(x / 9.0) + np.cos(y / 7.0)) * 60 + 128).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > 40


def test_color_round_trip_psnr():
    y, x = np.mgrid[0:24, 0:31]
    img = np.stack(
        [
            (np.sin(x / 11.0) * 60 + 128),
            (np.cos(y / 5.0) * 50 + 120),
            (x + y) % 200 + 20,
        ],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(img, out) > 38


def test_flat_image_exact_and_noise_exercises_zrl():
    flat = np.full((16, 16), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 95)), flat)
    # high-quality noise produces isolated high-frequency coefficients →
    # long zero runs → ZRL symbols on both encode and decode
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, 95))
    assert out.shape == noise.shape
    assert _psnr(noise, out) > 25


def test_quality_monotonic_size():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (48, 48, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_decoder_uses_stream_dht_and_byte_stuffing():
    """The decoder rebuilds Huffman trees from the payload's own DHT
    segments, and stuffed 0xFF 0x00 bytes survive the scan."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (32, 40), dtype=np.uint8)
    payload = encode_jpeg(img, 85)
    scan = payload[payload.index(b"\xff\xda") :]
    assert b"\xff\x00" in scan  # stuffing actually occurred
    out = decode_jpeg(payload)
    assert _psnr(img, out) > 25


def test_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"PNG not a jpeg")
    with pytest.raises(ValueError, match="gray or RGB"):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    # progressive: swap SOF0 (0xC0) marker for SOF2 (0xC2)
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(prog)
    # chroma subsampling: patch the SOF h/v sampling byte of component 1
    i = good.index(b"\xff\xc0")
    body = bytearray(good)
    assert body[i + 11] == 0x11
    body[i + 11] = 0x22
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg(bytes(body))
    # restart interval marker (DRI)
    dri = good[:2] + b"\xff\xdd" + struct.pack(">HH", 4, 8) + good[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(dri)
    # truncated inside a header segment
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:-12])
    # truncated inside the entropy stream (real scan data)
    rng = np.random.RandomState(2)
    big = encode_jpeg(rng.randint(0, 256, (40, 40), dtype=np.uint8), 90)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(big[: len(big) // 2])


def test_single_channel_3d_input():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == (8, 8)
    assert _psnr(img[:, :, 0], out) > 35


def test_jpeg_through_dispatcher_and_encode_like():
    from elasticsearch_ray.ops.multimodal import _encode_like, decode_image

    y, x = np.mgrid[0:16, 0:20]
    img = np.stack([x * 7 % 256, y * 9 % 256, (x + y) % 256], axis=2).astype(
        np.uint8
    )
    payload = encode_jpeg(img, 92)
    via = decode_image(payload)
    assert via.shape == (1, 16, 20, 3)
    re = _encode_like(payload, via)
    assert re[:2] == b"\xff\xd8"
    again = decode_image(re)
    assert again.shape == (1, 16, 20, 3)
    assert _psnr(via, again) > 35


def test_jpeg_through_media_pipeline(ray_session):
    import pyarrow as _pa
    import ray

    from elasticsearch_ray.ops.multimodal import media_pipeline

    rng = np.random.RandomState(11)
    rows = []
    for i in range(6):
        h, w = int(rng.randint(9, 24)), int(rng.randint(9, 24))
        a = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append(
            {
                "media_id": i,
                "mime": "image/jpeg",
                "width": w,
                "height": h,
                "n_frames": 1,
                "payload": encode_jpeg(a, 85),
            }
        )
    t = _pa.Table.from_pylist(rows)
    out = media_pipeline(
        ray.data.from_arrow(t), out_h=8, out_w=8, dim=8
    ).to_pandas()
    assert len(out) == 6
    assert all(len(e) == 8 for e in out["embedding"])
