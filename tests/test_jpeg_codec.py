"""Baseline JPEG codec (functions/jpeg_codec.py): bitstream structure,
round-trip error bounds, and — the strong pin — bit-exact agreement of
decode(encode(x)) with an independent per-block quantization mirror
that never touches the bitstream, proving the Huffman/marker layer is
lossless around the DCT quantizer."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_science_project_spark.functions.jpeg_codec import (
    _A, _QL, _UNZZ, _ZZ, _quality_scale, jpeg_decode, jpeg_encode)


def _quant_mirror_gray(img: np.ndarray, quality: int) -> np.ndarray:
    """Independent decode prediction: pad→DCT→quantize→dequantize→IDCT
    per block, no entropy coding at all."""
    q = _quality_scale(_QL, quality).astype(np.float64)
    h, w = img.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(img.astype(np.float64), ((0, ph), (0, pw)), mode="edge")
    out = np.zeros_like(p)
    for my in range(p.shape[0] // 8):
        for mx in range(p.shape[1] // 8):
            b = p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] - 128.0
            coef = _A @ b @ _A.T
            zzq = np.rint(coef / q).astype(np.int64)
            rec = _A.T @ (zzq * q.astype(np.int64)).astype(np.float64) @ _A \
                + 128.0
            out[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = rec
    return np.clip(np.rint(out[:h, :w]), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("seed,quality", [(0, 90), (1, 50), (2, 95), (3, 10)])
def test_decode_equals_quant_mirror_exactly(seed, quality):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (19, 26)).astype(np.uint8)
    got = jpeg_decode(jpeg_encode(img, quality))
    want = _quant_mirror_gray(img, quality)
    assert np.array_equal(got, want)


def test_constant_image_roundtrips_exactly():
    img = np.full((16, 24), 77, dtype=np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(img, 90)), img)


def test_smooth_image_error_small():
    yy, xx = np.mgrid[0:24, 0:17]
    img = np.clip(yy * 5 + xx * 3, 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, 95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_noise_error_bounded_by_quality():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    e95 = np.abs(jpeg_decode(jpeg_encode(img, 95)).astype(int)
                 - img.astype(int))
    e10 = np.abs(jpeg_decode(jpeg_encode(img, 10)).astype(int)
                 - img.astype(int))
    assert e95.mean() < 4
    assert e95.mean() < e10.mean()  # lower quality → more error


def test_rgb_roundtrip_shape_and_bound():
    yy, xx = np.mgrid[0:20, 0:17]
    rgb = np.stack([np.clip(yy * 7, 0, 255), np.clip(xx * 9, 0, 255),
                    np.full((20, 17), 128)], axis=-1).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(rgb, 95))
    assert dec.shape == (20, 17, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 6


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_restart_markers_change_nothing(ri):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 33)).astype(np.uint8)
    with_ri = jpeg_encode(img, 90, restart_interval=ri)
    assert b"\xFF\xDD" in with_ri  # DRI present
    assert np.array_equal(jpeg_decode(with_ri),
                          jpeg_decode(jpeg_encode(img, 90)))


def test_marker_structure_walk():
    """Every segment between SOI and SOS is a well-formed marker with a
    correct length field, in the expected order."""
    img = np.zeros((8, 8), dtype=np.uint8)
    data = jpeg_encode(img, 90)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    pos, seen = 2, []
    while True:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seen.append(marker)
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xDA:
            break
        pos += 2 + ln
    assert seen[0] == 0xE0                      # APP0/JFIF first
    assert seen.count(0xDB) == 1                # one quant table (gray)
    assert seen.count(0xC4) == 2                # DC + AC Huffman
    assert 0xC0 in seen                         # SOF0 baseline


def test_zigzag_is_an_involution_pair():
    v = np.arange(64)
    assert np.array_equal(v[_ZZ][_UNZZ], v)


def test_unsupported_streams_raise():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(jpeg_encode(img, 90))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x01\x02")
    # flip SOF0 → SOF2 (progressive)
    i = bytes(data).index(b"\xFF\xC0")
    prog = bytes(data[:i]) + b"\xFF\xC2" + bytes(data[i + 2:])
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        jpeg_decode(prog)
    # claim 2x2 subsampling in the SOF component spec
    sub = bytearray(data)
    sub[i + 2 + 2 + 6 + 1] = 0x22  # marker+len+prec..+comp sampling byte
    with pytest.raises(ValueError, match="subsampled"):
        jpeg_decode(bytes(sub))


def test_corrupt_entropy_data_always_raises_valueerror():
    """Bit-corrupted or truncated scan data must surface as the
    module's ValueError contract — never a leaked IndexError or the
    internal marker-signal exception. Exhaustively corrupt every byte
    of the entropy segment (and truncate at every length) of a real
    stream; each decode either succeeds (corruption landed on a
    tolerated spot) or raises ValueError."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    data = jpeg_encode(img, 75)
    # corrupt EVERY byte after SOI — header segments (DQT/DHT/SOF/SOS
    # field parsing) included, not just the entropy region
    for i in range(2, len(data) - 2):
        corrupted = bytearray(data)
        corrupted[i] ^= 0x55
        try:
            jpeg_decode(bytes(corrupted))
        except ValueError:
            pass
    # truncate at every length, header region included
    for end in range(2, len(data) - 2):
        try:
            jpeg_decode(bytes(data[:end]))
        except ValueError:
            pass


def test_sos_before_sof_raises_cleanly():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = jpeg_encode(img, 90)
    # excise the SOF0 segment entirely
    i = data.index(b"\xFF\xC0")
    (ln,) = struct.unpack_from(">H", data, i + 2)
    cut = data[:i] + data[i + 2 + ln:]
    with pytest.raises(ValueError, match="missing SOF"):
        jpeg_decode(cut)
