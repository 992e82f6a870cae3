"""FLAC-subset codec (functions/flac_codec.py): lossless round-trips,
spec-structural pins (STREAMINFO fields, MD5, CRCs, the Rice/escape
residual bit format decoded independently of the encoder), and the
loud-failure contract on corrupted streams. No external FLAC
implementation exists in this container, so the bit format is pinned by
hand-built streams checked against the spec's definitions rather than
by interop."""

import hashlib
import struct

import numpy as np
import pytest

from big_data_science_project_spark.functions.flac_codec import (
    _BitReader, _BitWriter, _coded_number_decode, _coded_number_encode,
    _crc8, _crc16, _read_residual, flac_decode, flac_encode)


def _signals():
    rng = np.random.default_rng(20260814)
    return {
        "ramp": (np.arange(5000) % 3000 - 1500).astype(np.int16),
        "sine": (3000 * np.sin(np.arange(9000) / 20)).astype(np.int16),
        "noise": rng.integers(-32768, 32768, 10000).astype(np.int16),
        "const": np.full(6000, -123, dtype=np.int16),
        "tiny": np.array([7, -3, 12], dtype=np.int16),
        "extremes": np.tile(np.array([-32768, 32767], dtype=np.int16), 300),
        "multiframe": (500 * np.sin(np.arange(13000) / 7)).astype(np.int16),
    }


@pytest.mark.parametrize("name", sorted(_signals()))
def test_lossless_roundtrip(name):
    x = _signals()[name]
    out = flac_decode(flac_encode(x))
    assert out.shape == (len(x), 1)
    assert np.array_equal(out[:, 0], x)


def test_compresses_predictable_signals():
    s = _signals()
    for name in ("ramp", "sine", "const"):
        x = s[name]
        assert len(flac_encode(x)) < len(x) * 2 * 0.5, name
    # incompressible noise must not blow up either (escape path)
    assert len(flac_encode(s["noise"])) < len(s["noise"]) * 2 * 1.1


def test_stereo_and_multichannel():
    rng = np.random.default_rng(7)
    for ch in (2, 3, 8):
        x = rng.integers(-2000, 2000, (5000, ch)).astype(np.int16)
        assert np.array_equal(flac_decode(flac_encode(x)), x)


def test_streaminfo_structure_and_md5():
    x = _signals()["sine"]
    b = flac_encode(x, sample_rate=44100)
    assert b[:4] == b"fLaC"
    assert b[4] == 0x80  # last-metadata-block flag + type 0 STREAMINFO
    assert int.from_bytes(b[5:8], "big") == 34
    info = b[8:42]
    # hand-unpack per the spec's bit layout
    min_bs = int.from_bytes(info[0:2], "big")
    max_bs = int.from_bytes(info[2:4], "big")
    assert min_bs == max_bs == 4096
    sr = int.from_bytes(info[10:13], "big") >> 4
    assert sr == 44100
    ch = ((info[12] >> 1) & 0x7) + 1
    assert ch == 1
    bps = (((info[12] & 0x1) << 4) | (info[13] >> 4)) + 1
    assert bps == 16
    total = ((info[13] & 0x0F) << 32) | int.from_bytes(info[14:18], "big")
    assert total == len(x)
    assert info[18:34] == hashlib.md5(x.astype("<i2").tobytes()).digest()


def test_coded_number_roundtrip():
    for n in (0, 1, 127, 128, 500, 4095, 100000, 1 << 20, 1 << 30):
        enc = _coded_number_encode(n)
        assert _coded_number_decode(_BitReader(enc)) == n
        if n < 128:
            assert enc == bytes([n])


def test_crc_bitwise_mirror():
    """Table-driven CRCs == straight bitwise polynomial division."""
    data = bytes(range(256)) + b"flac probe"

    def bitwise(data, poly, width):
        r = 0
        top = 1 << (width - 1)
        mask = (1 << width) - 1
        for byte in data:
            r ^= byte << (width - 8)
            for _ in range(8):
                r = ((r << 1) ^ poly) if r & top else (r << 1)
                r &= mask
        return r

    assert _crc8(data) == bitwise(data, 0x07, 8)
    assert _crc16(data) == bitwise(data, 0x8005, 16)


def test_rice_residual_bit_format():
    """Decode a HAND-BUILT partitioned-Rice residual — pins the wire
    format (method/order/parameter fields, zigzag fold, unary-then-k
    low bits) independently of what the encoder happens to write."""
    res = [0, 1, -1, 5, -7, 100, -100, 3]
    k = 3
    w = _BitWriter()
    w.write(0b00, 2)   # 4-bit rice parameters
    w.write(0, 4)      # partition order 0
    w.write(k, 4)
    for r in res:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        w.write(1, (u >> k) + 1)   # unary: q zeros then a one
        w.write(u, k)
    w.align()
    got = _read_residual(_BitReader(w.bytes()), len(res), 0)
    assert got.tolist() == res


def test_escape_residual_bit_format():
    res = [30000, -30000, 12345, -1]
    w = _BitWriter()
    w.write(0b00, 2)
    w.write(0, 4)
    w.write(0b1111, 4)  # escape
    w.write(16, 5)      # raw width
    for r in res:
        w.write(r, 16)
    w.align()
    got = _read_residual(_BitReader(w.bytes()), len(res), 0)
    assert got.tolist() == res


def test_two_partition_residual():
    """Partition order 1: first partition short by the predictor order."""
    res = list(range(-4, 4))  # 8 residuals, order 2, blocksize 10
    w = _BitWriter()
    w.write(0b00, 2)
    w.write(1, 4)       # 2 partitions of blocksize/2 = 5 samples
    for part in (res[:3], res[3:]):  # first loses `order` samples
        w.write(0b1111, 4)
        w.write(8, 5)
        for r in part:
            w.write(r, 8)
    w.align()
    got = _read_residual(_BitReader(w.bytes()), 10, 2)
    assert got.tolist() == res


def test_corruption_raises():
    # positions under a checksum: magic, metadata sizing, frame header
    # (CRC-8), frame payload (CRC-16). STREAMINFO scalar fields (e.g.
    # the sample-rate bits) carry NO checksum in the spec — a flip
    # there is legitimately silent, so none is probed here.
    b = flac_encode(_signals()["sine"])
    for pos in (2, 6, 43, 50, len(b) // 2, len(b) - 3):
        bad = bytearray(b)
        bad[pos] ^= 0x40
        with pytest.raises(ValueError):
            flac_decode(bytes(bad))
    with pytest.raises(ValueError):
        flac_decode(b[: len(b) // 2])  # truncation


def test_input_contract():
    with pytest.raises(ValueError):
        flac_encode(np.zeros(10, dtype=np.float32))
    with pytest.raises(ValueError):
        flac_encode(np.zeros((10, 9), dtype=np.int16))  # >8 channels
    with pytest.raises(ValueError):
        flac_encode(np.zeros(0, dtype=np.int16))
    # STREAMINFO's rate field is 20 bits: 0 and >= 2^20 must fail at
    # encode time, not decode time
    with pytest.raises(ValueError):
        flac_encode(np.zeros(10, dtype=np.int16), sample_rate=0)
    with pytest.raises(ValueError):
        flac_encode(np.zeros(10, dtype=np.int16), sample_rate=1 << 20)
    flac_decode(flac_encode(np.zeros(10, dtype=np.int16),
                            sample_rate=(1 << 20) - 1))  # max valid rate


def test_frame_crc16_covers_whole_frame():
    """The last two bytes of a single-frame stream are the CRC-16 of
    everything from the sync code on — recompute it from the raw
    bytes."""
    x = _signals()["tiny"]
    b = flac_encode(x)
    frame = b[42:]  # after fLaC + 4-byte header + 34-byte STREAMINFO
    assert frame[0] == 0xFF and (frame[1] & 0xFC) == 0xF8  # sync
    (crc,) = struct.unpack(">H", frame[-2:])
    assert _crc16(frame[:-2]) == crc
