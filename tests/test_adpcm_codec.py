"""IMA-ADPCM codec tests: spec constants, an INDEPENDENT transliteration
of the IMA recommendation's per-sample pseudocode (encoder and decoder,
written straight from the published step rules — not by importing the
codec's helpers), container error contract, and round-trip quality.

The mirror is the same verification pattern as test_jpeg_codec.py's
quantization mirror: oracle-style equality against separately-written
spec code, so a bug in the codec's shared `_step_one` cannot hide by
being used on both sides of its own test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_science_project_spark.functions.adpcm_codec import (
    INDEX_TABLE, STEP_TABLE, adpcm_decode, adpcm_encode,
    adpcm_sample_rate)


# ---------------------------------------------------------------------------
# independent per-sample mirror (IMA 1992 pseudocode, transliterated)
# ---------------------------------------------------------------------------
_STEPS = STEP_TABLE  # the table IS the published constant; shared on purpose


def _mirror_encode(samples, predictor, index):
    """Spec encoder: quantize delta by successive approximation, then
    advance predictor/index exactly as the decoder will."""
    codes = []
    for s in samples:
        step = _STEPS[index]
        delta = s - predictor
        code = 0
        if delta < 0:
            code, delta = 8, -delta
        temp = step
        if delta >= temp:
            code |= 4
            delta -= temp
        temp >>= 1
        if delta >= temp:
            code |= 2
            delta -= temp
        temp >>= 1
        if delta >= temp:
            code |= 1
        codes.append(code)
        predictor, index = _mirror_step(code, predictor, index)
    return codes


def _mirror_step(code, predictor, index):
    step = _STEPS[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    predictor = predictor - diff if code & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + INDEX_TABLE[code]))
    return predictor, index


def _mirror_decode(codes, predictor, index):
    out = [predictor]
    for c in codes:
        predictor, index = _mirror_step(c, predictor, index)
        out.append(predictor)
    return out


def _parse_header(enc):
    ch, sr, n = struct.unpack(">BIQ", enc[4:17])
    states = []
    pos = 17
    for _ in range(ch):
        states.append(struct.unpack(">hB", enc[pos:pos + 3]))
        pos += 3
    return ch, sr, n, states, pos


def _unpack_nibbles(body, count):
    out = []
    for byte in body:
        out.append(byte & 0xF)
        out.append(byte >> 4)
    return out[:count]


# ---------------------------------------------------------------------------
# spec constants
# ---------------------------------------------------------------------------
def test_published_tables():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[:5] == (7, 8, 9, 10, 11)
    assert STEP_TABLE[-1] == 32767
    # ~1.1 geometric growth, strictly increasing
    assert all(b > a for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))
    assert len(INDEX_TABLE) == 16
    assert INDEX_TABLE[:8] == (-1, -1, -1, -1, 2, 4, 6, 8)
    assert INDEX_TABLE[8:] == INDEX_TABLE[:8]  # sign bit doesn't change it


# ---------------------------------------------------------------------------
# codec == independent mirror, bit for bit
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_stream_matches_spec_mirror(seed):
    rng = np.random.default_rng(seed)
    kind = seed % 4
    n = 501 + seed  # odd/even lengths
    if kind == 0:
        x = (4000 * np.sin(np.arange(n) / 5.0)).astype(np.int16)
    elif kind == 1:
        x = rng.integers(-32768, 32768, n).astype(np.int16)
    elif kind == 2:
        x = np.zeros(n, dtype=np.int16)
        x[n // 2:] = 30000  # step edge
    else:
        x = np.cumsum(rng.integers(-500, 501, n)).clip(
            -32768, 32767).astype(np.int16)

    enc = adpcm_encode(x, 8000)
    ch, sr, cnt, states, pos = _parse_header(enc)
    assert (ch, sr, cnt) == (1, 8000, n)
    pred0, idx0 = states[0]
    assert pred0 == int(x[0])

    codes = _unpack_nibbles(enc[pos:], n - 1)
    want_codes = _mirror_encode([int(v) for v in x[1:]], pred0, idx0)
    assert codes == want_codes

    dec = adpcm_decode(enc)[:, 0]
    want_dec = _mirror_decode(want_codes, pred0, idx0)
    assert dec.tolist() == want_dec


# ---------------------------------------------------------------------------
# round-trip quality and shape
# ---------------------------------------------------------------------------
def test_compression_ratio_and_snr():
    t = np.arange(16000)
    x = (8000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    enc = adpcm_encode(x, 8000)
    assert 3.9 < len(x) * 2 / len(enc) < 4.1
    dec = adpcm_decode(enc)[:, 0]
    err = x.astype(np.float64) - dec.astype(np.float64)
    snr = 10 * np.log10((x.astype(np.float64) ** 2).sum() / (err ** 2).sum())
    assert snr > 25.0
    assert adpcm_sample_rate(enc) == 8000


def test_multichannel_channels_are_independent():
    rng = np.random.default_rng(9)
    left = np.cumsum(rng.integers(-300, 301, 777)).clip(
        -32768, 32767).astype(np.int16)
    right = (2000 * np.sin(np.arange(777) / 3.0)).astype(np.int16)
    stereo = np.stack([left, right], axis=1)
    dec = adpcm_decode(adpcm_encode(stereo, 16000))
    assert dec.shape == (777, 2)
    # channel-major coding: each channel decodes exactly as its mono twin
    assert (dec[:, 0] == adpcm_decode(adpcm_encode(left, 16000))[:, 0]).all()
    assert (dec[:, 1] == adpcm_decode(adpcm_encode(right, 16000))[:, 0]).all()


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_tiny_lengths_roundtrip(n):
    x = (np.arange(n) * 100).astype(np.int16)
    dec = adpcm_decode(adpcm_encode(x))[:, 0]
    assert dec.shape == (n,)
    assert dec[0] == x[0]  # first sample is stored verbatim


def test_error_contract():
    with pytest.raises(ValueError):
        adpcm_encode(np.zeros(10, dtype=np.float32))  # dtype
    with pytest.raises(ValueError):
        adpcm_encode(np.zeros((10, 9), dtype=np.int16))  # >8 channels
    with pytest.raises(ValueError):
        adpcm_encode(np.zeros(0, dtype=np.int16))  # empty
    with pytest.raises(ValueError):
        adpcm_encode(np.zeros(10, dtype=np.int16), sample_rate=0)

    good = adpcm_encode(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="magic"):
        adpcm_decode(b"JUNK" + good[4:])
    # the size equation len == header + ch * n//2 catches truncation,
    # trailing garbage, AND corrupted length fields (which otherwise
    # reach np.empty with a petabyte shape) in one check
    with pytest.raises(ValueError, match="header implies"):
        adpcm_decode(good[:-3])  # truncated nibbles
    with pytest.raises(ValueError, match="header implies"):
        adpcm_decode(good + b"\x00")  # trailing byte
    bad_idx = bytearray(good)
    bad_idx[19] = 89  # channel-0 step index out of range
    with pytest.raises(ValueError, match="out of range"):
        adpcm_decode(bytes(bad_idx))


# ---------------------------------------------------------------------------
# fuzz contracts (same pattern as test_jpeg_codec's corruption sweep
# and test_properties' hypothesis kernels)
# ---------------------------------------------------------------------------
def test_corrupt_any_byte_never_crashes():
    """Flip every byte of a valid stream: decode must either succeed
    (corruption landed somewhere recoverable — e.g. a sample value) or
    raise ValueError; never an IndexError/struct.error/hang."""
    x = (1000 * np.sin(np.arange(300) / 4.0)).astype(np.int16)
    data = adpcm_encode(x, 8000)
    for i in range(len(data)):
        corrupted = bytearray(data)
        corrupted[i] ^= 0x55
        try:
            out = adpcm_decode(bytes(corrupted))
            assert out.shape == (300, 1)  # length comes from the header
        except ValueError:
            pass


def _hyp():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    return given, settings, st


_given, _settings, _st = _hyp()


@_settings(max_examples=50, deadline=None)
@_given(_st.lists(_st.integers(-32768, 32767), min_size=1, max_size=400),
        _st.integers(1, (1 << 32) - 1))
def test_roundtrip_properties(vals, rate):
    """For ANY int16 signal: container round-trips shape/rate, the
    first sample is verbatim, and per-sample error is bounded by
    2 * STEP_TABLE[-1] — the quantizer corrects at most ~1.875x the
    current step per sample, so a full-scale jump (up to 65535) can
    overshoot/lag by up to roughly twice the max step while the adapter
    catches up; the encoder's quantized tracking (predictor advanced
    with the DECODED diff) keeps that error from accumulating across
    samples, which is the property worth pinning."""
    x = np.asarray(vals, dtype=np.int16)
    enc = adpcm_encode(x, rate)
    assert adpcm_sample_rate(enc) == rate
    dec = adpcm_decode(enc)[:, 0]
    assert dec.shape == x.shape
    assert dec[0] == x[0]
    err = np.abs(x.astype(np.int64) - dec.astype(np.int64))
    assert err.max(initial=0) <= 2 * STEP_TABLE[-1]
