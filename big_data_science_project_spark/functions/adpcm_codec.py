"""IMA ADPCM codec — the engine's real LOSSY audio compression tier.

Implements the IMA (Interactive Multimedia Association, 1992) 4-bit
ADPCM algorithm from the published recommendation — the same scheme
RFC 3551 §4.5.1 registers as DVI4 and Microsoft WAV carries as format
0x0011: a one-pole predictor whose step size adapts through the
canonical 89-entry step table, each sample quantized to a 4-bit
sign+magnitude code (4:1 compression of 16-bit PCM, fixed rate).

Both sides share `_step_one`, the spec's reconstruction rule: the
ENCODER advances its predictor with the same quantized difference the
decoder will reconstruct, so the two predictors track exactly and
quantization error cannot accumulate — the defining trick of ADPCM.

Container (this module's own, since raw DVI4 is headerless): magic
``ADP1`` + channels + sample-rate + length + per-channel initial
predictor/index, then channel-major nibble streams, low nibble first
(the WAV convention). Like the sibling PNG/JPEG/FLAC codecs
(png_codec.py / jpeg_codec.py / flac_codec.py) this is stdlib+numpy
only, deterministic, and raises ValueError loudly on malformed input.

Why it exists (reference parity note): the reference writes images via
cv.imwrite (`feature extraction.py:89-91`) and never touches audio;
this engine treats audio as a first-class opaque-binary modality, and
a training-data pipeline at 100 TB stores speech as LOSSY compressed
bytes. mp3/opus (psychoacoustic transform codecs) remain the disclosed
out-of-scope stub; ADPCM is the real, spec-exact time-domain member of
that family. Scale shape: pure per-clip kernel inside an Arrow batch —
samples never shuffle, only per-clip scalar summaries do.
"""

from __future__ import annotations

import struct

import numpy as np

# The two canonical tables from the IMA recommendation (reproduced in
# RFC 3551 and every public ADPCM reference). STEPS[i] ~ 1.1^i: the
# quantizer step grows ~10% per index increment.
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

_MAGIC = b"ADP1"


def _step_one(code: int, predictor: int, index: int) -> tuple[int, int]:
    """Advance one sample given a 4-bit code — the spec's decoder rule,
    used verbatim by BOTH encoder and decoder (see module docstring)."""
    step = STEP_TABLE[index]
    # diff = (step/8) * (1 + 2*b2 + 4*b1 + 8*b0) done in integer halves,
    # exactly as the IMA reference pseudocode prescribes
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    if code & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + INDEX_TABLE[code]))
    return predictor, index


def _encode_channel(x: np.ndarray) -> tuple[int, bytes]:
    """int16 1-D → (initial index, packed nibbles, low nibble first)."""
    samples = x.tolist()  # python ints: the loop is branch-heavy
    predictor = samples[0]
    # seed the step index from the first true delta so the adapter
    # starts near the signal's scale (deterministic, header-recorded)
    first_delta = abs(samples[1] - samples[0]) if len(samples) > 1 else 0
    index = 0
    while index < 88 and STEP_TABLE[index] < first_delta:
        index += 1
    index0 = index

    nibbles = []
    for s in samples[1:]:
        delta = s - predictor
        code = 0
        if delta < 0:
            code = 8
            delta = -delta
        # successive-approximation quantization (spec pseudocode)
        step = STEP_TABLE[index]
        if delta >= step:
            code |= 4
            delta -= step
        step >>= 1
        if delta >= step:
            code |= 2
            delta -= step
        step >>= 1
        if delta >= step:
            code |= 1
        nibbles.append(code)
        predictor, index = _step_one(code, predictor, index)

    if len(nibbles) % 2:
        nibbles.append(0)  # pad nibble, ignored via the header's length
    packed = bytes(nibbles[i] | (nibbles[i + 1] << 4)
                   for i in range(0, len(nibbles), 2))
    return index0, packed


def adpcm_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 PCM → IMA-ADPCM bytes. 1-D → mono, (n, ch) → ch channels."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError(f"adpcm_encode expects int16, got {arr.dtype}")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or not (1 <= arr.shape[1] <= 8):
        raise ValueError(f"adpcm_encode expects (n, 1..8ch), got {arr.shape}")
    if len(arr) == 0:
        raise ValueError("adpcm_encode: empty signal")
    if not 0 < sample_rate < 1 << 32:
        raise ValueError(f"adpcm_encode: bad sample_rate {sample_rate}")
    n, ch = arr.shape

    head = [_MAGIC, struct.pack(">BIQ", ch, sample_rate, n)]
    bodies = []
    for c in range(ch):
        index0, packed = _encode_channel(arr[:, c])
        head.append(struct.pack(">hB", int(arr[0, c]), index0))
        bodies.append(packed)
    return b"".join(head + bodies)


def adpcm_decode(data: bytes) -> np.ndarray:
    """IMA-ADPCM bytes → (n, ch) int16 PCM. Raises ValueError on any
    malformed stream (wrong magic, truncation, bad header fields)."""
    if len(data) < 17 or data[:4] != _MAGIC:
        raise ValueError("adpcm: bad magic")
    ch, sample_rate, n = struct.unpack(">BIQ", data[4:17])
    if not (1 <= ch <= 8):
        raise ValueError(f"adpcm: bad channel count {ch}")
    if n == 0 or sample_rate == 0:
        raise ValueError("adpcm: empty stream header")
    pos = 17
    states = []
    for _ in range(ch):
        if pos + 3 > len(data):
            raise ValueError("adpcm: truncated channel header")
        pred, idx = struct.unpack(">hB", data[pos:pos + 3])
        if idx > 88:
            raise ValueError(f"adpcm: step index {idx} out of range")
        states.append((pred, idx))
        pos += 3

    nbytes = n // 2  # == ceil((n-1)/2): n-1 coded nibbles padded to bytes
    # the container's size is fully determined by the header, so check it
    # BEFORE allocating the output: a corrupted length field must raise,
    # not attempt a petabyte np.empty (caught by the byte-flip fuzz test)
    if len(data) != pos + ch * nbytes:
        raise ValueError(
            f"adpcm: stream is {len(data)} bytes, header implies "
            f"{pos + ch * nbytes}")
    out = np.empty((n, ch), dtype=np.int16)
    for c in range(ch):
        body = data[pos:pos + nbytes]  # exact: length checked above
        pos += nbytes
        predictor, index = states[c]
        out[0, c] = predictor
        vals = out[:, c]
        i = 1
        for byte in body:
            for code in (byte & 0xF, byte >> 4):
                if i >= n:
                    break
                predictor, index = _step_one(code, predictor, index)
                vals[i] = predictor
                i += 1
    return out


def adpcm_sample_rate(data: bytes) -> int:
    """Sample rate recorded in the container header."""
    if len(data) < 17 or data[:4] != _MAGIC:
        raise ValueError("adpcm: bad magic")
    return struct.unpack(">BIQ", data[4:17])[1]
