"""Minimal real FLAC codec — stdlib ``struct``/``hashlib`` + numpy only.

Closes the engine's last disclosed audio-codec stub (the reference has
no audio path at all; this repo's multimodal surface treats audio as
raw-PCM binary — ``multimodal_audio_vad`` — and previously stubbed
compressed-audio decode). The bytes are produced and parsed here from
the published FLAC format specification (RFC 9639) directly; no
external FLAC implementation exists in this container, so compliance
is pinned by the spec-structural assertions below plus exact lossless
round-trips, not by third-party interop.

Scope (disclosed, asserted):
- 16-bit PCM, 1..8 independent channels (no mid/side), fixed-blocksize
  streams.
- Encoder: per channel picks CONSTANT, or the best FIXED predictor
  (orders 0..4, Lee/Robinson polynomial predictors) by residual
  magnitude, Rice-coded residuals (partition order 0, 4-bit
  parameters, escape to verbatim residual when Rice would expand);
  proper STREAMINFO (incl. the spec's MD5 of the unencoded
  little-endian PCM), frame-header CRC-8, whole-frame CRC-16.
- Decoder: parses any metadata-block layout, CONSTANT / VERBATIM /
  FIXED subframes with the full partitioned-Rice residual (any
  partition order, 4- or 5-bit parameters, escape codes), verifies
  both CRCs and the STREAMINFO MD5, and raises ValueError on anything
  outside the subset (LPC subframes, wasted bits, mid/side) — a loud
  boundary, not a silent wrong decode.

The UDF plumbing that ships these bytes lives in
operators/multimodal.py (``decode_external(codec="flac")``).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096  # fixed encoder blocksize (streamable subset, <= 16-bit sizes)
_MAGIC = b"fLaC"

# fixed-predictor residual: e[i] = sum(coef[j] * x[i-1-j]) subtracted
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, init 0)
# ---------------------------------------------------------------------------
def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[r ^ b])
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TAB[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._byte = pos
        self._bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self._byte >= len(self._data):
                raise ValueError("flac: truncated stream")
            v = (v << 1) | ((self._data[self._byte] >> (7 - self._bit)) & 1)
            self._bit += 1
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def tell(self) -> int:
        return self._byte


# ---------------------------------------------------------------------------
# coded number (frame index): the spec's UTF-8-style variable-length int
# ---------------------------------------------------------------------------
def _coded_number_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nb in range(2, 8):  # total encoded bytes
        if n < (1 << ((7 - nb) + 6 * (nb - 1))):
            break
    else:
        raise ValueError("flac: coded number out of range")
    out = bytearray()
    lead_mask = (0xFF << (8 - nb)) & 0xFF  # nb ones then zeros
    shift = 6 * (nb - 1)
    out.append(lead_mask | ((n >> shift) & ((1 << (7 - nb)) - 1)))
    for _ in range(nb - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _coded_number_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("flac: bad coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    e = x.astype(np.int64)
    for _ in range(order):
        e = np.diff(e)
    return e


def _best_rice_k(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    folded = np.where(res >= 0, res.astype(np.int64) << 1,
                      ((-res.astype(np.int64)) << 1) - 1)
    best_k, best_bits = 0, None
    for k in range(15):  # 4-bit parameter, 15 = escape
        bits = int(np.sum(folded >> k)) + len(res) * (k + 1)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _write_rice(w: _BitWriter, res: np.ndarray, k: int) -> None:
    for r in res.tolist():
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        w.write_unary(u >> k)
        w.write(u, k)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x64 = x.astype(np.int64)
    if np.all(x64 == x64[0]):
        w.write(0, 1)          # zero pad bit
        w.write(0b000000, 6)   # CONSTANT
        w.write(0, 1)          # no wasted bits
        w.write(int(x64[0]), bps)
        return
    # best fixed order by absolute residual sum (the standard heuristic)
    best_o, best_res, best_cost = 0, x64, None
    for o in range(5):
        if o >= len(x64):
            break
        res = _fixed_residual(x64, o)
        cost = int(np.sum(np.abs(res)))
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    # residuals of 16-bit fixed predictors fit 19 bits; escape covers all
    w.write(0, 1)
    w.write(0b001000 | best_o, 6)  # FIXED, order
    w.write(0, 1)
    for i in range(best_o):        # warmup samples
        w.write(int(x64[i]), bps)
    # residual: method 00 (4-bit params), partition order 0
    w.write(0b00, 2)
    w.write(0, 4)
    k = _best_rice_k(best_res)
    folded_max_bits = 0
    if len(best_res):
        folded = np.where(best_res >= 0, best_res << 1, ((-best_res) << 1) - 1)
        rice_bits = int(np.sum(folded >> k)) + len(best_res) * (k + 1)
        folded_max_bits = max(int(v).bit_length() for v in folded.tolist())
        raw_bits = max(folded_max_bits, 1)
        if 4 + 5 + len(best_res) * raw_bits < 4 + rice_bits:
            # escape: unencoded residuals at fixed width
            w.write(0b1111, 4)
            w.write(raw_bits, 5)
            for r in best_res.tolist():
                w.write(int(r), raw_bits)
            return
    w.write(k, 4)
    _write_rice(w, best_res, k)


def flac_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 PCM → FLAC bytes. 1-D → mono, (n, ch) → ch channels."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError(f"flac_encode expects int16, got {arr.dtype}")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or not (1 <= arr.shape[1] <= 8):
        raise ValueError(f"flac_encode expects (n, 1..8ch), got {arr.shape}")
    if len(arr) == 0:
        raise ValueError("flac_encode: empty signal")
    # STREAMINFO stores the rate in 20 bits; out-of-range values would be
    # silently masked into wrong metadata (or, for 0, produce a stream the
    # decoder rejects) — fail loudly at encode time instead
    if not 0 < sample_rate < 1 << 20:
        raise ValueError(
            f"flac_encode: sample_rate {sample_rate} outside (0, 2^20)")
    n, ch = arr.shape
    bps = 16
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()

    frames = bytearray()
    frame_sizes = []
    for fi, start in enumerate(range(0, n, _BLOCK)):
        blk = arr[start:start + _BLOCK]
        bs = len(blk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)  # sync
        w.write(0, 1)                  # reserved
        w.write(0, 1)                  # fixed-blocksize stream
        # blocksize: 4096 -> 0b1100; otherwise 16-bit-at-end (0b0111)
        bs_code = 0b1100 if bs == _BLOCK else 0b0111
        w.write(bs_code, 4)
        w.write(0b0000, 4)             # sample rate: from STREAMINFO
        w.write(ch - 1, 4)             # independent channels
        w.write(0b100, 3)              # 16 bits per sample
        w.write(0, 1)                  # reserved
        for b in _coded_number_encode(fi):
            w.write(b, 8)
        if bs_code == 0b0111:
            w.write(bs - 1, 16)
        w.align()
        header = w.bytes()
        w2 = _BitWriter()
        for c in range(ch):
            _write_subframe(w2, blk[:, c], bps)
        w2.align()
        body = header + bytes([_crc8(header)]) + w2.bytes()
        frame = body + struct.pack(">H", _crc16(body))
        frames += frame
        frame_sizes.append(len(frame))

    # STREAMINFO: 34 bytes, bit-packed per spec. min/max blocksize
    # describe the FIXED blocksize (the spec excludes a shorter last
    # frame from these fields)
    si = _BitWriter()
    si.write(_BLOCK, 16)
    si.write(_BLOCK, 16)
    si.write(min(frame_sizes), 24)
    si.write(max(frame_sizes), 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    info = si.bytes() + md5
    header_block = bytes([0x80]) + struct.pack(">I", len(info))[1:] + info
    return _MAGIC + header_block + bytes(frames)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= order:
        raise ValueError("flac: invalid partition order")
    out = []
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            width = br.read(5)
            vals = [br.read_signed(width) if width else 0
                    for _ in range(cnt)]
        else:
            vals = []
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                vals.append((u >> 1) if not (u & 1) else -((u + 1) >> 1))
        out.extend(vals)
    return np.array(out, dtype=np.int64)


def _read_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    if br.read(1):
        raise ValueError("flac: wasted bits outside subset")
    if stype == 0b000000:
        return np.full(bs, br.read_signed(bps), dtype=np.int64)
    if stype == 0b000001:
        return np.array([br.read_signed(bps) for _ in range(bs)],
                        dtype=np.int64)
    if 0b001000 <= stype <= 0b001100:
        order = stype & 0b000111
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            x[i] = res[i - order] + sum(
                c * x[i - 1 - j] for j, c in enumerate(coefs))
        return x
    if stype >= 0b100000:
        raise ValueError("flac: LPC subframes outside subset")
    raise ValueError(f"flac: reserved subframe type {stype:#08b}")


def flac_decode(data: bytes) -> np.ndarray:
    """FLAC bytes → int16 PCM of shape (n, channels)."""
    if data[:4] != _MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        head = data[pos]
        btype, last = head & 0x7F, head & 0x80
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:
            info = data[pos + 4:pos + 4 + size]
            if len(info) != 34:
                raise ValueError("flac: bad STREAMINFO size")
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type")
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    ir = _BitReader(info)
    ir.read(16)  # min blocksize
    ir.read(16)  # max blocksize
    ir.read(24)
    ir.read(24)
    sample_rate = ir.read(20)
    ch = ir.read(3) + 1
    bps = ir.read(5) + 1
    total = ir.read(36)
    md5_expect = info[18:34]
    if bps != 16:
        raise ValueError(f"flac: {bps}-bit outside subset")
    if sample_rate == 0:
        raise ValueError("flac: bad sample rate")
    if total == 0:
        raise ValueError("flac: zero-length stream outside subset")

    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        br = _BitReader(data, pos)
        fstart = pos
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        _coded_number_decode(br)
        if bs_code in (0b0000,):
            raise ValueError("flac: reserved blocksize code")
        if bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample rate code")
        if ca > 7:
            raise ValueError("flac: mid/side channels outside subset")
        if ca + 1 != ch:
            raise ValueError("flac: frame/STREAMINFO channel mismatch")
        if ss_code != 0b100:
            raise ValueError("flac: frame sample size outside subset")
        br.align()
        hdr_end = br.tell()
        if hdr_end >= len(data):
            raise ValueError("flac: truncated frame header")
        if _crc8(data[fstart:hdr_end]) != data[hdr_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br = _BitReader(data, hdr_end + 1)
        for c in range(ch):
            chans[c].append(_read_subframe(br, bs, bps))
        br.align()
        body_end = br.tell()
        if body_end + 2 > len(data):
            raise ValueError("flac: truncated frame CRC")
        (crc,) = struct.unpack(">H", data[body_end:body_end + 2])
        if _crc16(data[fstart:body_end]) != crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = body_end + 2
        got += bs

    if got != total:
        raise ValueError("flac: sample count mismatch")
    out = np.stack([np.concatenate(c) for c in chans], axis=1)
    if np.any(out < -32768) or np.any(out > 32767):
        raise ValueError("flac: decoded samples exceed 16-bit range")
    out16 = out.astype(np.int16)
    if hashlib.md5(out16.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("flac: STREAMINFO MD5 mismatch")
    return out16
