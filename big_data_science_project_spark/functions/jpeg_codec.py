"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in numpy + stdlib —
closes the engine's last external-codec boundary (the reference's cell
exports go through cv2/PIL-style codecs; this container has neither, so
the codec is implemented from the published standard, like the PNG
twin in png_codec.py).

Encoder: grayscale (H,W) or RGB (H,W,3) uint8 → baseline JFIF bytes.
  8×8 forward DCT (orthonormal matrix product), Annex-K luminance /
  chrominance quantization tables scaled by the libjpeg quality curve,
  zig-zag, DC-difference + AC run-length coding, canonical Huffman
  (the standard Annex-K luminance tables, written into DHT — decoders
  read tables from the stream, so self-consistency, not table identity,
  is what the format requires), 0xFF byte stuffing. Color uses JFIF
  YCbCr with NO chroma subsampling (4:4:4 — every MCU carries one 8×8
  block per component).

Decoder: baseline JFIF/EXIF bytes → uint8 (H,W) or (H,W,3).
  Full marker parse (APPn/COM skipped, DQT 8/16-bit, SOF0, DHT, DRI,
  SOS), canonical Huffman decode, DC prediction + restart-marker
  resets, dequantize → inverse zig-zag → IDCT, 4:4:4 interleaved MCU
  reassembly, YCbCr→RGB. Progressive (SOF2) and subsampled streams
  raise with a clear message — the boundary is explicit, not silent.

Fidelity evidence (tests/test_jpeg_codec.py): encode→decode error is
bounded by the quantization table (exact on constant blocks, small on
smooth images), the bitstream structure is verified marker-by-marker,
and the decoder is pinned against an independent per-block float
DCT/quantization mirror of the standard on hand-built streams.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8×8 DCT basis (orthonormal) -------------------------------------------
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# --- zig-zag order (index into the 8×8 block for position k of 64) ---------
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZZ = np.argsort(_ZZ)

# --- Annex-K quantization tables (luminance / chrominance) ------------------
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]).reshape(8, 8)

# --- Annex-K luminance Huffman tables (bits-per-length, symbol order) -------
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _canonical_codes(bits, vals):
    """(symbol → (code, length)) canonical Huffman assignment per T.81
    (codes of each length assigned in symbol order, code doubles when
    the length grows)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 → Annex K as-is; 100 → all-ones."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a coefficient — negative values use the
    ones-complement convention of T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _encode_component_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    """Huffman-encode one zig-zagged quantized block; returns new DC
    predictor."""
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, length = _DC_ENC[size]
    w.write(code, length)
    w.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]      # ZRL
            w.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = _AC_ENC[(run << 4) | size]
        w.write(c, ln)
        w.write(bits, size)
        run = 0
    if run:
        c, ln = _AC_ENC[0x00]          # EOB
        w.write(c, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (H,W) float plane to 8-multiples by edge replication and
    return (blocks_y, blocks_x, padded array)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return padded, (h + ph) // 8, (w + pw) // 8


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def jpeg_encode(img: np.ndarray, quality: int = 90,
                restart_interval: int = 0) -> bytes:
    """uint8 (H,W) grayscale or (H,W,3) RGB → baseline JFIF bytes.
    ``restart_interval`` > 0 writes DRI and emits RSTn every that many
    MCUs (the stream-resync feature a splittable 100 TB scan keys on)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expects (H,W) or (H,W,3)")
    h, w = img.shape[:2]
    ncomp = 1 if gray else 3
    qtabs = [_quality_scale(_QL, quality)]
    planes = [img.astype(np.float64)] if gray else None
    if not gray:
        qtabs.append(_quality_scale(_QC, quality))
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs):                    # DQT (8-bit)
        out += _seg(0xFFDB, bytes([tid])
                    + bytes(int(x) for x in q.reshape(-1)[_ZZ]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)         # SOF0
    for ci in range(ncomp):
        # component id, sampling 1×1 (0x11), quant table (0 luma / 1 chroma)
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, sof)
    # one DC and one AC table (class 0/1, id 0) shared by all components
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])                               # SOS
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])                   # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    padded = [_blocks_of(p) for p in planes]
    by, bx = padded[0][1], padded[0][2]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for my in range(by):
        for mx in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.buf
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1)
                                            % 8)])
                bw = _BitWriter()
                preds = [0] * ncomp
            mcu += 1
            for ci in range(ncomp):
                plane = padded[ci][0]
                block = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] - 128.0
                coef = _A @ block @ _A.T
                q = qtabs[0 if ci == 0 else 1]
                zz = np.rint(coef / q).astype(np.int64).reshape(-1)[_ZZ]
                preds[ci] = _encode_component_block(bw, zz, preds[ci])
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
class _BitReader:
    """Entropy-coded-segment reader: de-stuffs FF00, stops at markers,
    and resynchronizes across RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:            # stuffed
                self.pos += 2
                return 0xFF
            raise _AtMarker(0xFF00 | nxt)
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at the current byte boundary."""
        self.nbits = 0
        d = self.data
        if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _AtMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_tree(bits, vals):
    """(code, length) → symbol map for canonical tables."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, tree) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (H,W) for 1 component, (H,W,3) RGB
    for 3 components. Raises ValueError on progressive, subsampled,
    truncated, or otherwise malformed streams — the header parser is
    wrapped so a corrupt segment can never leak an internal
    IndexError/OverflowError/struct.error past the codec boundary."""
    try:
        return _jpeg_decode_inner(data)
    except ValueError:
        raise
    except (IndexError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt or truncated JPEG header: {e}") from None


def _jpeg_decode_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:             # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                   # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:             # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                qtabs[tq] = tbl.astype(np.int64)[_UNZZ].reshape(8, 8)
        elif marker == 0xC4:           # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                htabs[(tc, th)] = _decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "chroma-subsampled stream (sampling != 1x1) not "
                        "supported — re-encode 4:4:4")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline SOF marker 0xFF{marker:02X} (progressive/"
                "arithmetic) not supported")
        elif marker == 0xDD:           # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:           # SOS
            if comps is None:
                raise ValueError("missing SOF before SOS")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"SOS references unknown component "
                                     f"{cs}")
                scan.append((comp, tabs >> 4, tabs & 15))
            break
        # APPn / COM / others: skipped
    by, bx = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((by * 8, bx * 8)) for _ in comps]
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu = 0
    # malformed entropy data must surface as the module's ValueError
    # contract, never as a leaked IndexError (truncated buffer / AC run
    # past the block) or the internal _AtMarker signal
    try:
        for my in range(by):
            for mx in range(bx):
                if restart and mcu and mcu % restart == 0:
                    br.sync_restart()
                    preds = [0] * len(scan)
                for si, (comp, td, ta) in enumerate(scan):
                    dct = htabs[(0, td)]
                    act = htabs[(1, ta)]
                    zz = np.zeros(64, dtype=np.int64)
                    size = _read_symbol(br, dct)
                    preds[si] += _extend(br.read_bits(size), size)
                    zz[0] = preds[si]
                    k = 1
                    while k < 64:
                        sym = _read_symbol(br, act)
                        if sym == 0x00:    # EOB
                            break
                        if sym == 0xF0:    # ZRL
                            k += 16
                            continue
                        k += sym >> 4
                        sz = sym & 15
                        if k > 63:
                            raise ValueError(
                                "corrupt JPEG (AC run past block end)")
                        zz[k] = _extend(br.read_bits(sz), sz)
                        k += 1
                    coef = (zz * qtabs[comp["tq"]].reshape(-1)[_ZZ])[_UNZZ] \
                        .reshape(8, 8).astype(np.float64)
                    block = _A.T @ coef @ _A + 128.0
                    planes[si][my * 8:my * 8 + 8,
                               mx * 8:mx * 8 + 8] = block
                mcu += 1
    except IndexError:
        raise ValueError("truncated JPEG entropy data") from None
    except _AtMarker as m:
        raise ValueError(
            f"unexpected marker 0x{m.marker:04X} inside scan data "
            "(corrupt or unsupported stream)") from None
    except KeyError as e:
        raise ValueError(f"scan references undefined table {e}") from None

    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) == 3:
        return _ycbcr_to_rgb(*planes)
    raise ValueError(f"{len(planes)}-component streams not supported")
