"""Minimal real PNG codec — stdlib ``zlib`` + ``struct`` only.

Closes the reference's image-file sink/decode boundary for real
(``feature extraction.py:89-91`` writes PNGs via ``cv.imwrite``; this
container has no imaging library, so the bytes are produced and parsed
here from the published PNG specification directly).

Scope (disclosed, asserted):
- 8-bit depth, color types 0 (grayscale) and 2 (RGB), non-interlaced.
- Encoder emits filter 0 (None) scanlines; the decoder reconstructs all
  five spec filters (None/Sub/Up/Average/Paeth) so PNGs written by other
  encoders decode too.
- Anything else (16-bit, palette, alpha, Adam7) raises ValueError — a
  loud boundary, not a silent wrong decode.

The UDF plumbing that ships these bytes lives in operators/multimodal.py
(``decode_external(codec="png")`` + the PNG export/round-trip query).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_encode(img: np.ndarray) -> bytes:
    """uint8 image → PNG bytes. 2-D → grayscale, (H, W, 3) → RGB."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        raise ValueError(f"png_encode expects uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, h, w = 0, arr.shape[0], arr.shape[1]
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, h, w = 2, arr.shape[0], arr.shape[1]
        flat = arr.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to every scanline
    raw = b"".join(b"\x00" + flat[i].tobytes() for i in range(h))
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Reconstruct one scanline (uint8 view, modified in place)."""
    if ftype == 0:
        return cur
    if ftype == 2:  # Up — vectorizable, no intra-row dependency
        cur += prev
        return cur
    n = len(cur)
    if ftype == 1:  # Sub
        for x in range(bpp, n):
            cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
    elif ftype == 3:  # Average
        for x in range(n):
            a = int(cur[x - bpp]) if x >= bpp else 0
            cur[x] = (int(cur[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for x in range(n):
            a = int(cur[x - bpp]) if x >= bpp else 0
            c = int(prev[x - bpp]) if x >= bpp else 0
            cur[x] = (int(cur[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return cur


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (H, W) for grayscale, (H, W, 3) for RGB."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    h = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("Adam7 interlacing not supported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        cur = rows[i, 1:].copy()
        prev = _unfilter_row(int(rows[i, 0]), cur, prev, ch)
        out[i] = prev
    return out if ch == 1 else out.reshape(h, w, 3)
