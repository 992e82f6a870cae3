"""Canonical Huffman coding from OBSERVED frequencies — the adaptive
entropy stage of the transform audio codec (mdct_codec.py's MDC2
container).

The repo already carries canonical-Huffman *decoding/encoding against
fixed spec tables* (jpeg_codec.py, ITU-T T.81 Annex K); what a
transform audio codec additionally needs — and what mp3/Vorbis/opus
all do in spirit — is building the table FROM the stream being coded:
MDCT mantissas are sharply concentrated around 0, so a per-stream code
beats any fixed table. This module provides exactly that third piece:

  code_lengths   optimal prefix-code lengths from a 256-bin histogram
                 (the classic two-queue/heap Huffman construction;
                 depth is bounded by the symbol count, stored in one
                 byte per symbol)
  canonical_codes  lengths → canonical code values ((length, symbol)
                 order, the same assignment rule as T.81/DEFLATE —
                 so a decoder needs ONLY the 256-byte length table)
  encode         uint8 symbols → MSB-first packed bitstream
                 (vectorized: per-symbol bit matrix + boolean mask +
                 np.packbits; no per-bit Python on the encode side)
  decode         bitstream → symbols via the canonical first-code
                 arithmetic (per-length {first_code, first_index}),
                 loud ValueError on any invalid prefix

Lossless by construction: decode(encode(s)) == s for every symbol
stream; the lossy part of the codec stays in quantization, where it
belongs. stdlib heapq + numpy only, deterministic (ties in the heap
break on a monotone counter, so the table is a pure function of the
histogram).
"""

from __future__ import annotations

import heapq

import numpy as np

MAX_LEN = 64  # no optimal code over 256 symbols can exceed 255; the
# decoder additionally refuses anything past this sanity bound


def code_lengths(freqs: np.ndarray) -> np.ndarray:
    """(256,) nonneg counts → (256,) uint8 optimal prefix-code lengths
    (0 for absent symbols). A single-symbol stream gets length 1 (a
    degenerate but decodable code)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    if freqs.shape != (256,) or (freqs < 0).any():
        raise ValueError("code_lengths wants a (256,) count histogram")
    present = np.flatnonzero(freqs)
    if present.size == 0:
        raise ValueError("code_lengths: empty histogram")
    depth = np.zeros(256, dtype=np.int64)
    if present.size == 1:
        depth[present[0]] = 1
        return depth.astype(np.uint8)
    # heap of (weight, tiebreak, leaf symbols); each merge deepens
    # every leaf under the merged node by one
    heap = [(int(freqs[s]), int(s), (int(s),)) for s in present]
    heapq.heapify(heap)
    tiebreak = 256
    while len(heap) > 1:
        w1, _, l1 = heapq.heappop(heap)
        w2, _, l2 = heapq.heappop(heap)
        merged = l1 + l2
        for s in merged:
            depth[s] += 1
        heapq.heappush(heap, (w1 + w2, tiebreak, merged))
        tiebreak += 1
    if int(depth.max()) > MAX_LEN:
        # reachable only for pathologically skewed int64 histograms
        # (Fibonacci-like counts summing past ~2^64/phi) — impossible
        # from a bincount of an in-memory array, but the public API
        # promises ValueError, not a silent uint64 shift overflow
        raise ValueError(f"code_lengths: optimal code depth "
                         f"{int(depth.max())} exceeds MAX_LEN={MAX_LEN}")
    return depth.astype(np.uint8)


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """(256,) uint8 lengths → (256,) uint64 canonical code values
    (valid only where length > 0): codes assigned in (length, symbol)
    order, the T.81/DEFLATE rule — the whole codebook reconstructs
    from the length table alone."""
    order = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    if not order:
        raise ValueError("canonical_codes: all-zero length table")
    if order[-1][0] > MAX_LEN:
        raise ValueError(f"canonical_codes: length {order[-1][0]} "
                         f"exceeds MAX_LEN={MAX_LEN}")
    codes = np.zeros(256, dtype=np.uint64)
    code = 0
    prev_len = order[0][0]
    for length, sym in order:
        code <<= (length - prev_len)
        prev_len = length
        codes[sym] = code
        code += 1
    if code > (1 << prev_len):
        raise ValueError("canonical_codes: length table is not a "
                         "valid prefix code (Kraft overflow)")
    return codes


def encode(symbols: np.ndarray, lengths: np.ndarray,
           codes: np.ndarray | None = None) -> tuple[bytes, int]:
    """uint8 symbols → (packed MSB-first bitstream, total bit count).
    Symbols with length 0 in the table are an error (they were not in
    the histogram the table was built from)."""
    symbols = np.asarray(symbols, dtype=np.uint8)
    if codes is None:
        codes = canonical_codes(lengths)
    lens = lengths.astype(np.int64)[symbols]
    if symbols.size and int(lens.min()) == 0:
        raise ValueError("encode: symbol absent from the code table")
    if symbols.size == 0:
        return b"", 0
    cds = codes[symbols]
    width = int(lens.max())
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bit_mat = (cds[:, None] >> shifts[None, :]).astype(np.uint8) & 1
    # a code of length l occupies the LOW l bits of its value; in the
    # width-wide MSB-first window its own bits are the last l columns
    valid = np.arange(width)[None, :] >= (width - lens)[:, None]
    flat = bit_mat[valid]  # row-major: symbol 0's bits, then symbol 1's
    return np.packbits(flat).tobytes(), int(flat.size)


def decode(data: bytes, n_symbols: int, lengths: np.ndarray,
           nbits: int | None = None) -> np.ndarray:
    """Packed bitstream → (n_symbols,) uint8 via canonical first-code
    arithmetic. Raises ValueError on truncation or an invalid prefix."""
    order = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    if not order:
        raise ValueError("decode: all-zero length table")
    if order[-1][0] > MAX_LEN:
        raise ValueError(f"decode: length {order[-1][0]} exceeds "
                         f"MAX_LEN={MAX_LEN}")
    syms_sorted = np.array([s for _, s in order], dtype=np.uint8)
    first_code: dict[int, int] = {}
    first_idx: dict[int, int] = {}
    count: dict[int, int] = {}
    code = 0
    prev_len = order[0][0]
    for i, (length, _) in enumerate(order):
        code <<= (length - prev_len)
        prev_len = length
        if length not in first_code:
            first_code[length] = code
            first_idx[length] = i
        count[length] = count.get(length, 0) + 1
        code += 1
    if code > (1 << prev_len):
        # same Kraft-overflow check as canonical_codes: an overfull
        # table (e.g. three length-1 codes) would otherwise decode to
        # garbage symbols silently — the table arrived over the wire
        # (MDC2 header), so the decoder must not trust it
        raise ValueError("decode: length table is not a valid prefix "
                         "code (Kraft overflow)")
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    if nbits is not None:
        if nbits > bits.size:
            raise ValueError("decode: bitstream shorter than declared")
        bits = bits[:nbits]
    out = np.empty(n_symbols, dtype=np.uint8)
    pos = 0
    total = bits.size
    for i in range(n_symbols):
        c = 0
        length = 0
        while True:
            if pos >= total:
                raise ValueError("decode: truncated bitstream")
            c = (c << 1) | int(bits[pos])
            pos += 1
            length += 1
            fc = first_code.get(length)
            if fc is not None and fc <= c < fc + count[length]:
                out[i] = syms_sorted[first_idx[length] + (c - fc)]
                break
            if length > MAX_LEN:
                raise ValueError("decode: invalid prefix")
    return out
