"""Upright SURF (U-SURF) keypoints + 64-dim descriptors, pure numpy.

Covers the last SURVEY.md §2 row (K6): the reference creates
``cv.xfeatures2d_SURF(hessianThreshold=400, upright=True)`` at
``feature extraction.py:9`` and calls ``detectAndCompute`` per channel in
``calc_descriptor`` (``feature extraction.py:27-35``) — dead code there
(the only call site, ``:122``, is commented out) and OpenCV-contrib-gated,
but part of the surveyed surface. This is an independent implementation
of the published algorithm (Bay, Ess, Tuytelaars, Van Gool, "Speeded-Up
Robust Features", CVIU 2008), NOT an OpenCV transliteration:

- integral image -> box-filter approximated Hessian (lobe L/3 filters at
  sizes 9/15/21/27 per octave, responses normalized by filter area,
  ``det = Dxx*Dyy - (0.9*Dxy)^2`` with the paper's 0.9 weight),
- strict 3x3x3 scale-space non-maximum suppression above a Hessian
  threshold (no sub-pixel interpolation — maxima stay on the sampling
  grid, so results are exactly reproducible across partitionings; the
  deliberate divergence from OpenCV's quadratic refinement is documented
  here rather than emulated),
- upright descriptor: 20s x 20s window, 4x4 subregions x 5x5 samples,
  Haar wavelets of size 2s, Gaussian sigma = 3.3s, per-subregion
  (sum dx, sum |dx|, sum dy, sum |dy|), L2-normalized to 64 dims.

Thresholds are calibrated to THIS response scale (area-normalized uint8
inputs); OpenCV bit-compatibility is neither claimed nor possible from a
clean-room build. Everything is vectorized — the per-keypoint sampling
grid is one fancy-indexed gather over the integral image, never a Python
loop over pixels.
"""

from __future__ import annotations

import numpy as np

#: filter sizes per octave (paper table: octave o spaces sizes by
#: 6 * 2**o; two octaves comfortably span the 64px fixtures)
OCTAVE_SIZES = ((9, 15, 21, 27), (15, 27, 39, 51))

HESSIAN_THRESHOLD = 400.0  # reference feature extraction.py:9

_DESC_DIM = 64


def integral_image(img: np.ndarray) -> np.ndarray:
    """(H, W) image -> (H+1, W+1) summed-area table, zero top/left rim."""
    ii = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=ii[1:, 1:])
    return ii


def _shift_box(ii: np.ndarray, b: int, r0: int, c0: int, r1: int, c1: int,
               out_shape: tuple[int, int]) -> np.ndarray:
    """Box sums over rows [r+r0, r+r1) x cols [c+c0, c+c1) for every
    center (r, c) on the inner grid r, c in [b, H-b) x [b, W-b)."""
    hh, ww = out_shape
    # integral-image corner index for row offset d at center r=b..H-b-1
    # is ii[b+d : b+d+hh]; all four corners share the same extent
    tl = ii[b + r0: b + r0 + hh, b + c0: b + c0 + ww]
    tr = ii[b + r0: b + r0 + hh, b + c1: b + c1 + ww]
    bl = ii[b + r1: b + r1 + hh, b + c0: b + c0 + ww]
    br = ii[b + r1: b + r1 + hh, b + c1: b + c1 + ww]
    return br - bl - tr + tl


def hessian_response(ii: np.ndarray, size: int) -> np.ndarray:
    """Area-normalized approximated det(H) at every pixel for one filter
    size; 0 where the filter does not fit inside the image."""
    h, w = ii.shape[0] - 1, ii.shape[1] - 1
    lobe = size // 3
    b = size // 2
    hh, ww = h - 2 * b, w - 2 * b
    det = np.zeros((h, w), dtype=np.float64)
    if hh <= 0 or ww <= 0:
        return det
    shape = (hh, ww)
    # Dyy: three (lobe x 2*lobe-1) boxes stacked vertically, weights
    # +1 / -2 / +1; columns span [-(lobe-1), lobe)
    c0, c1 = -(lobe - 1), lobe
    top = _shift_box(ii, b, -b, c0, -b + lobe, c1, shape)
    mid = _shift_box(ii, b, -b + lobe, c0, -b + 2 * lobe, c1, shape)
    bot = _shift_box(ii, b, -b + 2 * lobe, c0, -b + 3 * lobe, c1, shape)
    dyy = top - 2.0 * mid + bot
    # Dxx: the transpose layout
    left = _shift_box(ii, b, c0, -b, c1, -b + lobe, shape)
    cen = _shift_box(ii, b, c0, -b + lobe, c1, -b + 2 * lobe, shape)
    right = _shift_box(ii, b, c0, -b + 2 * lobe, c1, -b + 3 * lobe, shape)
    dxx = left - 2.0 * cen + right
    # Dxy: four lobe x lobe quadrant boxes skipping the center row/col
    tl_ = _shift_box(ii, b, -lobe, -lobe, 0, 0, shape)
    tr_ = _shift_box(ii, b, -lobe, 1, 0, 1 + lobe, shape)
    bl_ = _shift_box(ii, b, 1, -lobe, 1 + lobe, 0, shape)
    br_ = _shift_box(ii, b, 1, 1, 1 + lobe, 1 + lobe, shape)
    dxy = tl_ - tr_ - bl_ + br_
    inv_area = 1.0 / (size * size)
    dxx *= inv_area
    dyy *= inv_area
    dxy *= inv_area
    det[b: b + hh, b: b + ww] = dxx * dyy - (0.9 * dxy) ** 2
    return det


def detect_keypoints(img: np.ndarray,
                     hessian_threshold: float = HESSIAN_THRESHOLD,
                     octaves=OCTAVE_SIZES) -> np.ndarray:
    """(H, W) float image -> (N, 3) float array of (row, col, scale),
    sorted by (row, col, scale) for deterministic downstream order.

    A keypoint is a strict 26-neighbor maximum across the 3x3 spatial
    x 3-size neighborhood inside one octave, above the threshold."""
    return _detect_from_ii(integral_image(img), hessian_threshold, octaves)


def _detect_from_ii(ii: np.ndarray, hessian_threshold: float,
                    octaves=OCTAVE_SIZES) -> np.ndarray:
    found = []
    resp_cache: dict[int, np.ndarray] = {}  # sizes 15/27 recur across octaves
    for sizes in octaves:
        for s in sizes:
            if s not in resp_cache:
                resp_cache[s] = hessian_response(ii, s)
        resp = np.stack([resp_cache[s] for s in sizes])
        for layer in range(1, len(sizes) - 1):
            cur = resp[layer]
            cand = cur > hessian_threshold
            if not cand.any():
                continue
            # strict max vs all 26 neighbors, vectorized by shifting
            mx = np.full_like(cur, -np.inf)
            for dl in (-1, 0, 1):
                plane = resp[layer + dl]
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        if dl == 0 and dr == 0 and dc == 0:
                            continue
                        sh = np.full_like(cur, -np.inf)
                        r0, r1 = max(dr, 0), cur.shape[0] + min(dr, 0)
                        c0, c1 = max(dc, 0), cur.shape[1] + min(dc, 0)
                        sh[r0 - dr: r1 - dr, c0 - dc: c1 - dc] = \
                            plane[r0: r1, c0: c1]
                        np.maximum(mx, sh, out=mx)
            rows, cols = np.nonzero(cand & (cur > mx))
            scale = 1.2 * sizes[layer] / 9.0
            for r, c in zip(rows.tolist(), cols.tolist()):
                found.append((float(r), float(c), scale))
    if not found:
        return np.zeros((0, 3), dtype=np.float64)
    kps = np.array(sorted(set(found)), dtype=np.float64)
    return kps


def _haar_responses(ii: np.ndarray, rows: np.ndarray, cols: np.ndarray,
                    half: int) -> tuple[np.ndarray, np.ndarray]:
    """Haar-x / Haar-y responses of size 2*half at integer sample
    centers, computed from the integral image with index clamping (a
    sample whose wavelet leaves the image contributes its clamped box —
    the standard border policy for summed-area tables)."""
    h, w = ii.shape[0] - 1, ii.shape[1] - 1

    def box(r0, c0, r1, c1):
        r0 = np.clip(r0, 0, h)
        r1 = np.clip(r1, 0, h)
        c0 = np.clip(c0, 0, w)
        c1 = np.clip(c1, 0, w)
        return (ii[r1, c1] - ii[r0, c1] - ii[r1, c0] + ii[r0, c0])

    # x wavelet: right half (+), left half (-); both 2*half tall
    dx = (box(rows - half, cols, rows + half, cols + half)
          - box(rows - half, cols - half, rows + half, cols))
    # y wavelet: bottom half (+), top half (-)
    dy = (box(rows, cols - half, rows + half, cols + half)
          - box(rows - half, cols - half, rows, cols + half))
    return dx, dy


def describe_keypoints(img: np.ndarray, kps: np.ndarray) -> np.ndarray:
    """Upright 64-dim descriptors for (N, 3) keypoints; (N, 64) float64,
    each row L2-normalized (zero rows stay zero)."""
    return _describe_from_ii(integral_image(img), kps)


def _describe_from_ii(ii: np.ndarray, kps: np.ndarray) -> np.ndarray:
    if kps.shape[0] == 0:
        return np.zeros((0, _DESC_DIM), dtype=np.float64)
    # 20x20 sample lattice at offsets (i + 0.5) * s, i in -10..9
    grid = np.arange(-10, 10, dtype=np.float64) + 0.5
    gr, gc = np.meshgrid(grid, grid, indexing="ij")   # (20, 20)
    gauss = np.exp(-(gr ** 2 + gc ** 2) / (2.0 * 3.3 ** 2))
    sub_r = (np.arange(20) // 5)                       # 4x4 subregion ids
    sub_idx = (sub_r[:, None] * 4 + sub_r[None, :])    # (20, 20) in 0..15
    out = np.zeros((kps.shape[0], _DESC_DIM), dtype=np.float64)
    for i, (kr, kc, s) in enumerate(kps):
        half = max(1, int(round(s)))
        rows = np.rint(kr + gr * s).astype(np.int64)
        cols = np.rint(kc + gc * s).astype(np.int64)
        dx, dy = _haar_responses(ii, rows, cols, half)
        dx = dx * gauss
        dy = dy * gauss
        flat = sub_idx.ravel()
        vec = np.zeros((16, 4), dtype=np.float64)
        np.add.at(vec[:, 0], flat, dx.ravel())
        np.add.at(vec[:, 1], flat, np.abs(dx).ravel())
        np.add.at(vec[:, 2], flat, dy.ravel())
        np.add.at(vec[:, 3], flat, np.abs(dy).ravel())
        v = vec.ravel()
        n = np.linalg.norm(v)
        out[i] = v / n if n > 0 else v
    return out


def surf_detect_describe(img: np.ndarray,
                         hessian_threshold: float = HESSIAN_THRESHOLD
                         ) -> tuple[np.ndarray, np.ndarray]:
    """detectAndCompute analogue: (keypoints (N,3), descriptors (N,64)).
    The integral image is built once and shared by both stages."""
    ii = integral_image(img)
    kps = _detect_from_ii(ii, hessian_threshold)
    return kps, _describe_from_ii(ii, kps)
