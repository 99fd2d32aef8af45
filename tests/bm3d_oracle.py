"""Independent pure-numpy reference implementation of the two-stage BM3D
used to validate yondx/native/kernels.cpp (bm3d_ht_f32 / bm3d_wiener_f32).

Implements the published algorithm (Dabov et al., TIP 2007: block
matching, 2-D DCT per block, 1-D Haar across the group, hard threshold /
empirical Wiener, weighted aggregation) at the SAME parameterization the
C++ kernels use (8x8 blocks, step 4, radius-20 stride-2 search, groups of
up to 16 power-of-two blocks, aggregation weight 1/nnz resp. 1/sum(w^2)).

It was written from the algorithm description, not from the C++ — the
point is an independent oracle: a bug would have to be made twice, in two
languages, in two data layouts, to escape the parity test
(tests/test_bm3d_oracle.py). Float32 arithmetic throughout to keep the
comparison meaningful.
"""
from __future__ import annotations

import numpy as np

B = 8
STEP = 4
WIN = 20
GMAX = 16


def _dct_mat() -> np.ndarray:
    k = np.arange(B)[:, None].astype(np.float32)
    n = np.arange(B)[None, :].astype(np.float32)
    c = np.sqrt(np.where(k == 0, 1.0, 2.0) / B) * \
        np.cos(np.pi * (2 * n + 1) * k / (2 * B))
    return c.astype(np.float32)


_C = _dct_mat()


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """[G, B, B] -> orthonormal 2-D DCT-II per block."""
    return np.einsum("km,gmn,ln->gkl", _C, blocks, _C).astype(np.float32)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("mk,gmn,nl->gkl", _C, blocks, _C).astype(np.float32)


def _haar_fwd(spec: np.ndarray) -> np.ndarray:
    """Full 1-D Haar decomposition along axis 0 (length = power of 2):
    at each level the first half of the active segment becomes averages
    and the second half differences, then recurse on the first half."""
    s = spec.astype(np.float32).copy()
    g = s.shape[0]
    r = np.float32(np.sqrt(0.5))
    ln = g
    while ln > 1:
        a = (s[0:ln:2] + s[1:ln:2]) * r
        d = (s[0:ln:2] - s[1:ln:2]) * r
        s[:ln // 2] = a
        s[ln // 2:ln] = d
        ln //= 2
    return s


def _haar_inv(spec: np.ndarray) -> np.ndarray:
    s = spec.astype(np.float32).copy()
    g = s.shape[0]
    r = np.float32(np.sqrt(0.5))
    ln = 2
    while ln <= g:
        a = s[:ln // 2].copy()
        d = s[ln // 2:ln].copy()
        s[0:ln:2] = (a + d) * r
        s[1:ln:2] = (a - d) * r
        ln *= 2
    return s


def _ref_positions(H: int, W: int):
    ny = (H - B) // STEP + 1
    nx = (W - B) // STEP + 1
    ys = [min(by * STEP, H - B) for by in range(ny)]
    xs = [min(bx * STEP, W - B) for bx in range(nx)]
    return ys, xs


def _match(views: np.ndarray, y0: int, x0: int, H: int, W: int):
    """Block matching: stride-2 scan of the (2 WIN + 1)^2 window, squared
    L2 block distance, G = largest power of two <= min(GMAX, n_cands)
    nearest blocks (scan order breaks ties — matches std::partial_sort on
    distinct distances)."""
    ref = views[y0, x0]
    cand = []
    for dy in range(-WIN, WIN + 1, 2):
        yy = y0 + dy
        if yy < 0 or yy + B > H:
            continue
        for dx in range(-WIN, WIN + 1, 2):
            xx = x0 + dx
            if xx < 0 or xx + B > W:
                continue
            d = np.float32(np.sum((ref - views[yy, xx]) ** 2,
                                  dtype=np.float32))
            cand.append((d, yy, xx))
    g = min(GMAX, len(cand))
    order = sorted(range(len(cand)), key=lambda i: cand[i][0])[:g]
    p = 1
    while p * 2 <= g:
        p *= 2
    return [(cand[i][1], cand[i][2]) for i in order[:p]]


def bm3d_ht(src: np.ndarray, sigma: float, lambda3d: float = 2.7):
    src = np.ascontiguousarray(src, np.float32)
    H, W = src.shape
    num = np.zeros((H, W), np.float32)
    den = np.zeros((H, W), np.float32)
    views = np.lib.stride_tricks.sliding_window_view(src, (B, B))
    th = np.float32(lambda3d * sigma)
    ys, xs = _ref_positions(H, W)
    for y0 in ys:
        for x0 in xs:
            pos = _match(views, y0, x0, H, W)
            grp = _dct2(np.stack([views[y, x] for y, x in pos]))
            spec = np.stack([_haar_fwd(grp[:, i, j])
                             for i in range(B) for j in range(B)], axis=1)
            keep = np.abs(spec) > th
            nnz = int(keep.sum())
            spec = np.where(keep, spec, np.float32(0.0))
            rec = np.stack([_haar_inv(spec[:, c])
                            for c in range(B * B)], axis=1)
            blocks = _idct2(rec.reshape(len(pos), B, B))
            w = np.float32(1.0 / nnz if nnz > 0 else 1.0)
            for m, (y, x) in enumerate(pos):
                num[y:y + B, x:x + B] += w * blocks[m]
                den[y:y + B, x:x + B] += w
    out = np.where(den > 0, num / np.maximum(den, 1e-30), src)
    return out.astype(np.float32)


def bm3d_wiener(noisy: np.ndarray, pilot: np.ndarray, sigma: float):
    noisy = np.ascontiguousarray(noisy, np.float32)
    pilot = np.ascontiguousarray(pilot, np.float32)
    H, W = noisy.shape
    num = np.zeros((H, W), np.float32)
    den = np.zeros((H, W), np.float32)
    vn = np.lib.stride_tricks.sliding_window_view(noisy, (B, B))
    vp = np.lib.stride_tricks.sliding_window_view(pilot, (B, B))
    s2 = np.float32(sigma * sigma)
    ys, xs = _ref_positions(H, W)
    for y0 in ys:
        for x0 in xs:
            pos = _match(vp, y0, x0, H, W)
            gn = _dct2(np.stack([vn[y, x] for y, x in pos]))
            gp = _dct2(np.stack([vp[y, x] for y, x in pos]))
            sn = np.stack([_haar_fwd(gn[:, i, j])
                           for i in range(B) for j in range(B)], axis=1)
            sp = np.stack([_haar_fwd(gp[:, i, j])
                           for i in range(B) for j in range(B)], axis=1)
            p2 = sp * sp
            wien = p2 / (p2 + s2)
            sn = sn * wien
            wsum2 = np.float32(np.sum(wien * wien, dtype=np.float32))
            rec = np.stack([_haar_inv(sn[:, c])
                            for c in range(B * B)], axis=1)
            blocks = _idct2(rec.reshape(len(pos), B, B))
            w = np.float32(1.0 / wsum2 if wsum2 > 0 else 1.0)
            for m, (y, x) in enumerate(pos):
                num[y:y + B, x:x + B] += w * blocks[m]
                den[y:y + B, x:x + B] += w
    out = np.where(den > 0, num / np.maximum(den, 1e-30), pilot)
    return out.astype(np.float32)


def bm3d(img: np.ndarray, sigma: float, lambda3d: float = 2.7,
         stage: str = "full") -> np.ndarray:
    pilot = bm3d_ht(img, sigma, lambda3d)
    if stage == "ht":
        return pilot
    return bm3d_wiener(img, pilot, sigma)
