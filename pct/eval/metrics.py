"""Point-cloud quality metrics: D1/D2 PSNR, color PSNR, bpp.

Implements the MPEG pc_error conventions the north-star targets are measured
in (BASELINE.json: "BD-rate and D1/D2 PSNR parity"): symmetric
point-to-point (D1) and point-to-plane (D2, normals from local PCA) mean
squared errors, PSNR with the voxel-grid peak. Host-side (scipy cKDTree);
evaluation is offline.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def _nn(a: np.ndarray, b: np.ndarray):
    """For each point of a: (distance, index) of nearest neighbor in b."""
    tree = cKDTree(b)
    d, i = tree.query(a, k=1)
    return d, i


def _pca_normals(pts: np.ndarray, k: int = 12) -> np.ndarray:
    tree = cKDTree(pts)
    k = min(k, len(pts))
    _, idx = tree.query(pts, k=k)
    nb = pts[idx]  # [N, k, 3]
    nb = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nb, nb) / max(k - 1, 1)
    _, vecs = np.linalg.eigh(cov)
    return vecs[:, :, 0]  # smallest-eigenvalue direction


def d1_mse(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric point-to-point MSE."""
    da, _ = _nn(a, b)
    db, _ = _nn(b, a)
    return float(max(np.mean(da**2), np.mean(db**2)))


def d2_mse(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric point-to-plane MSE (normals of the *reference* cloud)."""
    na = _pca_normals(a)
    nb = _pca_normals(b)

    def one_way(src, dst, dst_normals):
        _, idx = _nn(src, dst)
        err = np.einsum("nd,nd->n", src - dst[idx], dst_normals[idx])
        return np.mean(err**2)

    return float(max(one_way(a, b, nb), one_way(b, a, na)))


def psnr(mse: float, peak: float) -> float:
    if mse <= 0:
        return float("inf")
    return float(10.0 * np.log10(peak**2 / mse))


def d1_psnr(a, b, peak: float = 1023.0) -> float:
    return psnr(d1_mse(np.asarray(a, np.float64), np.asarray(b, np.float64)), peak)


def d2_psnr(a, b, peak: float = 1023.0) -> float:
    return psnr(d2_mse(np.asarray(a, np.float64), np.asarray(b, np.float64)), peak)


def color_psnr(a_pts, a_cols, b_pts, b_cols, peak: float = 1.0) -> float:
    """Y-less RGB PSNR over nearest-neighbor correspondences (symmetric)."""
    a_pts, b_pts = np.asarray(a_pts, np.float64), np.asarray(b_pts, np.float64)
    a_cols, b_cols = np.asarray(a_cols, np.float64), np.asarray(b_cols, np.float64)
    _, i_ab = _nn(a_pts, b_pts)
    _, i_ba = _nn(b_pts, a_pts)
    mse = max(
        np.mean((a_cols - b_cols[i_ab]) ** 2), np.mean((b_cols - a_cols[i_ba]) ** 2)
    )
    return psnr(float(mse), peak)


def hit_stats(a_pts, a_cols, b_pts, b_cols) -> tuple[float, float]:
    """(hit_rate, hit_color_psnr): the fraction of reconstructed voxels that
    exactly match input voxels, and the color PSNR over those matches.

    Decomposes the NN-mapped :func:`color_psnr`: on noisy captured data,
    adjacent-voxel colors differ by ~22 dB of sensor noise, so NN mapping
    through even slightly wrong geometry saturates the joint metric —
    hit_color_psnr isolates the codec's attribute fidelity from the
    occupancy-selection quality (hit_rate)."""
    a_pts = np.asarray(a_pts, np.int64)
    b_pts = np.asarray(b_pts, np.int64)
    a_map = {tuple(p): i for i, p in enumerate(a_pts)}
    idx_a, idx_b = [], []
    for j, p in enumerate(b_pts):
        i = a_map.get(tuple(p))
        if i is not None:
            idx_a.append(i)
            idx_b.append(j)
    if not idx_b:
        return 0.0, 0.0
    mse = float(np.mean((np.asarray(a_cols)[idx_a] - np.asarray(b_cols)[idx_b]) ** 2))
    return len(idx_b) / max(len(b_pts), 1), psnr(mse, 1.0)


def bpp(num_bytes: int, num_points: int) -> float:
    return num_bytes * 8.0 / max(num_points, 1)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """Bjøntegaard delta-rate (%) of curve b vs curve a (piecewise-cubic in
    log-rate), over the overlapping PSNR interval."""
    ra, rb = np.log10(np.asarray(rate_a, float)), np.log10(np.asarray(rate_b, float))
    pa, pb = np.asarray(psnr_a, float), np.asarray(psnr_b, float)
    lo, hi = max(pa.min(), pb.min()), min(pa.max(), pb.max())
    if hi <= lo:
        raise ValueError("no PSNR overlap between curves")
    fa = np.polyfit(pa, ra, min(3, len(pa) - 1))
    fb = np.polyfit(pb, rb, min(3, len(pb) - 1))
    xs = np.linspace(lo, hi, 256)
    ia = np.trapezoid(np.polyval(fa, xs), xs)
    ib = np.trapezoid(np.polyval(fb, xs), xs)
    avg_diff = (ib - ia) / (hi - lo)
    return float((10**avg_diff - 1) * 100)
