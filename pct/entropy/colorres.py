"""Color-residual coding helpers (the "CR" bitstream tail).

The residual stream pays the honest rate for per-voxel sensor color noise
the stride-8 latent cannot carry (PERF.md "Round-3 quality mechanics" #4):
``round((target - predicted) * 255 / step)`` symbols, rANS-coded with the
shipped Gaussian-conditional tables at per-channel scale indexes.

CR2 upgrade (round 4): residuals are rotated into an ORTHONORMAL opponent
color basis before quantization. ZED sensor color noise is strongly
luma-dominant, so the chroma channels land on small Gaussian scales and cost
a fraction of their RGB-basis rate — while orthonormality keeps the RGB MSE
of the quantization error identical (a rotation preserves L2), so the PSNR
math is unchanged. Measured on demo frames: ~25-35% fewer residual bytes at
equal step (see PERF.md round-4 table).

Residual targets generalize beyond exact-geometry rungs (reference decode
contract ``codec_parallel.py:465-502`` emits colors at whatever voxels the
top-k picked): for each DECODED voxel the target is the exact input color on
hits, the stride-2 input-cell mean color on misses whose parent cell is
occupied, and the prediction itself otherwise (zero residual).
"""

from __future__ import annotations

import numpy as np

# Orthonormal opponent basis (rows): luma, R-B opponent, green-magenta.
_S3, _S2, _S6 = np.sqrt(3.0), np.sqrt(2.0), np.sqrt(6.0)
OPPONENT = np.array(
    [
        [1 / _S3, 1 / _S3, 1 / _S3],
        [1 / _S2, 0.0, -1 / _S2],
        [1 / _S6, -2 / _S6, 1 / _S6],
    ],
    np.float64,
)


def residual_targets(
    frames, pred_frames, pack_keys
) -> tuple[np.ndarray, np.ndarray]:
    """Per decoded voxel: (target_color [N,3] float 0..1, pred [N,3] 0..1),
    concatenated over frames in the decoder's canonical order.

    ``pack_keys``: (b,x,y,z) int32 [N,4] -> uint64 key packer (the codec's
    ``_pack_occ_keys``)."""
    targets, preds = [], []
    for b, (fr, pf) in enumerate(zip(frames, pred_frames)):
        pts = np.asarray(fr["points"], np.int32)
        col = np.asarray(fr["colors"], np.float32)
        uniq, first = np.unique(pts, axis=0, return_index=True)
        ucol = col[first]
        dpts = np.asarray(pf["points"], np.int32)
        pcol = np.asarray(pf["colors"], np.float32)

        def keys(p):
            bs = np.concatenate([np.full((p.shape[0], 1), b, np.int32), p], axis=1)
            return pack_keys(bs)

        ik = keys(uniq)
        order = np.argsort(ik, kind="stable")
        ik_s, ucol_s = ik[order], ucol[order]
        dk = keys(dpts)
        pos = np.searchsorted(ik_s, dk)
        pos_c = np.minimum(pos, ik_s.shape[0] - 1)
        hit = (ik_s[pos_c] == dk) if ik_s.size else np.zeros(dk.shape, bool)

        # stride-2 cell means of the input
        cells = uniq // 2 * 2
        ck = keys(cells)
        cu, cinv = np.unique(ck, return_inverse=True)
        csum = np.zeros((cu.shape[0], 3), np.float64)
        np.add.at(csum, cinv, ucol)
        ccnt = np.bincount(cinv, minlength=cu.shape[0]).astype(np.float64)
        cmean = (csum / ccnt[:, None]).astype(np.float32)
        dck = keys(dpts // 2 * 2)
        cpos = np.searchsorted(cu, dck)
        cpos_c = np.minimum(cpos, cu.shape[0] - 1)
        cfound = (cu[cpos_c] == dck) if cu.size else np.zeros(dck.shape, bool)

        tgt = pcol.copy()
        tgt[cfound] = cmean[cpos_c[cfound]]
        tgt[hit] = ucol_s[pos_c[hit]]
        targets.append(tgt)
        preds.append(pcol)
    return np.concatenate(targets, axis=0), np.concatenate(preds, axis=0)


def encode_residuals(gc, gc_tables, res_255: np.ndarray, step: int, transform: bool):
    """(res in 0-255 units [N,3]) -> (scale_idx tuple[3], rANS string)."""
    r = np.asarray(res_255, np.float64)
    if transform:
        r = r @ OPPONENT.T
    syms = np.round(r / float(step)).astype(np.int32)
    sigma = np.maximum(syms.astype(np.float64).std(axis=0), 0.12)
    table = gc.scale_table
    scale_idx = tuple(int((s > table[:-1]).sum()) for s in sigma)
    idx = np.repeat(
        np.asarray(scale_idx, np.int32)[None, :], syms.shape[0], axis=0
    ).ravel()
    return scale_idx, gc.compress_symbols(gc_tables, syms.ravel(), idx)


def decode_residuals(
    gc, gc_tables, string: bytes, scale_idx, n: int, step: int, transform: bool
) -> np.ndarray:
    """-> residuals in 0-255 RGB units [n, 3]."""
    idx = np.repeat(np.asarray(scale_idx, np.int32)[None, :], n, axis=0).ravel()
    syms = gc.decompress(gc_tables, string, idx).reshape(n, 3)
    r = syms.astype(np.float64) * float(step)
    if transform:
        r = r @ OPPONENT  # inverse of the orthonormal rotation
    return r.astype(np.float32)
