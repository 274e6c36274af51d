"""Training input pipeline: canonical frame cache + batch sampler."""

import numpy as np
import pytest

from pct.train.data import FrameDataset, _canonical_frame, build_cache


def test_canonical_frame_dedup_and_order(rng):
    pts = rng.integers(-50, 50, (500, 3)).astype(np.int32)
    pts = np.concatenate([pts, pts[:100]])  # duplicates
    cols = rng.random((600, 3)).astype(np.float32)
    coords, colors, mask, n = _canonical_frame(pts, cols, capacity=1024, seed=0)
    assert n == np.unique(pts, axis=0).shape[0]
    v = coords[:n].astype(np.int64)
    keys = (v[:, 1] + 2**15) * 4**16 + (v[:, 2] + 2**15) * 2**16 + (v[:, 3] + 2**15)
    assert np.all(np.diff(keys) > 0), "strictly increasing canonical order"
    assert not mask[n:].any() and mask[:n].all()


def test_canonical_frame_subsamples_not_crops(rng):
    # a frame over capacity must be randomly subsampled, not prefix-cropped
    pts = np.stack(
        [np.arange(2000, dtype=np.int32), np.zeros(2000, np.int32), np.zeros(2000, np.int32)],
        axis=1,
    )
    cols = rng.random((2000, 3)).astype(np.float32)
    coords, _, mask, n = _canonical_frame(pts, cols, capacity=512, seed=1)
    assert n == 512
    xs = coords[:n, 1].astype(np.int32)
    assert xs.max() > 1000, "subsample must reach the far end of the cloud"


def test_build_cache_and_sampler(tmp_path, rng):
    import pickle

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        pts = rng.integers(-40, 40, (300, 3)).astype(np.int16)
        pickle.dump(
            {
                "points": pts,
                "colors": rng.random((300, 3)),
                "timestamp": float(i),
            },
            open(d / f"frame_{i:05d}.pkl", "wb"),
        )
    path = build_cache([str(d)], capacity=512, cache_dir=str(tmp_path / "cache"))
    assert path == build_cache([str(d)], capacity=512, cache_dir=str(tmp_path / "cache"))
    ds = FrameDataset(path)
    assert len(ds) == 5
    coords, feats, mask = ds.sample(np.random.default_rng(0), 3)
    assert coords.shape == (3, 512, 4) and feats.shape == (3, 512, 4)
    assert feats[..., 0][mask].min() == 1.0  # constant-1 channel on valid rows
    assert np.all(feats[..., 1:][~mask] == 0)
    assert coords.dtype == np.int32 and feats.dtype == np.float32
