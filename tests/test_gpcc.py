"""Octree geometry coder tests (SURVEY.md §7 step 4)."""

import numpy as np
import pytest

from pct.gpcc import decode_points, encode_points


def as_set(a):
    return {tuple(r) for r in np.asarray(a).tolist()}


def unique_points(rng, n, lo, hi):
    pts = rng.integers(lo, hi, (4 * n, 3)).astype(np.int32)
    pts = np.unique(pts, axis=0)
    rng.shuffle(pts)
    return pts[:n]


def test_roundtrip_small(rng):
    pts = unique_points(rng, 500, -40, 40)
    stream = encode_points(pts)
    back = decode_points(stream)
    assert as_set(back) == as_set(pts)


def test_roundtrip_latent_like(rng):
    # stride-8 latent coords / 8 of a vox10-ish frame: ~8k pts in [0,128)
    pts = unique_points(rng, 8000, 0, 128)
    stream = encode_points(pts)
    back = decode_points(stream)
    assert as_set(back) == as_set(pts)
    bpp = len(stream) * 8 / len(pts)
    # random-uniform occupancy is near-incompressible; just sanity-bound it
    assert bpp < 24, bpp


def test_rate_on_structured_surface(rng):
    # a coherent 2D surface embedded in 3D should compress well below raw
    u = rng.integers(0, 256, 20000)
    v = rng.integers(0, 256, 20000)
    z = (np.sin(u / 17.0) * 20 + np.cos(v / 23.0) * 15).astype(np.int32) + 64
    pts = np.unique(np.stack([u, v, z], 1).astype(np.int32), axis=0)
    stream = encode_points(pts)
    back = decode_points(stream)
    assert as_set(back) == as_set(pts)
    bpp = len(stream) * 8 / len(pts)
    raw_bpp = 3 * np.ceil(np.log2(256))
    assert bpp < raw_bpp / 2, (bpp, raw_bpp)


def test_single_point_and_empty():
    one = np.array([[5, -3, 7]], np.int32)
    assert as_set(decode_points(encode_points(one))) == as_set(one)
    empty = np.zeros((0, 3), np.int32)
    assert decode_points(encode_points(empty)).shape == (0, 3)


def test_negative_and_large_coords(rng):
    pts = unique_points(rng, 300, -100000, 100000)
    assert as_set(decode_points(encode_points(pts))) == as_set(pts)


def test_collinear_degenerate():
    pts = np.stack([np.arange(100, dtype=np.int32), np.zeros(100, np.int32), np.zeros(100, np.int32)], 1)
    assert as_set(decode_points(encode_points(pts))) == as_set(pts)


def test_real_frame_coords():
    import glob, pickle

    files = sorted(glob.glob("/root/reference/evaluation/data/test/*.pkl"))
    if not files:
        pytest.skip("reference demo data not present")
    d = pickle.load(open(files[0], "rb"))
    pts = np.unique(d["points"].astype(np.int32), axis=0)
    stream = encode_points(pts)
    back = decode_points(stream)
    assert as_set(back) == as_set(pts)
    bpp = len(stream) * 8 / len(pts)
    assert bpp < 10, bpp  # real scans are highly structured
