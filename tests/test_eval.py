"""Metric + evaluation-pipeline tests."""

import numpy as np
import pandas as pd

from pct.eval import bd_rate, bpp, color_psnr, d1_psnr, d2_psnr, psnr
from pct.utils import append_csv_row
from pct.utils.ply import read_ply, write_ply


def test_d1_identity_and_shift(rng):
    # well-separated points (spacing 5) so a unit shift keeps correspondences
    a = np.unique(rng.integers(0, 100, (500, 3)), axis=0).astype(np.float64) * 5
    assert d1_psnr(a, a) == float("inf")
    b = a + np.array([1, 0, 0])
    p = d1_psnr(a, b, peak=1023.0)
    assert abs(p - 10 * np.log10(1023.0**2 / 1.0)) < 1e-6


def test_d2_plane_better_than_d1():
    # points shifted within their surface plane: D2 error ~0, D1 error > 0
    g = np.stack(np.meshgrid(np.arange(30.0), np.arange(30.0)), -1).reshape(-1, 2)
    a = np.concatenate([g, np.zeros((len(g), 1))], axis=1)
    b = a + np.array([0.5, 0.0, 0.0])
    assert d2_psnr(a, b, peak=30.0) > d1_psnr(a, b, peak=30.0) + 10


def test_color_psnr(rng):
    pts = rng.integers(0, 50, (200, 3)).astype(np.float64)
    cols = rng.random((200, 3))
    assert color_psnr(pts, cols, pts, cols) == float("inf")
    noisy = np.clip(cols + rng.normal(0, 0.1, cols.shape), 0, 1)
    p = color_psnr(pts, cols, pts, noisy)
    assert 15 < p < 30


def test_bd_rate_sign():
    psnr_pts = [60, 65, 70, 75]
    rate_a = [1.0, 2.0, 4.0, 8.0]
    rate_b = [0.8, 1.6, 3.2, 6.4]  # 20% cheaper everywhere
    assert abs(bd_rate(rate_a, psnr_pts, rate_b, psnr_pts) - (-20.0)) < 0.5
    assert abs(bd_rate(rate_a, psnr_pts, rate_a, psnr_pts)) < 1e-6


def test_bpp():
    assert bpp(1000, 1000) == 8.0


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(0, 10, (100, 3)).astype(np.float32)
    cols = rng.random((100, 3)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"t_{binary}.ply")
        write_ply(p, pts, cols, binary=binary)
        rp, rc = read_ply(p)
        np.testing.assert_allclose(rp, pts, atol=1e-4)
        np.testing.assert_allclose(rc, np.round(cols * 255) / 255, atol=1 / 255)


def test_plot_pipeline(tmp_path):
    from pct.eval.plot import plot

    sender = str(tmp_path / "s.csv")
    receiver = str(tmp_path / "r.csv")
    for i in range(5):
        t0 = 100.0 + i
        append_csv_row(
            sender,
            {
                "ID": i,
                "num_points": 1000 + i,
                "time_measurements": {
                    "analysis": 0.1,
                    "hyper_analysis": 0.01,
                    "factorized_model": 0.02,
                    "hyper_synthesis": 0.05,
                    "gaussian_model": 0.03,
                    "geometry_compression": 0.04,
                    "bitstream_writing": 0.01,
                },
                "timestamps": {
                    "capturing": t0,
                    "sampling": t0 + 0.1,
                    "codec_end": t0 + 0.5,
                    "server_published": t0 + 0.6,
                },
            },
        )
        append_csv_row(
            receiver,
            {
                "ID": i,
                "time_measurements": {
                    "bitstream_reading": 0.001,
                    "geometry_decompression": 0.02,
                    "factorized_model": 0.01,
                    "hyper_synthesis": 0.02,
                    "guassian_model": 0.02,
                    "synthesis_transform": 0.2,
                },
                "timestamps": {
                    "client_received": t0 + 0.8,
                    "decoder_finished": t0 + 1.1,
                    "client_playout_scheduled": t0 + 1.2,
                },
            },
        )
    out = plot(sender, receiver, out_dir=str(tmp_path / "figs"), name="test")
    assert len(out) >= 2
    import os

    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in out)


def test_software_renderer(tmp_path, rng):
    """The headless point splatter: deterministic, z-buffered (nearest
    voxel wins), writes a readable PNG comparison."""
    from pct.eval.render import render_comparison, render_points

    n = 500
    pts = rng.integers(0, 64, (n, 3)).astype(np.int32)
    cols = rng.random((n, 3)).astype(np.float32)
    img = render_points(pts, cols, size=96, splat=1)
    assert img.shape == (96, 96, 3)
    # occlusion: two points on the same pixel, nearest (max depth-axis) wins
    pts2 = np.array([[10, 10, 0], [10, 10, 50]], np.int32)
    cols2 = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    img2 = render_points(pts2, cols2, size=8, splat=1)
    filled = img2.reshape(-1, 3)
    reds = (filled == np.array([0, 1, 0], np.float32)).all(axis=1).sum()
    assert reds >= 1  # the z=50 (closer) green point won the pixel
    out = str(tmp_path / "cmp.png")
    render_comparison(out, {"points": pts, "colors": cols}, {"points": pts, "colors": cols}, size=96)
    import os

    assert os.path.getsize(out) > 1000
