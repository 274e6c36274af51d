from pct.eval.metrics import (
    d1_mse,
    d2_mse,
    d1_psnr,
    d2_psnr,
    color_psnr,
    hit_stats,
    psnr,
    bpp,
    bd_rate,
)

__all__ = [
    "d1_mse",
    "d2_mse",
    "d1_psnr",
    "d2_psnr",
    "color_psnr",
    "hit_stats",
    "psnr",
    "bpp",
    "bd_rate",
]
