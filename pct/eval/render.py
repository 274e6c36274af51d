"""Software point-cloud renderer: decoded frames -> PNG snapshots.

The reference demo's acceptance test is ultimately *visual* — a human watches
the Three.js viewer (``receiver/visualizer/main.js``) and judges whether the
streamed person looks right. This image has no browser, so this module
provides the headless equivalent: an orthographic z-buffer point splatter
(numpy only) that renders decoded frames to PNG, used by the evaluation
scripts to put before/after reconstruction images next to the RD numbers.

Not a product renderer — a measurement instrument (matplotlib writes the
PNG; no GL, no deps beyond what's baked in).
"""

from __future__ import annotations

import numpy as np


def render_points(
    points: np.ndarray,
    colors: np.ndarray,
    size: int = 640,
    axis: str = "z",
    splat: int = 2,
    background: float = 1.0,
) -> np.ndarray:
    """Orthographic z-buffered splat of ``points`` [N,3] int/float with
    ``colors`` [N,3] in [0,1] onto an RGB image [size, size, 3] float.

    ``axis``: the depth axis ("x" | "y" | "z"); the remaining two span the
    image plane. ``splat``: square splat side in pixels (covers the gaps
    between voxels at typical densities, like the viewer's point sprites).
    """
    pts = np.asarray(points, np.float64)
    col = np.asarray(colors, np.float64)
    if pts.shape[0] == 0:
        return np.full((size, size, 3), background, np.float32)
    ai = {"x": 0, "y": 1, "z": 2}[axis]
    plane = [i for i in range(3) if i != ai]
    p2 = pts[:, plane]
    depth = pts[:, ai]

    lo, hi = p2.min(axis=0), p2.max(axis=0)
    span = float(max((hi - lo).max(), 1.0))
    margin = 0.04 * span
    scale = (size - 1) / (span + 2 * margin)
    xy = ((p2 - lo + margin) * scale).astype(np.int64)
    xy = np.clip(xy, 0, size - 1)

    img = np.full((size * size,), background, np.float64)
    img = np.stack([img, img, img], axis=1)
    # nearest-wins: depth-sort ONCE over the (point x splat-offset)
    # expansion so a later scatter write is always the closer surface —
    # per-offset passes let a far point's offset pixel overwrite a near
    # point's pixel from an earlier pass (ADVICE r3).
    n = xy.shape[0]
    s2 = splat * splat
    offs = np.stack(
        np.meshgrid(np.arange(splat), np.arange(splat), indexing="ij"), axis=-1
    ).reshape(s2, 2)
    px = np.clip(xy[:, None, 0] + offs[None, :, 0], 0, size - 1)
    py = np.clip(xy[:, None, 1] + offs[None, :, 1], 0, size - 1)
    flat = (py * size + px).reshape(n * s2)
    depth_e = np.repeat(depth, s2)
    col_e = np.repeat(col, s2, axis=0)
    order = np.argsort(depth_e, kind="stable")
    img[flat[order]] = col_e[order]
    # y axis points up in the image
    out = img.reshape(size, size, 3)[::-1].astype(np.float32)
    return out


def save_png(path: str, image: np.ndarray) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(path, np.clip(image, 0.0, 1.0))


def render_comparison(
    path: str,
    original: dict,
    decoded: dict,
    size: int = 640,
    axis: str = "z",
    title: str = "",
) -> None:
    """Side-by-side original vs decoded PNG (the visual acceptance check)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = render_points(original["points"], original["colors"], size=size, axis=axis)
    b = render_points(decoded["points"], decoded["colors"], size=size, axis=axis)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5.2))
    for ax, im, name in zip(axes, (a, b), ("original", "decoded")):
        ax.imshow(im)
        ax.set_title(name)
        ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
