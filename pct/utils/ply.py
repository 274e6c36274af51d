"""Minimal PLY point-cloud reader/writer (ascii + binary_little_endian).

Replaces the reference's Open3D PLY IO (``shared/utils.py:172-175,234``,
capturer recording) with a dependency-free implementation covering the
vertex-only point-cloud subset used by the demo and 8iVFB-style datasets:
float/double x,y,z and optional uchar red,green,blue."""

from __future__ import annotations

import numpy as np

_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> tuple[np.ndarray, np.ndarray | None]:
    """Returns ``(points [N,3] float32, colors [N,3] float32 in [0,1] | None)``."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        n_vertex = 0
        props: list[tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline().strip().decode("ascii", "replace")
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n_vertex = int(cnt)
            elif line.startswith("property") and in_vertex:
                parts = line.split()
                if parts[1] == "list":
                    raise ValueError("list properties unsupported in vertex element")
                props.append((parts[2], _DTYPES[parts[1]]))
            elif line == "end_header":
                break

        names = [p[0] for p in props]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vertex, ndmin=2)
            cols = {n: data[:, i] for i, (n, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dt = np.dtype([(n, "<" + d) for n, d in props])
            raw = np.frombuffer(f.read(dt.itemsize * n_vertex), dtype=dt)
            cols = {n: raw[n] for n in names}
        else:
            raise ValueError(f"unsupported PLY format {fmt}")

    pts = np.stack([cols["x"], cols["y"], cols["z"]], axis=1).astype(np.float32)
    colors = None
    if all(c in names for c in ("red", "green", "blue")):
        colors = (
            np.stack([cols["red"], cols["green"], cols["blue"]], axis=1).astype(np.float32)
            / 255.0
        )
    return pts, colors


def write_ply(
    path: str,
    points: np.ndarray,
    colors: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    """colors: float [N,3] in [0,1] or uint8 [N,3]."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    header = ["ply", f"format {'binary_little_endian' if binary else 'ascii'} 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = np.clip(np.round(colors * 255.0), 0, 255).astype(np.uint8)
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            if colors is not None:
                dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                               ("r", "u1"), ("g", "u1"), ("b", "u1")])
                rec = np.empty(n, dtype=dt)
                rec["x"], rec["y"], rec["z"] = points.T
                rec["r"], rec["g"], rec["b"] = colors.T
            else:
                dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
                rec = np.empty(n, dtype=dt)
                rec["x"], rec["y"], rec["z"] = points.T
            f.write(rec.tobytes())
        else:
            for i in range(n):
                row = f"{points[i,0]} {points[i,1]} {points[i,2]}"
                if colors is not None:
                    row += f" {colors[i,0]} {colors[i,1]} {colors[i,2]}"
                f.write((row + "\n").encode("ascii"))
