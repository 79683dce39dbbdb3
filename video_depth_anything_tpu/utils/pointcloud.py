"""Point-cloud export — parity with metric_depth/depth_to_pointcloud.py:50-68.

Pinhole unprojection with CLI focal lengths; written as binary little-endian
PLY directly (open3d is not in this image; the output is the same
xyz+rgb point cloud o3d.io.write_point_cloud produces).
"""
from __future__ import annotations

import numpy as np


def unproject_depth(depth: np.ndarray, focal_x: float, focal_y: float,
                    color: np.ndarray | None = None):
    """depth [H,W] -> points [N,3] (+ colors [N,3] in 0..1), principal point
    at the image center (depth_to_pointcloud.py:58-63)."""
    h, w = depth.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    x = (x - w / 2) / focal_x
    y = (y - h / 2) / focal_y
    points = np.stack((x * depth, y * depth, depth), axis=-1).reshape(-1, 3)
    colors = None
    if color is not None:
        colors = color.reshape(-1, 3).astype(np.float64) / 255.0
    return points, colors


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None):
    """Binary little-endian PLY with float xyz (+ uchar rgb)."""
    n = points.shape[0]
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    pts = points.astype("<f4")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if colors is None:
            f.write(pts.tobytes())
        else:
            rgb = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = pts
            rec["rgb"] = rgb
            f.write(rec.tobytes())


def read_ply(path: str):
    """Read back a PLY written by write_ply (tests/tools)."""
    with open(path, "rb") as f:
        raw = f.read()
    end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:end].decode("ascii").splitlines()
    n = int(next(l for l in header if l.startswith("element vertex")).split()[-1])
    has_rgb = any("red" in l for l in header)
    if has_rgb:
        rec = np.frombuffer(raw, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)],
                            count=n, offset=end)
        return rec["xyz"].copy(), rec["rgb"].astype(np.float64) / 255.0
    pts = np.frombuffer(raw, dtype="<f4", count=3 * n, offset=end)
    return pts.reshape(n, 3).copy(), None
