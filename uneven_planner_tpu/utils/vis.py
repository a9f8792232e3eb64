"""Visualization exports for the terrain field and the front-end search.

ROS-free equivalents of the reference's visualization publishers, emitting
point/segment arrays (and simple PLY/CSV files) a viewer or notebook can
render:

  - `field_cloud`       — the filtered RXS2 map cloud: one point per free
                          (x, y) cell at a yaw slice, with terrain height z
                          and intensity sigma (UnevenMap::visCallback,
                          uneven_map.cpp:189-220).
  - `normal_segments`   — the zb surface-normal line list (p1 -> p1 +
                          1.5*res*(zb, c), every 2nd cell each way,
                          uneven_map.cpp:181-215).
  - `so2_pose_markers`  — the sparse SE(2)->SE(3) lifted pose probes over
                          all yaw bins (so2_test markers,
                          uneven_map.cpp:222-265).
  - `occupancy_cloud`   — occupied cells of the yaw slice.
  - `expanded_nodes`    — the batched front end's expanded search nodes
                          (KinoAstar::visExpanded, kino_astar.cpp:266-276);
                          pass the arena returned by
                          `kino_init.plan(..., with_arena=True)`.
  - `save_ply` / `save_csv` — trivial writers for the above.
"""

from __future__ import annotations

import math

import numpy as np


def _np(a):
    return np.asarray(a)


def field_cloud(grid, yaw: float = 0.0):
    """[N, 4] (x, y, z, sigma) over free cells of the yaw slice nearest
    `yaw` (the reference publishes one fixed slice)."""
    nx, ny, nyaw = grid.voxel_num
    ox, oy, oyaw = grid.origin
    w = int(np.clip(math.floor((yaw - oyaw) / grid.yaw_resolution),
                    0, nyaw - 1))
    data = _np(grid.data)[:, :, w, :]
    occ = _np(grid.occ)[:, :, w]
    xs = (np.arange(nx) + 0.5) * grid.xy_resolution + ox
    ys = (np.arange(ny) + 0.5) * grid.xy_resolution + oy
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    free = ~occ
    return np.stack([X[free], Y[free], data[..., 0][free],
                     data[..., 1][free]], axis=1)


def occupancy_cloud(grid, yaw: float = 0.0):
    """[N, 3] occupied cell centers of the yaw slice (z from the field)."""
    nx, ny, nyaw = grid.voxel_num
    ox, oy, oyaw = grid.origin
    w = int(np.clip(math.floor((yaw - oyaw) / grid.yaw_resolution),
                    0, nyaw - 1))
    data = _np(grid.data)[:, :, w, :]
    occ = _np(grid.occ)[:, :, w]
    xs = (np.arange(nx) + 0.5) * grid.xy_resolution + ox
    ys = (np.arange(ny) + 0.5) * grid.xy_resolution + oy
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([X[occ], Y[occ], data[..., 0][occ]], axis=1)


def normal_segments(grid, yaw: float = 0.0, stride: int = 2):
    """[M, 2, 3] zb line segments: cell center -> center + 1.5*res*(zb, c)
    (the reference thins to every 2nd cell each way)."""
    nx, ny, nyaw = grid.voxel_num
    ox, oy, oyaw = grid.origin
    w = int(np.clip(math.floor((yaw - oyaw) / grid.yaw_resolution),
                    0, nyaw - 1))
    data = _np(grid.data)[::stride, ::stride, w, :]
    occ = _np(grid.occ)[::stride, ::stride, w]
    xs = ((np.arange(nx) + 0.5) * grid.xy_resolution + ox)[::stride]
    ys = ((np.arange(ny) + 0.5) * grid.xy_resolution + oy)[::stride]
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    free = ~occ
    zb = data[..., 2:4]
    c = np.sqrt(np.maximum(1.0 - np.sum(zb * zb, axis=-1), 0.0))
    p1 = np.stack([X[free], Y[free], data[..., 0][free]], axis=1)
    d = 1.5 * grid.xy_resolution
    p2 = p1 + d * np.stack([zb[..., 0][free], zb[..., 1][free], c[free]],
                           axis=1)
    return np.stack([p1, p2], axis=1)


def so2_pose_markers(grid, r_res: float = 0.8):
    """(points [M, 3], segments [M, 2, 3]): the sparse SE(2)->SE(3) lifted
    pose probes over every yaw bin (uneven_map.cpp:222-265): probe position
    offset r_res/2.5 along the heading, z lifted by the body-x probe
    (z - xb_z * 0.12), plus the zb segment from each probe."""
    nx, ny, nyaw = grid.voxel_num
    ox, oy, oyaw = grid.origin
    step = max(int(math.floor(r_res / grid.xy_resolution)), 1)
    data = _np(grid.data)
    pts, segs = [], []
    for xi in range(0, nx, step):
        for yi in range(0, ny, step):
            px = (xi + 0.5) * grid.xy_resolution + ox
            py = (yi + 0.5) * grid.xy_resolution + oy
            for wi in range(nyaw):
                pyaw = (wi + 0.5) * grid.yaw_resolution + oyaw
                rs2 = data[xi, yi, wi]
                zb = np.array([rs2[2], rs2[3],
                               math.sqrt(max(1.0 - rs2[2] ** 2
                                             - rs2[3] ** 2, 0.0))])
                xyaw = np.array([math.cos(pyaw), math.sin(pyaw), 0.0])
                yb = np.cross(zb, xyaw)
                nyb = np.linalg.norm(yb)
                yb = yb / (nyb if nyb > 0 else 1.0)
                xb = np.cross(yb, zb)
                p0 = np.array([px + r_res / 2.5 * math.cos(pyaw),
                               py + r_res / 2.5 * math.sin(pyaw),
                               rs2[0] - xb[2] * 0.12])
                pts.append(p0)
                segs.append([p0, p0 + 1.5 * grid.xy_resolution * zb])
    return np.asarray(pts), np.asarray(segs)


def expanded_nodes(arena_xyz: np.ndarray, arena_parent: np.ndarray):
    """[M, 3] SE(2) states of arena entries that were really expanded
    (parent >= 0; entry 0 is the start).  Feed the `arena` field of
    `kino_init.plan(..., with_arena=True)`."""
    a = _np(arena_xyz)
    par = _np(arena_parent)
    keep = np.zeros(a.shape[0], bool)
    keep[0] = True
    keep |= par >= 0
    return a[keep]


def save_csv(path: str, arr: np.ndarray, header: str = ""):
    np.savetxt(path, arr.reshape(arr.shape[0], -1), delimiter=",",
               header=header, comments="")


def save_ply(path: str, pts: np.ndarray, intensity: np.ndarray | None = None):
    """ASCII PLY point cloud (positions + optional scalar as 'intensity')."""
    n = pts.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if intensity is not None:
            f.write("property float intensity\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i, 0]:.5f} {pts[i, 1]:.5f} {pts[i, 2]:.5f}"
            if intensity is not None:
                row += f" {float(intensity[i]):.6f}"
            f.write(row + "\n")
