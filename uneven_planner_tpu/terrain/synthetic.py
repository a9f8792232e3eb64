"""Synthetic analytic terrains for tests and benchmarks.

The reference ships PCD point clouds for desert/forest/mountain/vocano but the
hill scene's cloud is absent from the repo snapshot (only run_hill.yaml
remains), so the canonical "hill" benchmark terrain here is generated
analytically: a smooth sum-of-Gaussians height field whose tangent-plane
normals and flatness are computed in closed form on the same 200x200x64 grid
the reference would build (run_hill.yaml:3-10).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.config import MapConfig
from uneven_planner_tpu.terrain import grid as tgrid


def hill_height(x, y):
    """Smooth hills on a 10x10 m patch, gradients well inside attitude
    limits except on the steep central mound."""
    return (0.55 * np.exp(-((x - 1.5) ** 2 + (y - 1.0) ** 2) / 2.8)
            + 0.45 * np.exp(-((x + 2.0) ** 2 + (y + 2.2) ** 2) / 3.5)
            + 0.9 * np.exp(-((x + 0.5) ** 2 + (y - 3.0) ** 2) / 0.6)
            + 0.05 * np.sin(1.3 * x) * np.cos(1.1 * y))


def make_synthetic_grid(cfg: MapConfig | None = None,
                        roughness: float = 0.012,
                        dtype=np.float64) -> tgrid.TerrainGrid:
    """Analytic RXS2 grid: zb from the surface normal, sigma a smooth
    pseudo-roughness with mild yaw dependence (to exercise the SO(2) dim)."""
    cfg = cfg or MapConfig()
    nx, ny, nyaw = cfg.voxel_num
    ox, oy, oyaw = cfg.map_origin
    xs = (np.arange(nx) + 0.5) * cfg.xy_resolution + ox
    ys = (np.arange(ny) + 0.5) * cfg.xy_resolution + oy
    yaws = (np.arange(nyaw) + 0.5) * cfg.yaw_resolution + oyaw
    X, Y = np.meshgrid(xs, ys, indexing="ij")

    Z = hill_height(X, Y)
    eps = 1e-4
    dzdx = (hill_height(X + eps, Y) - hill_height(X - eps, Y)) / (2 * eps)
    dzdy = (hill_height(X, Y + eps) - hill_height(X, Y - eps)) / (2 * eps)
    norm = np.sqrt(dzdx ** 2 + dzdy ** 2 + 1.0)
    zb0 = -dzdx / norm
    zb1 = -dzdy / norm

    slope2 = dzdx ** 2 + dzdy ** 2
    sigma_xy = roughness * slope2 / (1.0 + slope2)

    data = np.zeros((nx, ny, nyaw, 4), dtype=dtype)
    data[..., 0] = Z[:, :, None]
    data[..., 2] = zb0[:, :, None]
    data[..., 3] = zb1[:, :, None]
    # mild smooth yaw dependence keeps the full SE(2) lookup honest
    data[..., 1] = sigma_xy[:, :, None] * (1.0 + 0.2 * np.cos(yaws)[None, None, :])

    return tgrid.from_buffers(
        jnp.asarray(data), min_cnormal=cfg.min_cnormal, max_rho=cfg.max_rho,
        xy_resolution=cfg.xy_resolution, yaw_resolution=cfg.yaw_resolution,
        origin=cfg.map_origin, gravity=cfg.gravity)
