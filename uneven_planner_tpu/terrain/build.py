"""Batched SE(2) plane-fit terrain-map constructor.

TPU-native re-design of the reference map builder (reference:
src/uneven_planner/uneven_map/src/uneven_map.cpp:317-417 constructMap +
:5-43 filter): for every (x, y, yaw) cell, iter_num fixed-point iterations of
{orient an ellipsoid by the current surface estimate, collect cloud points
inside it, PCA plane fit}.

Instead of per-cell KD-tree queries, the cloud is bucketed once into a dense
xy grid sized to the search radius; every cell gathers its 3x3 bucket
neighborhood (a superset of the 0.2 m search ball), applies the
robot-aligned ellipsoid membership test (uneven_map.cpp:363-378), and runs a
closed-form 3x3 symmetric eigendecomposition — the whole map as chunked
`vmap` sweeps, ~5M fits in a few device seconds instead of minutes on CPU.

Matches the reference cell semantics:
- probe point offset 0.12 m along body-x (uneven_map.cpp:342)
- iteration 0 seeds z from the nearest-in-xy cloud point (:346-355)
- empty neighborhood -> default RXS2 with the probe z (:379-386)
- degenerate fit (NaN sigma) -> sigma=1, n=(1,0,0) (:33-37)
- sigma = 3*lambda_min/trace, z = mean z, normal flipped up (:28-38)
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.config import MapConfig
from uneven_planner_tpu.terrain import grid as tgrid

_P = jax.lax.Precision.HIGHEST


class CloudBuckets(NamedTuple):
    """Dense xy bucket grid over the padded point cloud.

    Coordinates are stored as three separate [M] vectors (NOT one [M, 3]
    tensor): every per-cell gather result then stays [C]-minor, where a
    [C, 3]-minor gather pays 42x (8, 128) tile padding under the chunked
    vmap — a 34.7 GiB allocation on the mountain scene's K=1035 buckets
    (round-4 OOM, same class as the round-3 frontend OOM)."""
    px: jax.Array        # [M] padded with a far sentinel point
    py: jax.Array
    pz: jax.Array
    bucket_idx: jax.Array  # [nbx, nby, K] indices into points (M = invalid)
    origin: tuple        # bucket grid origin (static)
    size: float          # bucket edge length (static)
    nb: tuple            # (nbx, nby) (static)


def build_buckets(points: np.ndarray, cfg: MapConfig,
                  bucket_size: float | None = None,
                  capacity: int | None = None) -> CloudBuckets:
    """Host-side bucketing; returns device-ready arrays."""
    r = max(cfg.ellipsoid_x, cfg.ellipsoid_y, cfg.ellipsoid_z)
    size = bucket_size or r
    lo = points[:, :2].min(axis=0) - 2 * size
    hi = points[:, :2].max(axis=0) + 2 * size
    nbx = int(math.ceil((hi[0] - lo[0]) / size))
    nby = int(math.ceil((hi[1] - lo[1]) / size))
    bx = np.floor((points[:, 0] - lo[0]) / size).astype(np.int64)
    by = np.floor((points[:, 1] - lo[1]) / size).astype(np.int64)
    flat = bx * nby + by
    order = np.argsort(flat, kind="stable")
    flat_sorted = flat[order]
    counts = np.bincount(flat_sorted, minlength=nbx * nby)
    K = capacity or int(counts.max())
    M = points.shape[0]
    bucket = np.full((nbx * nby, K), M, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(nbx * nby):
        c = min(counts[b], K)
        bucket[b, :c] = order[starts[b]:starts[b] + c]
    # sentinel point far away so invalid gathers fail every membership test
    pts_pad = np.concatenate([points, [[1e6, 1e6, 1e6]]], axis=0)
    return CloudBuckets(px=jnp.asarray(pts_pad[:, 0], jnp.float32),
                        py=jnp.asarray(pts_pad[:, 1], jnp.float32),
                        pz=jnp.asarray(pts_pad[:, 2], jnp.float32),
                        bucket_idx=jnp.asarray(
                            bucket.reshape(nbx, nby, K)),
                        origin=(float(lo[0]), float(lo[1])),
                        size=float(size), nb=(nbx, nby))


def _eigh3_smallest(cov):
    """Smallest eigenvalue + eigenvector of a symmetric 3x3 matrix, closed
    form (trigonometric eigenvalues; eigenvector via Cayley-Hamilton:
    (A - l1 I)(A - l2 I) has columns parallel to v3)."""
    q = jnp.trace(cov) / 3.0
    B = cov - q * jnp.eye(3, dtype=cov.dtype)
    p2 = jnp.sum(B * B) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B / p)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2 * p * jnp.cos(phi)
    l3 = q + 2 * p * jnp.cos(phi + 2 * jnp.pi / 3.0)
    l2 = 3 * q - l1 - l3
    C = jnp.matmul(cov - l1 * jnp.eye(3, dtype=cov.dtype),
                   cov - l2 * jnp.eye(3, dtype=cov.dtype), precision=_P)
    norms = jnp.sum(C * C, axis=0)
    v = C[:, jnp.argmax(norms)]
    v = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v), 1e-30))
    return jnp.stack([l3, l2, l1]), v  # ascending eigenvalues, v for l3


def _fit_cell(cell_pos, prev, buckets: CloudBuckets, cfg: MapConfig,
              first_iter: bool):
    """One plane-fit iteration for one SE(2) cell.

    cell_pos: [3] (x, y, yaw); prev: [4] (z, sigma, zb0, zb1).
    Returns the updated [4] RXS2 value.
    """
    zb = prev[2:4]
    c = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(zb * zb), 1e-12))
    yaw = cell_pos[2]
    xyaw = jnp.array([jnp.cos(yaw), jnp.sin(yaw), 0.0])
    zb3 = jnp.array([zb[0], zb[1], c])
    yb = jnp.cross(zb3, xyaw)
    yb = yb / jnp.sqrt(jnp.maximum(jnp.sum(yb * yb), 1e-30))
    xb = jnp.cross(yb, zb3)
    RT = jnp.stack([xb, yb, zb3])  # rows

    world_xy = cell_pos[:2] + xb[:2] * cfg.probe_offset

    # gather 3x3 bucket neighborhood
    ox, oy = buckets.origin
    bx = jnp.clip(((world_xy[0] - ox) / buckets.size).astype(jnp.int32),
                  1, buckets.nb[0] - 2)
    by = jnp.clip(((world_xy[1] - oy) / buckets.size).astype(jnp.int32),
                  1, buckets.nb[1] - 2)
    neigh = jax.lax.dynamic_slice(
        buckets.bucket_idx,
        (bx - 1, by - 1, jnp.zeros((), jnp.int32)),
        (3, 3, buckets.bucket_idx.shape[-1]))
    idx = neigh.reshape(-1)
    # channel-major coordinate gathers: three [C] vectors, no [C, 3] tensor
    gx = buckets.px[idx]
    gy = buckets.py[idx]
    gz = buckets.pz[idx]
    valid = idx < (buckets.px.shape[0] - 1)
    dtype = gx.dtype

    # z seed: nearest xy point (iteration 0 only, uneven_map.cpp:346-355)
    if first_iter:
        d2 = (gx - world_xy[0]) ** 2 + (gy - world_xy[1]) ** 2
        d2 = jnp.where(valid, d2, jnp.inf)
        z0 = gz[jnp.argmin(d2)]
        z0 = jnp.where(jnp.any(valid), z0, prev[0])
    else:
        z0 = prev[0]

    # robot-aligned ellipsoid membership (uneven_map.cpp:363-378)
    rx = gx - world_xy[0]
    ry = gy - world_xy[1]
    rz = gz - z0
    ax = RT[0, 0] * rx + RT[0, 1] * ry + RT[0, 2] * rz
    ay = RT[1, 0] * rx + RT[1, 1] * ry + RT[1, 2] * rz
    az = RT[2, 0] * rx + RT[2, 1] * ry + RT[2, 2] * rz
    member = valid & ((ax / cfg.ellipsoid_x) ** 2
                      + (ay / cfg.ellipsoid_y) ** 2
                      + (az / cfg.ellipsoid_z) ** 2 < 1.0)
    n = jnp.sum(member)

    w = member.astype(dtype)
    denom = jnp.maximum(n.astype(dtype), 1.0)
    mx = jnp.sum(gx * w) / denom
    my = jnp.sum(gy * w) / denom
    mz = jnp.sum(gz * w) / denom
    mean = jnp.stack([mx, my, mz])
    cx, cy, cz = (gx - mx) * w, (gy - my) * w, (gz - mz) * w
    # cov = rel_m.T @ rel_m / denom via the six weighted coordinate sums
    # (w is 0/1 so w**2 == w, matching the original rel_m outer product)
    cov = jnp.stack([
        jnp.stack([jnp.sum(cx * cx), jnp.sum(cx * cy), jnp.sum(cx * cz)]),
        jnp.stack([jnp.sum(cx * cy), jnp.sum(cy * cy), jnp.sum(cy * cz)]),
        jnp.stack([jnp.sum(cx * cz), jnp.sum(cy * cz), jnp.sum(cz * cz)]),
    ]) / denom

    evals, v = _eigh3_smallest(cov)
    v = jnp.where(v[2] < 0.0, -v, v)
    tr = jnp.sum(evals)
    sigma = 3.0 * evals[0] / tr

    # degenerate fit -> sigma 1, n=(1,0,0) (uneven_map.cpp:33-37)
    bad = ~jnp.isfinite(sigma) | (tr <= 1e-20)
    sigma = jnp.where(bad, 1.0, sigma)
    v = jnp.where(bad, jnp.array([1.0, 0.0, 0.0], dtype), v)

    fitted = jnp.array([mean[2], sigma, v[0], v[1]])
    empty_val = jnp.array([z0, 0.0, 0.0, 0.0])
    return jnp.where(n > 0, fitted, empty_val)


def construct_map(points: np.ndarray, cfg: MapConfig,
                  chunk: int = 65536, dtype=jnp.float32,
                  bucket_capacity: int | None = None) -> tgrid.TerrainGrid:
    """Build the full RXS2 grid from a (cropped, downsampled) cloud."""
    buckets = build_buckets(points, cfg, capacity=bucket_capacity)
    nx, ny, nyaw = cfg.voxel_num
    ox, oy, oyaw = cfg.map_origin
    n_cells = nx * ny * nyaw

    ids = np.arange(n_cells, dtype=np.int64)
    xs = (ids // (ny * nyaw)).astype(np.float64)
    ys = ((ids // nyaw) % ny).astype(np.float64)
    ws = (ids % nyaw).astype(np.float64)
    cell_pos = np.stack([
        (xs + 0.5) * cfg.xy_resolution + ox,
        (ys + 0.5) * cfg.xy_resolution + oy,
        (ws + 0.5) * cfg.yaw_resolution + oyaw,
    ], axis=1)

    pad = (-n_cells) % chunk
    cell_pos = np.concatenate(
        [cell_pos, np.zeros((pad, 3))], axis=0).astype(np.float32)
    n_chunks = cell_pos.shape[0] // chunk
    cell_pos = jnp.asarray(cell_pos.reshape(n_chunks, chunk, 3))

    @partial(jax.jit, static_argnames=("first",))
    def sweep(cells, values, buckets, first):
        return jax.vmap(lambda p, v: _fit_cell(p, v, buckets, cfg, first))(
            cells, values)

    values = jnp.zeros((n_chunks, chunk, 4), dtype)
    for it in range(cfg.iter_num):
        out = []
        for ci in range(n_chunks):
            out.append(sweep(cell_pos[ci], values[ci], buckets, it == 0))
        values = jnp.stack(out)

    data = values.reshape(-1, 4)[:n_cells].reshape(nx, ny, nyaw, 4)
    return tgrid.from_buffers(
        data, min_cnormal=cfg.min_cnormal, max_rho=cfg.max_rho,
        xy_resolution=cfg.xy_resolution, yaw_resolution=cfg.yaw_resolution,
        origin=cfg.map_origin, gravity=cfg.gravity)
