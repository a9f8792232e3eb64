"""SE(2) terrain field F: SE(2) -> R x S^2_+ as a dense JAX tensor.

TPU-native re-design of the reference terrain map (reference:
src/uneven_planner/uneven_map/include/uneven_map/uneven_map.h).  The map is a
dense grid over (x, y, yaw) — xy clamped, yaw periodic — whose cells hold the
RXS2 value (z, sigma, zb0, zb1): terrain height, flatness, and the xy
components of the tangent-plane normal (normal z = c = sqrt(1-|zb|^2),
uneven_map.h:46).

All lookups are pure functions of (grid, pos) and differentiable; batching is
`jax.vmap` over positions.  The trilinear interpolation with SO(2)-aware yaw
difference matches uneven_map.h:154-201, and its autodiff derivative equals
the reference's hand-written corner-difference gradient (uneven_map.h:258-315)
because trilinear interpolation is piecewise multilinear.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

TWO_PI = 2.0 * math.pi


def normalize_so2(yaw: jax.Array) -> jax.Array:
    """Branchless equivalent of UnevenMap::normSO2 (uneven_map.cpp:64-71):
    wrap into [-pi, pi)."""
    return yaw - TWO_PI * jnp.floor((yaw + jnp.pi) / TWO_PI)


def so2_diff(a: jax.Array, b: jax.Array) -> jax.Array:
    """Signed angular difference a-b wrapped into (-pi, pi]
    (atan2(sin, cos) form used at uneven_map.h:179)."""
    return jnp.arctan2(jnp.sin(a - b), jnp.cos(a - b))


@struct.dataclass
class TerrainGrid:
    """Dense RXS2 field plus derived occupancy.

    data:    [Nx, Ny, Nyaw, 4] channels (z, sigma, zb0, zb1)
    occ:     [Nx, Ny, Nyaw] bool — cell too steep / too rough
             (uneven_map.cpp:170-179: c < min_cnormal or sigma > max_rho)
    occ_xy:  [Nx, Ny] bool — 2D projection (any yaw occupied)
    """

    data: jax.Array
    occ: jax.Array
    occ_xy: jax.Array
    # Optional transposed yaw-pair gather table [8, Nx*Ny*Nyaw]: column
    # (x, y, w) holds the RXS2 cells at yaw w and (w+1) mod Nyaw, so one
    # trilinear lookup gathers 4 columns (the xy corners) instead of 8.  On
    # TPU the XLA gather unit moves <=32-byte items at a flat ~7 ns/item
    # (measured, v5e), so halving the item count halves the solver's
    # dominant cost; the channel-major (minor dim = samples) output keeps
    # every downstream tensor dense under the (8, 128) tiling instead of
    # paying 16-32x lane padding on a trailing channel dim.  Built by
    # `with_pair_table`; None disables the fast lookup path.
    data_pair: jax.Array | None = None
    # Optional SPLIT hi+lo bf16-packed (y, yaw)-pair gather table
    # [12, Nx*Ny*Nyaw] f32: column (x, y, w) packs the 12 values
    # {sigma, zb0, zb1} x {(y, w), (y, w+1), (y+1, w), (y+1, w+1)} as a
    # bf16 high part (words 0-5) plus a bf16 residual (words 6-11), so one
    # trilinear lookup gathers only the 2 x-corner columns — half the
    # items of `data_pair` (the XLA gather unit moves ~160 M items/s on
    # this TPU regardless of item bytes, so item COUNT is the solver's
    # dominant cost; measured 90% of the fused eval).  hi + lo
    # reconstructs the field to <= ~4e-6 relative — far below the solver
    # tolerances, unlike the abandoned single-bf16 variant whose ~4e-3
    # noise broke the line search (PLATFORM_NOTES.md §8).  Built by
    # `with_packed_table`; None disables the 2-item fast path.
    data_packed: jax.Array | None = None
    # Optional IEEE-f16 (y, yaw)-pair gather table [6, 2*Nx*Ny*Nyaw] f32:
    # column (x, y, w) packs the 12 values {sigma, zb0, zb1} x
    # {(y, w), (y, w+1), (y+1, w), (y+1, w+1)} as f16 pairs (two f16 per
    # f32 word), with an f16 RESIDUAL column at offset Ncells.  One
    # trilinear lookup gathers the 2 x-corner hi columns — 6-wide items,
    # which the XLA gather unit moves at the flat <=8-word rate (~2x
    # cheaper than the 12-wide packed items, e27/e28) — and, in exact
    # mode, the 2 residual columns too.  hi-only reconstructs the field to
    # <= ~2.5e-4 relative (f16 mantissa); hi+lo to <= ~2e-7.  Built by
    # `with_packed_f16`; None disables this path.
    data_packed16: jax.Array | None = None
    # Static geometry (hashable; changing them retriggers jit).
    xy_resolution: float = struct.field(pytree_node=False, default=0.05)
    yaw_resolution: float = struct.field(pytree_node=False, default=0.1)
    origin: Tuple[float, float, float] = struct.field(
        pytree_node=False, default=(-5.0, -5.0, -(math.pi + 2.5e-2)))
    gravity: float = struct.field(pytree_node=False, default=9.81)

    @property
    def voxel_num(self) -> Tuple[int, int, int]:
        return self.data.shape[:3]

    @property
    def map_size(self) -> Tuple[float, float, float]:
        n = self.voxel_num
        return (n[0] * self.xy_resolution, n[1] * self.xy_resolution,
                n[2] * self.yaw_resolution)

    @property
    def min_boundary(self) -> Tuple[float, float, float]:
        return self.origin

    @property
    def max_boundary(self) -> Tuple[float, float, float]:
        o, s = self.origin, self.map_size
        return (o[0] + s[0], o[1] + s[1], o[2] + s[2])


def from_buffers(data: jax.Array, min_cnormal: float, max_rho: float,
                 xy_resolution: float, yaw_resolution: float,
                 origin: Tuple[float, float, float],
                 gravity: float = 9.81) -> TerrainGrid:
    """Build a TerrainGrid from the raw RXS2 buffer, deriving occupancy
    (uneven_map.cpp:170-179)."""
    zb = data[..., 2:4]
    c = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(zb * zb, axis=-1), 0.0))
    occ = (c < min_cnormal) | (data[..., 1] > max_rho)
    occ_xy = jnp.any(occ, axis=-1)
    return TerrainGrid(data=data, occ=occ, occ_xy=occ_xy,
                       xy_resolution=xy_resolution,
                       yaw_resolution=yaw_resolution,
                       origin=origin, gravity=gravity)


# ---------------------------------------------------------------------------
# Index math (uneven_map.h:398-435)
# ---------------------------------------------------------------------------

def pos_to_index(grid: TerrainGrid, pos: jax.Array) -> jax.Array:
    o = jnp.asarray(grid.origin, dtype=pos.dtype)
    res_inv = jnp.asarray(
        [1.0 / grid.xy_resolution, 1.0 / grid.xy_resolution,
         1.0 / grid.yaw_resolution], dtype=pos.dtype)
    return jnp.floor((pos - o) * res_inv).astype(jnp.int32)


def index_to_pos(grid: TerrainGrid, idx: jax.Array,
                 dtype=jnp.float64) -> jax.Array:
    o = jnp.asarray(grid.origin, dtype=dtype)
    res = jnp.asarray(
        [grid.xy_resolution, grid.xy_resolution, grid.yaw_resolution],
        dtype=dtype)
    return (idx.astype(dtype) + 0.5) * res + o


def bound_index(grid: TerrainGrid, idx: jax.Array) -> jax.Array:
    """Clamp xy, wrap yaw (uneven_map.h:398-409)."""
    n = grid.voxel_num
    ix = jnp.clip(idx[..., 0], 0, n[0] - 1)
    iy = jnp.clip(idx[..., 1], 0, n[1] - 1)
    iyaw = jnp.mod(idx[..., 2], n[2])
    return jnp.stack([ix, iy, iyaw], axis=-1)


def is_in_map(grid: TerrainGrid, pos: jax.Array) -> jax.Array:
    lo = jnp.asarray(grid.min_boundary, dtype=pos.dtype)
    hi = jnp.asarray(grid.max_boundary, dtype=pos.dtype)
    return jnp.all(pos > lo + 1e-4) & jnp.all(pos < hi - 1e-4)


def is_occupancy(grid: TerrainGrid, pos: jax.Array) -> jax.Array:
    """SE(2) occupancy; out-of-map counts as occupied (reference returns -1
    for out-of-map, callers treat only ==1 as blocked; here out-of-map is
    blocked, which is the safe planning semantics)."""
    idx = bound_index(grid, pos_to_index(grid, pos))
    inside = is_in_map(grid, pos)
    return jnp.where(inside, grid.occ[idx[0], idx[1], idx[2]], True)


def is_occupancy_xy(grid: TerrainGrid, pos_xy: jax.Array) -> jax.Array:
    """2D occupancy from an (x, y[, ...]) position (uneven_map.h:490-500)."""
    o = jnp.asarray(grid.origin[:2], dtype=pos_xy.dtype)
    idx = jnp.floor((pos_xy[:2] - o) / grid.xy_resolution).astype(jnp.int32)
    n = grid.voxel_num
    inside = (idx[0] >= 0) & (idx[0] < n[0]) & (idx[1] >= 0) & (idx[1] < n[1])
    idx = jnp.clip(idx, 0, jnp.asarray([n[0] - 1, n[1] - 1]))
    return jnp.where(inside, grid.occ_xy[idx[0], idx[1]], True)


# ---------------------------------------------------------------------------
# Trilinear interpolation (uneven_map.h:154-201)
# ---------------------------------------------------------------------------

def _corner_setup(grid: TerrainGrid, pos: jax.Array):
    """Shared base-corner index + fractional offsets for trilinear lookup."""
    half = jnp.asarray(
        [0.5 * grid.xy_resolution, 0.5 * grid.xy_resolution,
         0.5 * grid.yaw_resolution], dtype=pos.dtype)
    pos_m = pos - half
    pos_m = pos_m.at[2].set(normalize_so2(pos_m[2]))
    idx = pos_to_index(grid, pos_m)
    idx_pos = index_to_pos(grid, idx, dtype=pos.dtype)
    diff = jnp.stack([
        (pos[0] - idx_pos[0]) / grid.xy_resolution,
        (pos[1] - idx_pos[1]) / grid.xy_resolution,
        so2_diff(pos[2], idx_pos[2]) / grid.yaw_resolution,
    ])
    return idx, diff


def _gather_corners(grid: TerrainGrid, idx: jax.Array) -> jax.Array:
    """[2,2,2,4] corner values with clamped-xy / wrapped-yaw indexing."""
    n = grid.voxel_num
    ix = jnp.clip(idx[0] + jnp.arange(2), 0, n[0] - 1)
    iy = jnp.clip(idx[1] + jnp.arange(2), 0, n[1] - 1)
    iyaw = jnp.mod(idx[2] + jnp.arange(2), n[2])
    return grid.data[ix[:, None, None], iy[None, :, None],
                     iyaw[None, None, :], :]


def get_terrain(grid: TerrainGrid, pos: jax.Array) -> jax.Array:
    """Interpolated RXS2 value (z, sigma, zb0, zb1) at SE(2) pos.

    Out-of-map positions return the default RXS2 (zeros), matching
    uneven_map.h:156-161.
    """
    idx, diff = _corner_setup(grid, pos)
    v = _gather_corners(grid, idx)  # [2,2,2,4]
    w = diff.astype(v.dtype)
    vx = v[0] * (1 - w[0]) + v[1] * w[0]        # [2,2,4]
    vy = vx[0] * (1 - w[1]) + vx[1] * w[1]      # [2,4]
    val = vy[0] * (1 - w[2]) + vy[1] * w[2]     # [4]
    return jnp.where(is_in_map(grid, pos), val, jnp.zeros_like(val))


def get_c(value: jax.Array) -> jax.Array:
    """Normal z-component c = sqrt(1 - |zb|^2) of an RXS2 value
    (uneven_map.h:46)."""
    zb = value[..., 2:4]
    return jnp.sqrt(jnp.maximum(1.0 - jnp.sum(zb * zb, axis=-1), 1e-12))


def get_terrain_with_grad(grid: TerrainGrid, pos: jax.Array):
    """Value plus analytic 4x3 gradient.

    Returns (value[4] = (z, sigma, zb0, zb1), grad[4,3]) where grad rows are
    d(sigma, zb0, zb1, c)/d(x, y, yaw) — exactly the corner-difference
    derivative of the trilinear interpolation plus the chain rule for c,
    mirroring uneven_map.h:258-315.
    """
    idx, diff = _corner_setup(grid, pos)
    v = _gather_corners(grid, idx)  # [2(x),2(y),2(yaw),4]
    w = diff
    vx = v[0] * (1 - w[0]) + v[1] * w[0]        # [2(y),2(yaw),4]
    vy = vx[0] * (1 - w[1]) + vx[1] * w[1]      # [2(yaw),4]  (v0, v1)
    val = vy[0] * (1 - w[2]) + vy[1] * w[2]

    svec = lambda a: a[..., 1:4]  # (sigma, zb0, zb1) rows
    g_yaw = svec(vy[1] - vy[0]) / grid.yaw_resolution
    dy = vx[1] - vx[0]  # [2(yaw),4]
    g_y = svec(dy[0] * (1 - w[2]) + dy[1] * w[2]) / grid.xy_resolution
    dx = v[1] - v[0]  # [2(y),2(yaw),4]
    g_x = svec((1 - w[2]) * (1 - w[1]) * dx[0, 0]
               + (1 - w[2]) * w[1] * dx[1, 0]
               + w[2] * (1 - w[1]) * dx[0, 1]
               + w[2] * w[1] * dx[1, 1]) / grid.xy_resolution
    grad3 = jnp.stack([g_x, g_y, g_yaw], axis=-1)  # [3 rows, 3 cols]
    c = get_c(val)
    grad_c = -(grad3[1] * val[2] + grad3[2] * val[3]) / c
    grad = jnp.concatenate([grad3, grad_c[None, :]], axis=0)  # [4,3]
    inside = is_in_map(grid, pos)
    return (jnp.where(inside, val, jnp.zeros_like(val)),
            jnp.where(inside, grad, jnp.zeros_like(grad)))


# ---------------------------------------------------------------------------
# Derived terrain variables (uneven_map.h:220-377)
# ---------------------------------------------------------------------------

def terrain_variables_from_value(value: jax.Array,
                                 yaw: jax.Array) -> jax.Array:
    """7-tuple {invCosVphix, sinPhix, invCosVphiy, sinPhiy, cosXi, invCosXi,
    sigma} from an RXS2 value and the yaw (uneven_map.h:221-256)."""
    zb = value[2:4]
    c = get_c(value)
    inv_c = 1.0 / c
    cyaw, syaw = jnp.cos(yaw), jnp.sin(yaw)
    t = cyaw * zb[0] + syaw * zb[1]          # xyaw . zb
    s = -(-syaw * zb[0] + cyaw * zb[1])      # -yyaw . zb
    sqrt_1_t2 = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    inv_sqrt_1_t2 = 1.0 / sqrt_1_t2
    return jnp.stack([
        inv_sqrt_1_t2,                 # invCosVphix
        -c * t * inv_sqrt_1_t2,        # sinPhix
        sqrt_1_t2 * inv_c,             # invCosVphiy
        s * inv_sqrt_1_t2,             # sinPhiy
        c,                             # cosXi
        inv_c,                         # invCosXi
        value[1],                      # sigma
    ])


def get_terrain_variables(grid: TerrainGrid, pos: jax.Array) -> jax.Array:
    return terrain_variables_from_value(get_terrain(grid, pos), pos[2])


def get_all_with_grad(grid: TerrainGrid, pos: jax.Array):
    """7-tuple values and [7,3] gradients w.r.t. (x, y, yaw), with the
    explicit chain rule of uneven_map.h:317-377 (kept as the parity oracle;
    the optimizer uses autodiff of `get_terrain_variables`, which must agree)."""
    value, rgrad = get_terrain_with_grad(grid, pos)  # rgrad rows: sig,zb0,zb1,c
    zb = value[2:4]
    c = get_c(value)
    inv_c = 1.0 / c
    cyaw, syaw = jnp.cos(pos[2]), jnp.sin(pos[2])
    t = cyaw * zb[0] + syaw * zb[1]
    s = syaw * zb[0] - cyaw * zb[1]
    sqrt_1_t2 = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    inv_sqrt = 1.0 / sqrt_1_t2
    inv_sqrt3 = inv_sqrt ** 3
    dzb = rgrad[1:3]                       # [2,3] d zb / d pos
    dt = dzb[0] * cyaw + dzb[1] * syaw     # [3]
    ds = dzb[0] * syaw - dzb[1] * cyaw
    dt = dt.at[2].add(-s)
    ds = ds.at[2].add(t)
    dc = rgrad[3]

    values = terrain_variables_from_value(value, pos[2])
    grads = jnp.stack([
        t * inv_sqrt3 * dt,                                   # invCosVphix
        -(t * inv_sqrt * dc + inv_sqrt3 * c * dt),            # sinPhix
        -inv_c * (t * inv_sqrt * dt + sqrt_1_t2 * inv_c * dc),  # invCosVphiy
        inv_sqrt * ds + t * inv_sqrt3 * s * dt,               # sinPhiy
        dc,                                                   # cosXi
        -inv_c * inv_c * dc,                                  # invCosXi
        rgrad[0],                                             # sigma
    ])
    return values, grads


# ---------------------------------------------------------------------------
# SE(2) -> SE(3) pose lift (uneven_map.h:203-218) and yaw recovery
# ---------------------------------------------------------------------------

def se3_lift(grid: TerrainGrid, pos: jax.Array):
    """Rotation R (columns xb, yb, zb) and 3D position at an SE(2) pose."""
    value = get_terrain(grid, pos)
    zb = jnp.array([value[2], value[3], get_c(value)])
    xyaw = jnp.array([jnp.cos(pos[2]), jnp.sin(pos[2]), 0.0])
    yb = jnp.cross(zb, xyaw)
    yb = yb / jnp.linalg.norm(yb)
    xb = jnp.cross(yb, zb)
    R = jnp.stack([xb, yb, zb], axis=1)
    p = jnp.array([pos[0], pos[1], value[0]])
    return R, p


def yaw_from_rotation(R: jax.Array) -> jax.Array:
    """Recover yaw from an SE(3) rotation produced by `se3_lift`
    (Sherman–Morrison form, uneven_map.cpp:56-62)."""
    p = R[:2, 2]
    b = R[:2, 0]
    M = jnp.eye(2) + jnp.outer(p, p) / (1.0 - jnp.dot(p, p))
    x = M @ b
    return jnp.arctan2(x[1], x[0])


def terrain_sigma(grid: TerrainGrid, pos: jax.Array) -> jax.Array:
    return get_terrain(grid, pos)[1]


def is_occupancy_xy_batch(grid: TerrainGrid, px: jax.Array,
                          py: jax.Array) -> jax.Array:
    """[M] 2D occupancy from [M] coordinate vectors — channel-major batch
    form of `is_occupancy_xy` (uneven_map.h:490-500).  The gather result is
    an [M]-minor bool vector, so large batches pay no (8, 128) lane padding
    (the scalar form under a wide vmap materializes awkward index tensors)."""
    nx, ny, _ = grid.voxel_num
    ox, oy, _ = grid.origin
    ix = jnp.floor((px - ox) / grid.xy_resolution).astype(jnp.int32)
    iy = jnp.floor((py - oy) / grid.xy_resolution).astype(jnp.int32)
    inside = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    lin = jnp.clip(ix, 0, nx - 1) * ny + jnp.clip(iy, 0, ny - 1)
    occ = jnp.take(grid.occ_xy.reshape(-1), lin, mode="clip")
    return jnp.where(inside, occ, True)


def terrain_sigma_cm(grid: TerrainGrid, px: jax.Array, py: jax.Array,
                     yaw: jax.Array) -> jax.Array:
    """[M] interpolated sigma from [M] coordinate vectors (yaw normalized
    into [-pi, pi)), channel-major.

    The batched front end scores every expansion candidate by flatness
    (kino_astar.cpp:187-195 w_sigma term); routing it through the scalar
    `get_terrain` under a wide vmap materializes a [..., 2,2,2,4] corner
    tensor whose 4-minor dim pays 32x (8, 128) tile padding — a 21.5 GiB
    allocation at frontend-bench scale (the round-3 OOM).  This path
    gathers from the packed/pair tables when attached (2/4 items per
    lookup) or 8 single-float sigma items otherwise; every result is
    [M]-minor."""
    if grid.data_packed16 is not None:
        return get_terrain_variables_cm_packed16(grid, px, py, yaw)[6]
    if grid.data_packed is not None:
        return get_terrain_variables_cm_packed(grid, px, py, yaw)[6]
    if grid.data_pair is not None:
        return get_terrain_variables_cm(grid, px, py, yaw)[6]

    nx, ny, nyaw = grid.voxel_num
    res = grid.xy_resolution
    yres = grid.yaw_resolution
    ox, oy, oyaw = grid.origin
    ixf = jnp.floor((px - 0.5 * res - ox) / res)
    iyf = jnp.floor((py - 0.5 * res - oy) / res)
    ywm = normalize_so2(yaw - 0.5 * yres)
    iwf = jnp.floor((ywm - oyaw) / yres)
    wx = (px - ((ixf + 0.5) * res + ox)) / res
    wy = (py - ((iyf + 0.5) * res + oy)) / res
    wt = so2_diff(yaw, (iwf + 0.5) * yres + oyaw) / yres

    ix0 = jnp.clip(ixf.astype(jnp.int32), 0, nx - 1)
    ix1 = jnp.clip(ixf.astype(jnp.int32) + 1, 0, nx - 1)
    iy0 = jnp.clip(iyf.astype(jnp.int32), 0, ny - 1)
    iy1 = jnp.clip(iyf.astype(jnp.int32) + 1, 0, ny - 1)
    iw0 = jnp.mod(iwf.astype(jnp.int32), nyaw)
    iw1 = jnp.mod(iwf.astype(jnp.int32) + 1, nyaw)

    sig_flat = grid.data[..., 1].reshape(-1)
    M = px.shape[0]
    idx8 = jnp.stack([((ix0 * ny + iy0) * nyaw + iw0),
                      ((ix0 * ny + iy0) * nyaw + iw1),
                      ((ix0 * ny + iy1) * nyaw + iw0),
                      ((ix0 * ny + iy1) * nyaw + iw1),
                      ((ix1 * ny + iy0) * nyaw + iw0),
                      ((ix1 * ny + iy0) * nyaw + iw1),
                      ((ix1 * ny + iy1) * nyaw + iw0),
                      ((ix1 * ny + iy1) * nyaw + iw1)])     # [8, M]
    v = jnp.take(sig_flat, idx8.reshape(-1), mode="clip").reshape(8, M)
    vt = v[0::2] * (1.0 - wt) + v[1::2] * wt   # [4, M] = (x0y0,x0y1,x1y0,x1y1)
    vy = vt[0::2] * (1.0 - wy) + vt[1::2] * wy              # [2, M] = (x0,x1)
    val = vy[0] * (1.0 - wx) + vy[1] * wx
    inside = (px > ox + 1e-4) & (px < ox + nx * res - 1e-4) \
        & (py > oy + 1e-4) & (py < oy + ny * res - 1e-4)
    return jnp.where(inside, val, 0.0)


# ---------------------------------------------------------------------------
# Batched lookups (the solver hot path)
# ---------------------------------------------------------------------------

# Selectable implementation for the batched lookup ("ring" gathers yaw rings
# + weight contraction; "flat" gathers the 8 corners directly; "pair"
# gathers 4 yaw-pair rows from the precomputed `data_pair` table — fastest
# on TPU, measured ~2x over "flat").
LOOKUP_IMPL = "pair"


def with_pair_table(grid: TerrainGrid) -> TerrainGrid:
    """Attach the transposed yaw-pair gather table (TerrainGrid.data_pair)."""
    nx, ny, nyaw = grid.voxel_num
    pair = jnp.concatenate([grid.data, jnp.roll(grid.data, -1, axis=2)],
                           axis=-1)
    return grid.replace(data_pair=pair.reshape(nx * ny * nyaw, 8).T)


def _bf16_round_bits(u32):
    """Round-to-nearest-even f32 bit pattern -> upper-16 bf16 bits (numpy)."""
    import numpy as np
    u = u32.astype(np.uint64)
    rounded = (u + 0x7FFF + ((u >> np.uint64(16)) & np.uint64(1)))
    return (rounded >> np.uint64(16)).astype(np.uint32)


def with_packed_table(grid: TerrainGrid) -> TerrainGrid:
    """Attach the SPLIT hi+lo bf16-packed (y, yaw)-pair table
    (TerrainGrid.data_packed).

    Word layout per cell column (x, y, w), 12 f32 words:
      word[2*ch + yy]     = pack(hi[ch, y+yy, w],  hi[ch, y+yy, w+1])
      word[6 + 2*ch + yy] = pack(lo[ch, y+yy, w],  lo[ch, y+yy, w+1])
    for ch in (sigma, zb0, zb1), yy in (0, 1); y+1 clipped, w+1 wrapped —
    identical edge semantics to the unpacked trilinear path.  hi = RNE
    bf16 of the f32 value, lo = RNE bf16 of the residual (value - hi), so
    the kernel reconstructs value = hi + lo with <= ~4e-6 relative error
    (two bf16 roundings, 2^-9 each) — two orders of magnitude below the
    Lewis-Overton delta=1e-4 that killed the round-2 flat-bf16 table
    (PLATFORM_NOTES.md §8: its ~4e-3 field noise cost 4x MORE evals).
    One trilinear lookup gathers only the 2 x-corner columns — half the
    items of `data_pair` (the XLA gather unit's cost is item COUNT,
    PLATFORM_NOTES.md §4b/§5).
    """
    import numpy as np
    nx, ny, nyaw = grid.voxel_num
    d = np.asarray(grid.data, np.float32)[..., 1:4]        # (sigma, zb0, zb1)
    dw1 = np.roll(d, -1, axis=2)                           # w+1 (wrapped)
    dy1 = d[:, np.minimum(np.arange(ny) + 1, ny - 1)]      # y+1 (clipped)
    dy1w1 = np.roll(dy1, -1, axis=2)
    corners = (d, dw1, dy1, dy1w1)                         # [nx,ny,nyaw,3]
    hi_bits = [_bf16_round_bits(a.view(np.uint32)) for a in corners]
    hi_vals = [(b << np.uint32(16)).view(np.float32) for b in hi_bits]
    lo_bits = [_bf16_round_bits((a - hv).view(np.uint32))
               for a, hv in zip(corners, hi_vals)]
    words = []
    for part in (hi_bits, lo_bits):
        for ch in range(3):
            for yy in range(2):
                w0, w1 = part[2 * yy][..., ch], part[2 * yy + 1][..., ch]
                words.append(((w0 << np.uint32(16)) | w1).astype(np.uint32))
    packed = np.stack(words).reshape(12, nx * ny * nyaw).view(np.float32)
    return grid.replace(data_packed=jnp.asarray(packed))


def with_packed_f16(grid: TerrainGrid) -> TerrainGrid:
    """Attach the IEEE-f16 hi + f16-residual packed (y, yaw)-pair table
    (TerrainGrid.data_packed16).

    Word layout per column (x, y, w), 6 f32 words:
      word[2*ch + yy] = pack(f16 of v[ch, y+yy, w], f16 of v[ch, y+yy, w+1])
    for ch in (sigma, zb0, zb1), yy in (0, 1); y+1 clipped, w+1 wrapped —
    identical edge semantics to `with_packed_table`.  Column Ncells + i
    holds the f16 residuals (v - f32(f16(v))), so hi+lo reconstructs to
    <= ~2e-7 relative.  The point: 6-word items ride the XLA gather unit's
    flat <=8-word rate (~2x cheaper per item than the 12-wide bf16-split
    items), so a trilinear lookup costs 2 items hi-only (field error
    ~2.5e-4) or 4 items exact — both cheaper than the 2x12-wide packed
    lookup (measured, e27/e28)."""
    import numpy as np
    nx, ny, nyaw = grid.voxel_num
    d = np.asarray(grid.data, np.float32)[..., 1:4]        # (sigma, zb0, zb1)
    dw1 = np.roll(d, -1, axis=2)                           # w+1 (wrapped)
    dy1 = d[:, np.minimum(np.arange(ny) + 1, ny - 1)]      # y+1 (clipped)
    dy1w1 = np.roll(dy1, -1, axis=2)
    corners = (d, dw1, dy1, dy1w1)                         # [nx,ny,nyaw,3]
    his = [a.astype(np.float16) for a in corners]
    los = [(a - h.astype(np.float32)).astype(np.float16)
           for a, h in zip(corners, his)]

    def words(part):
        out = []
        for ch in range(3):
            for yy in range(2):
                w0 = part[2 * yy][..., ch].view(np.uint16).astype(np.uint32)
                w1 = part[2 * yy + 1][..., ch].view(np.uint16) \
                    .astype(np.uint32)
                out.append((w0 << np.uint32(16)) | w1)
        return np.stack(out).reshape(6, nx * ny * nyaw)

    packed = np.concatenate([words(his), words(los)],
                            axis=1).view(np.float32)
    return grid.replace(data_packed16=jnp.asarray(packed))


def _unpack_f16_pair(words_u32):
    """f32-bitcast words -> (v_w, v_w1) f32 values from packed f16 pairs."""
    hi = jax.lax.bitcast_convert_type(
        (words_u32 >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16)
    lo = jax.lax.bitcast_convert_type(
        (words_u32 & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def get_terrain_variables_cm_packed16(grid: TerrainGrid, px: jax.Array,
                                      py: jax.Array, yaw: jax.Array,
                                      exact: bool = False) -> jax.Array:
    """Channel-major terrain variables via the f16 packed table.

    exact=False gathers only the 2 hi columns (2 six-wide items per
    trilinear lookup, field error <= ~2.5e-4 relative); exact=True adds
    the 2 residual columns (4 items, <= ~2e-7)."""
    nx, ny, nyaw = grid.voxel_num
    res = grid.xy_resolution
    yres = grid.yaw_resolution
    ox, oy, oyaw = grid.origin
    ncells = nx * ny * nyaw

    ixf = jnp.floor((px - 0.5 * res - ox) / res)
    iyf = jnp.floor((py - 0.5 * res - oy) / res)
    ywm = normalize_so2(yaw - 0.5 * yres)
    iwf = jnp.floor((ywm - oyaw) / yres)
    wx = (px - ((ixf + 0.5) * res + ox)) / res
    # low-y edge handling identical to get_terrain_variables_cm_packed
    wy = jnp.where(iyf < 0, 0.0, (py - ((iyf + 0.5) * res + oy)) / res)
    wt = so2_diff(yaw, (iwf + 0.5) * yres + oyaw) / yres

    ix0 = jnp.clip(ixf.astype(jnp.int32), 0, nx - 1)
    ix1 = jnp.clip(ixf.astype(jnp.int32) + 1, 0, nx - 1)
    iy0 = jnp.clip(iyf.astype(jnp.int32), 0, ny - 1)
    iw = jnp.mod(iwf.astype(jnp.int32), nyaw)

    M = px.shape[0]
    base = jnp.stack([(ix0 * ny + iy0) * nyaw + iw,
                      (ix1 * ny + iy0) * nyaw + iw])       # [2, M]
    if exact:
        idx = jnp.concatenate([base, base + ncells], axis=0)  # [4, M]
        w = jnp.take(grid.data_packed16, idx.reshape(-1), axis=1,
                     mode="clip").reshape(6, 4, M)
        u = jax.lax.bitcast_convert_type(w, jnp.uint32)
        v_w0, v_w1 = _unpack_f16_pair(u)
        v_w0 = v_w0[:, :2] + v_w0[:, 2:]                   # hi + residual
        v_w1 = v_w1[:, :2] + v_w1[:, 2:]
    else:
        w = jnp.take(grid.data_packed16, base.reshape(-1), axis=1,
                     mode="clip").reshape(6, 2, M)
        u = jax.lax.bitcast_convert_type(w, jnp.uint32)
        v_w0, v_w1 = _unpack_f16_pair(u)
    vw = v_w0 * (1.0 - wt) + v_w1 * wt        # yaw blend -> [6, 2x, M]
    vy = vw[0::2] * (1.0 - wy) + vw[1::2] * wy   # [3ch, 2x, M]
    val = vy[:, 0] * (1.0 - wx) + vy[:, 1] * wx  # [3ch, M]

    inside = (px > ox + 1e-4) & (px < ox + nx * res - 1e-4) \
        & (py > oy + 1e-4) & (py < oy + ny * res - 1e-4)
    val = jnp.where(inside[None, :], val, 0.0)
    return _tv_from_fields(val[0], val[1], val[2], yaw)


def _unpack_bf16_pair(words_u32):
    """f32-bitcast words -> (hi, lo) f32 values (bf16 << 16 widening)."""
    hi = jax.lax.bitcast_convert_type(
        words_u32 & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        words_u32 << jnp.uint32(16), jnp.float32)
    return hi, lo


def get_terrain_batch(grid: TerrainGrid, poses: jax.Array) -> jax.Array:
    """[M, 4] RXS2 values for [M, 3] SE(2) poses (batched `get_terrain`)."""
    nx, ny, nyaw = grid.voxel_num
    dtype = poses.dtype
    half = jnp.asarray([0.5 * grid.xy_resolution, 0.5 * grid.xy_resolution,
                        0.5 * grid.yaw_resolution], dtype)
    o = jnp.asarray(grid.origin, dtype)
    res_inv = jnp.asarray([1.0 / grid.xy_resolution,
                           1.0 / grid.xy_resolution,
                           1.0 / grid.yaw_resolution], dtype)

    pos_m = poses - half
    pos_m = pos_m.at[:, 2].set(normalize_so2(pos_m[:, 2]))
    idx = jnp.floor((pos_m - o) * res_inv).astype(jnp.int32)   # [M,3]
    idx_pos = (idx.astype(dtype) + 0.5) / res_inv + o
    diff = jnp.stack([
        (poses[:, 0] - idx_pos[:, 0]) * res_inv[0],
        (poses[:, 1] - idx_pos[:, 1]) * res_inv[1],
        so2_diff(poses[:, 2], idx_pos[:, 2]) * res_inv[2],
    ], axis=1)                                                  # [M,3]

    M = poses.shape[0]
    ix = jnp.clip(idx[:, 0, None] + jnp.arange(2), 0, nx - 1)   # [M,2]
    iy = jnp.clip(idx[:, 1, None] + jnp.arange(2), 0, ny - 1)
    iw = jnp.mod(idx[:, 2, None] + jnp.arange(2), nyaw)         # [M,2]

    if LOOKUP_IMPL != "ring":  # "flat" (also the "pair" row-major fallback)
        flat = ((ix[:, :, None, None] * ny + iy[:, None, :, None]) * nyaw
                + iw[:, None, None, :])                          # [M,2,2,2]
        v = jnp.take(grid.data.reshape(-1, 4), flat.reshape(-1), axis=0,
                     mode="clip").reshape(M, 2, 2, 2, 4)
        w0 = diff[:, 0].reshape(-1, 1, 1, 1)
        w1 = diff[:, 1].reshape(-1, 1, 1)
        w2 = diff[:, 2].reshape(-1, 1)
        vx = v[:, 0] * (1 - w0) + v[:, 1] * w0
        vy = vx[:, 0] * (1 - w1) + vx[:, 1] * w1
        val = vy[:, 0] * (1 - w2) + vy[:, 1] * w2
        lo = jnp.asarray(grid.min_boundary, dtype)
        hi = jnp.asarray(grid.max_boundary, dtype)
        inside = jnp.all(poses > lo + 1e-4, axis=1) & \
            jnp.all(poses < hi - 1e-4, axis=1)
        return jnp.where(inside[:, None], val, 0.0)

    # Gather whole yaw rings for the 4 xy corners (rows of Nyaw*4 floats are
    # lane-aligned; 4 gather indices per sample instead of 8), then contract
    # yaw with a 2-hot weight vector.  All intermediates keep the fused
    # (Nyaw*4)-wide minor dim: any [..., 4]-minor tensor gets padded 32x by
    # the TPU (8,128) tiling and OOMs at large batch.
    rows = (ix[:, :, None] * ny + iy[:, None, :]).reshape(-1)   # [M*4]
    G = jnp.take(grid.data.reshape(nx * ny, nyaw * 4), rows,
                 axis=0, mode="clip")                            # [M*4, W*4]

    w0 = diff[:, 0]
    w1 = diff[:, 1]
    wxy = jnp.stack([(1 - w0) * (1 - w1), (1 - w0) * w1,
                     w0 * (1 - w1), w0 * w1], axis=1)            # [M,4]
    r2 = jnp.sum((G * wxy.reshape(-1, 1)).reshape(M, 4, nyaw * 4),
                 axis=1)                                         # [M, W*4]

    w2 = diff[:, 2]
    war = jnp.arange(nyaw)
    # 2-hot yaw weights via iota compare (scatter-free: scatters inside the
    # solver loops compile pathologically slowly on the TPU backend)
    wyaw = ((war[None, :] == iw[:, 0:1]) * (1.0 - w2)[:, None]
            + (war[None, :] == iw[:, 1:2]) * w2[:, None]).astype(dtype)
    wexp = jnp.repeat(wyaw, 4, axis=1)                           # [M, W*4]

    # channel extraction as a [W*4, 4] mask matmul (keeps layouts clean)
    cmask = (jnp.arange(nyaw * 4)[:, None] % 4
             == jnp.arange(4)[None, :]).astype(dtype)
    val = jnp.matmul(r2 * wexp, cmask,
                     precision=jax.lax.Precision.HIGHEST)        # [M, 4]

    lo = jnp.asarray(grid.min_boundary, dtype)
    hi = jnp.asarray(grid.max_boundary, dtype)
    inside = jnp.all(poses > lo + 1e-4, axis=1) & \
        jnp.all(poses < hi - 1e-4, axis=1)
    return jnp.where(inside[:, None], val, 0.0)


def _tv_from_fields(sig, zb0, zb1, yaw):
    """7-tuple terrain variables from interpolated (sigma, zb0, zb1) fields
    and yaw — the shared tail of every channel-major lookup
    (uneven_map.h:221-256)."""
    c = jnp.sqrt(jnp.maximum(1.0 - zb0 * zb0 - zb1 * zb1, 1e-12))
    inv_c = 1.0 / c
    cyaw, syaw = jnp.cos(yaw), jnp.sin(yaw)
    t = cyaw * zb0 + syaw * zb1
    s = syaw * zb0 - cyaw * zb1
    sqrt_1_t2 = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    inv_sq = 1.0 / sqrt_1_t2
    return jnp.stack([inv_sq, -c * t * inv_sq, sqrt_1_t2 * inv_c,
                      s * inv_sq, c, inv_c, sig])


def get_terrain_variables_cm_packed(grid: TerrainGrid, px: jax.Array,
                                    py: jax.Array,
                                    yaw: jax.Array) -> jax.Array:
    """Channel-major terrain variables via the split hi+lo bf16 table: TWO
    gathered items per trilinear SE(2) lookup instead of `data_pair`'s
    four.

    Semantics match `get_terrain_variables_cm` up to the hi+lo
    reconstruction error of the stored field (<= ~4e-6 relative, tested) —
    negligible against the solver's epsilon_con=1e-3 and the line search's
    delta=1e-4, so the ALM solver can run BOTH its iteration evals and its
    termination test on this path.
    """
    nx, ny, nyaw = grid.voxel_num
    res = grid.xy_resolution
    yres = grid.yaw_resolution
    ox, oy, oyaw = grid.origin

    ixf = jnp.floor((px - 0.5 * res - ox) / res)
    iyf = jnp.floor((py - 0.5 * res - oy) / res)
    ywm = normalize_so2(yaw - 0.5 * yres)
    iwf = jnp.floor((ywm - oyaw) / yres)
    wx = (px - ((ixf + 0.5) * res + ox)) / res
    # low-y edge: the exact path clamps BOTH y corners to row 0 there
    # (iy1 = clip(0) = 0); the packed pair at row 0 is (0, 1), so zero the
    # blend weight instead.  The top edge and both x edges clamp correctly
    # through the pack/clip structure.
    wy = jnp.where(iyf < 0, 0.0, (py - ((iyf + 0.5) * res + oy)) / res)
    wt = so2_diff(yaw, (iwf + 0.5) * yres + oyaw) / yres

    ix0 = jnp.clip(ixf.astype(jnp.int32), 0, nx - 1)
    ix1 = jnp.clip(ixf.astype(jnp.int32) + 1, 0, nx - 1)
    iy0 = jnp.clip(iyf.astype(jnp.int32), 0, ny - 1)
    iw = jnp.mod(iwf.astype(jnp.int32), nyaw)

    M = px.shape[0]
    idx2 = jnp.stack([(ix0 * ny + iy0) * nyaw + iw,
                      (ix1 * ny + iy0) * nyaw + iw])          # [2, M]
    w = jnp.take(grid.data_packed, idx2.reshape(-1), axis=1,
                 mode="clip").reshape(12, 2, M)
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    v_w0, v_w1 = _unpack_bf16_pair(u)         # [12, 2x, M] at w, w+1
    # hi + lo residual reconstruction (~f32-accurate field)
    v_w0 = v_w0[:6] + v_w0[6:]
    v_w1 = v_w1[:6] + v_w1[6:]
    vw = v_w0 * (1.0 - wt) + v_w1 * wt        # yaw blend -> [6, 2x, M]
    # rows: [2*ch + yy] -> y blend then x blend
    vy = vw[0::2] * (1.0 - wy) + vw[1::2] * wy   # [3ch, 2x, M]
    val = vy[:, 0] * (1.0 - wx) + vy[:, 1] * wx  # [3ch, M]

    inside = (px > ox + 1e-4) & (px < ox + nx * res - 1e-4) \
        & (py > oy + 1e-4) & (py < oy + ny * res - 1e-4)
    val = jnp.where(inside[None, :], val, 0.0)
    return _tv_from_fields(val[0], val[1], val[2], yaw)


def get_terrain_variables_cm(grid: TerrainGrid, px: jax.Array,
                             py: jax.Array, yaw: jax.Array,
                             exact: bool = True) -> jax.Array:
    """Channel-major batched terrain variables: three [M] coordinate vectors
    (yaw pre-normalized into [-pi, pi)) -> [7, M] variables.

    The solver hot path (SURVEY.md §2.1 "trilinear terrain interpolation" +
    "derived terrain variables", uneven_map.h:154-201,220-377), laid out for
    the TPU: one 4-column gather from the transposed yaw-pair table and pure
    [M]-vector math after it — no tensor in the pipeline carries a small
    trailing channel dim, so nothing pays (8, 128) lane padding.  Bitwise
    semantics match `get_terrain_variables_batch` (tested).

    With exact=False and a packed table attached, uses the cheapest
    attached fast path: the f16 table (2 six-wide items,
    `get_terrain_variables_cm_packed16`) over the split-bf16 table
    (2 twelve-wide items, `get_terrain_variables_cm_packed`).
    """
    if not exact and grid.data_packed16 is not None:
        return get_terrain_variables_cm_packed16(grid, px, py, yaw)
    if not exact and grid.data_packed is not None:
        return get_terrain_variables_cm_packed(grid, px, py, yaw)
    if grid.data_pair is None:
        poses = jnp.stack([px, py, yaw], axis=1)
        return get_terrain_variables_batch(grid, poses).T

    nx, ny, nyaw = grid.voxel_num
    dtype = px.dtype
    res = grid.xy_resolution
    yres = grid.yaw_resolution
    ox, oy, oyaw = grid.origin

    ixf = jnp.floor((px - 0.5 * res - ox) / res)
    iyf = jnp.floor((py - 0.5 * res - oy) / res)
    ywm = normalize_so2(yaw - 0.5 * yres)
    iwf = jnp.floor((ywm - oyaw) / yres)
    wx = (px - ((ixf + 0.5) * res + ox)) / res
    wy = (py - ((iyf + 0.5) * res + oy)) / res
    wt = so2_diff(yaw, (iwf + 0.5) * yres + oyaw) / yres

    ix0 = jnp.clip(ixf.astype(jnp.int32), 0, nx - 1)
    ix1 = jnp.clip(ixf.astype(jnp.int32) + 1, 0, nx - 1)
    iy0 = jnp.clip(iyf.astype(jnp.int32), 0, ny - 1)
    iy1 = jnp.clip(iyf.astype(jnp.int32) + 1, 0, ny - 1)
    iw = jnp.mod(iwf.astype(jnp.int32), nyaw)

    # corner-major flat column indices [4, M] -> [4M]
    idx4 = jnp.stack([(ix0 * ny + iy0) * nyaw + iw,
                      (ix0 * ny + iy1) * nyaw + iw,
                      (ix1 * ny + iy0) * nyaw + iw,
                      (ix1 * ny + iy1) * nyaw + iw])
    M = px.shape[0]
    v = jnp.take(grid.data_pair, idx4.reshape(-1), axis=1,
                 mode="clip").reshape(8, 4, M)
    vy = v[:4] * (1.0 - wt) + v[4:] * wt                     # [4ch, 4cnr, M]
    wxy = jnp.stack([(1 - wx) * (1 - wy), (1 - wx) * wy,
                     wx * (1 - wy), wx * wy])                # [4, M]
    val = jnp.sum(vy * wxy[None], axis=1)                    # [4ch, M]

    inside = (px > ox + 1e-4) & (px < ox + nx * res - 1e-4) \
        & (py > oy + 1e-4) & (py < oy + ny * res - 1e-4)
    val = jnp.where(inside[None, :], val, 0.0)

    sig, zb0, zb1 = val[1], val[2], val[3]
    c = jnp.sqrt(jnp.maximum(1.0 - zb0 * zb0 - zb1 * zb1, 1e-12))
    inv_c = 1.0 / c
    cyaw, syaw = jnp.cos(yaw), jnp.sin(yaw)
    t = cyaw * zb0 + syaw * zb1
    s = syaw * zb0 - cyaw * zb1
    sqrt_1_t2 = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    inv_sq = 1.0 / sqrt_1_t2
    return jnp.stack([inv_sq, -c * t * inv_sq, sqrt_1_t2 * inv_c,
                      s * inv_sq, c, inv_c, sig])


def get_terrain_variables_batch(grid: TerrainGrid,
                                poses: jax.Array) -> jax.Array:
    """[M, 7] terrain variables (batched `get_terrain_variables`)."""
    value = get_terrain_batch(grid, poses)
    zb0, zb1 = value[:, 2], value[:, 3]
    c = jnp.sqrt(jnp.maximum(1.0 - zb0 * zb0 - zb1 * zb1, 1e-12))
    inv_c = 1.0 / c
    cyaw, syaw = jnp.cos(poses[:, 2]), jnp.sin(poses[:, 2])
    t = cyaw * zb0 + syaw * zb1
    s = syaw * zb0 - cyaw * zb1
    sqrt_1_t2 = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    inv_sq = 1.0 / sqrt_1_t2
    return jnp.stack([inv_sq, -c * t * inv_sq, sqrt_1_t2 * inv_c,
                      s * inv_sq, c, inv_c, value[:, 1]], axis=1)
