"""Plan manager: init-guess construction and solve orchestration.

Host-side equivalent of the reference PlanManager (reference:
src/uneven_planner/plan_manager/src/plan_manager.cpp:43-189): takes an SE(2)
init path (from the front end), unwraps yaw, builds boundary PVA states with
a small tangential initial velocity, samples inner xy/yaw points by arc
length, and sets the initial total time.

Two modes:
- `init_guess_from_path`: data-dependent piece counts, exactly the reference
  sampling (one problem instance).
- `init_guess_fixed`: fixed piece counts (inner points at equal arc-length
  fractions) so thousands of scenarios share one compiled batched solve —
  the TPU-native batching contract.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from uneven_planner_tpu.config import ManagerConfig
from uneven_planner_tpu.solver.alm import Boundary, ProblemShape


def _logC2_np(T: float) -> float:
    """Pure-numpy tau = expC2^{-1}(T) (alm.logC2).  Host-side init-guess code
    must not touch jnp: on tunneled TPU runtimes every eager op loads a tiny
    device program, and a few hundred of them degrade subsequent kernel
    launch latency by ~300x (measured)."""
    if T > 1.0:
        return float(np.sqrt(max(2.0 * T - 1.0, 0.0)) - 1.0)
    return float(1.0 - np.sqrt(max(2.0 / max(T, 1e-12) - 1.0, 0.0)))


def _pack_np(tau: float, pxy: np.ndarray, pyaw: np.ndarray) -> np.ndarray:
    return np.concatenate([np.atleast_1d(np.float64(tau)),
                           np.asarray(pxy).reshape(-1),
                           np.asarray(pyaw).reshape(-1)])


def smooth_yaw_path(path: np.ndarray) -> np.ndarray:
    """Unwrap yaw along a path so consecutive differences stay within pi/2
    (plan_manager.cpp:62-77)."""
    out = path.copy()
    for i in range(len(out) - 1):
        dyaw = out[i + 1, 2] - out[i, 2]
        while dyaw >= np.pi / 2:
            out[i + 1, 2] -= 2 * np.pi
            dyaw = out[i + 1, 2] - out[i, 2]
        while dyaw <= -np.pi / 2:
            out[i + 1, 2] += 2 * np.pi
            dyaw = out[i + 1, 2] - out[i, 2]
    return out


def _arc_lengths(path: np.ndarray) -> np.ndarray:
    seg = np.linalg.norm(np.diff(path[:, :2], axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(seg)])


def _interp_along(path: np.ndarray, arcs: np.ndarray,
                  targets: np.ndarray) -> np.ndarray:
    """Linear interpolation of (x, y, yaw) at given arc lengths."""
    out = np.empty((len(targets), 3))
    for d in range(3):
        out[:, d] = np.interp(targets, arcs, path[:, d])
    return out


def _boundary(path: np.ndarray, cfg: ManagerConfig) -> Boundary:
    """Boundary PVA with init_sig_vel tangential velocity
    (plan_manager.cpp:86-94)."""
    y0, y1 = path[0, 2], path[-1, 2]
    head_xy = np.array([[path[0, 0], path[0, 1]],
                        [cfg.init_sig_vel * np.cos(y0),
                         cfg.init_sig_vel * np.sin(y0)],
                        [0.0, 0.0]])
    tail_xy = np.array([[path[-1, 0], path[-1, 1]],
                        [cfg.init_sig_vel * np.cos(y1),
                         cfg.init_sig_vel * np.sin(y1)],
                        [0.0, 0.0]])
    head_yaw = np.array([[y0], [0.0], [0.0]])
    tail_yaw = np.array([[y1], [0.0], [0.0]])
    return Boundary(head_xy=head_xy, tail_xy=tail_xy,
                    head_yaw=head_yaw, tail_yaw=tail_yaw)


def init_guess_from_path(path: np.ndarray, cfg: ManagerConfig
                         ) -> Tuple[np.ndarray, Boundary, ProblemShape]:
    """Reference-style init guess: inner xy points every piece_len of arc
    length, yaw points every piece_len/yaw_piece_times
    (plan_manager.cpp:96-132)."""
    path = smooth_yaw_path(np.asarray(path, dtype=np.float64))
    arcs = _arc_lengths(path)
    total_len = arcs[-1]

    xy_targets = np.arange(cfg.piece_len, total_len, cfg.piece_len)
    # drop a final point that would coincide with the goal
    xy_targets = xy_targets[xy_targets < total_len - 1e-9]
    yaw_step = cfg.piece_len / cfg.yaw_piece_times
    yaw_targets = np.arange(yaw_step, total_len, yaw_step)
    yaw_targets = yaw_targets[yaw_targets < total_len - 1e-9]

    inner_xy = _interp_along(path, arcs, xy_targets)[:, :2]
    inner_yaw = _interp_along(path, arcs, yaw_targets)[:, 2:3]

    total_time = total_len / cfg.mean_vel * cfg.init_time_times
    shape = ProblemShape(piece_xy=len(inner_xy) + 1,
                         piece_yaw=len(inner_yaw) + 1,
                         int_K=16)
    bound = _boundary(path, cfg)
    x0 = _pack_np(_logC2_np(total_time), inner_xy, inner_yaw)
    return np.asarray(x0), bound, shape


def init_guess_fixed(path: np.ndarray, cfg: ManagerConfig,
                     piece_xy: int, piece_yaw: int, int_K: int = 16
                     ) -> Tuple[np.ndarray, Boundary]:
    """Fixed-piece-count init guess for batched solving: inner points at
    equal arc-length fractions."""
    path = smooth_yaw_path(np.asarray(path, dtype=np.float64))
    arcs = _arc_lengths(path)
    total_len = arcs[-1]

    xy_targets = total_len * np.arange(1, piece_xy) / piece_xy
    yaw_targets = total_len * np.arange(1, piece_yaw) / piece_yaw
    inner_xy = _interp_along(path, arcs, xy_targets)[:, :2]
    inner_yaw = _interp_along(path, arcs, yaw_targets)[:, 2:3]

    total_time = total_len / cfg.mean_vel * cfg.init_time_times
    bound = _boundary(path, cfg)
    x0 = _pack_np(_logC2_np(total_time), inner_xy, inner_yaw)
    return np.asarray(x0), bound


# ---------------------------------------------------------------------------
# JAX (in-graph) init guess for the fully fused plan->optimize pipeline
# ---------------------------------------------------------------------------

def init_guess_fixed_jax(path, mask, cfg: ManagerConfig,
                         piece_xy: int, piece_yaw: int):
    """Device-side equivalent of `init_guess_fixed` over a masked path
    (the front end's padded output): compress valid rows, unwrap yaw,
    resample inner points at equal arc-length fractions, build boundary
    PVA and the packed decision vector."""
    import jax
    import jax.numpy as jnp
    from uneven_planner_tpu.terrain.grid import so2_diff

    L = path.shape[0]
    order = jnp.argsort(~mask, stable=True)       # valid rows first
    P = path[order]
    n = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 2)
    P = P[jnp.clip(jnp.arange(L), 0, n - 1)]      # pad tail with last valid

    # unwrap yaw along the path (smooth yaw, plan_manager.cpp:62-77)
    dyaw = so2_diff(P[1:, 2], P[:-1, 2])
    yaw_un = jnp.concatenate([P[:1, 2], P[0, 2] + jnp.cumsum(dyaw)])

    seg = jnp.linalg.norm(P[1:, :2] - P[:-1, :2], axis=1)
    arcs = jnp.concatenate([jnp.zeros(1, P.dtype), jnp.cumsum(seg)])
    total_len = arcs[-1]

    fr_xy = total_len * jnp.arange(1, piece_xy, dtype=P.dtype) / piece_xy
    fr_yaw = total_len * jnp.arange(1, piece_yaw, dtype=P.dtype) / piece_yaw
    inner_x = jnp.interp(fr_xy, arcs, P[:, 0])
    inner_y = jnp.interp(fr_xy, arcs, P[:, 1])
    inner_xy = jnp.stack([inner_x, inner_y], axis=1)
    inner_yaw = jnp.interp(fr_yaw, arcs, yaw_un)[:, None]

    y0 = yaw_un[0]
    y1 = yaw_un[-1]
    sv = cfg.init_sig_vel
    head_xy = jnp.stack([P[0, :2],
                         jnp.stack([sv * jnp.cos(y0), sv * jnp.sin(y0)]),
                         jnp.zeros(2, P.dtype)])
    tail_xy = jnp.stack([P[-1, :2],
                         jnp.stack([sv * jnp.cos(y1), sv * jnp.sin(y1)]),
                         jnp.zeros(2, P.dtype)])
    head_yaw = jnp.stack([y0[None], jnp.zeros(1, P.dtype),
                          jnp.zeros(1, P.dtype)])
    tail_yaw = jnp.stack([y1[None], jnp.zeros(1, P.dtype),
                          jnp.zeros(1, P.dtype)])

    total_time = total_len / cfg.mean_vel * cfg.init_time_times
    from uneven_planner_tpu.solver.alm import logC2 as _logC2
    from uneven_planner_tpu.solver.alm import pack as _pack
    x0 = _pack(_logC2(total_time), inner_xy, inner_yaw)
    return x0, Boundary(head_xy=head_xy, tail_xy=tail_xy,
                        head_yaw=head_yaw, tail_yaw=tail_yaw)
