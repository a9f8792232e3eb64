"""ctypes bindings for the native host library (native/src/uneven_host.cc).

Builds on demand with make/g++ (pybind11 is not available in this image;
plain C ABI + ctypes keeps the binding dependency-free).  All entry points
have pure-Python fallbacks elsewhere in the package; this module is the fast
path for host-side IO and the exact-semantics A* oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libuneven_host.so")

_lib: Optional[ctypes.CDLL] = None


class KinoParams(ctypes.Structure):
    _fields_ = [
        ("origin_x", ctypes.c_double), ("origin_y", ctypes.c_double),
        ("xy_resolution", ctypes.c_double),
        ("nx", ctypes.c_int), ("ny", ctypes.c_int),
        ("nyaw_map", ctypes.c_int),
        ("yaw_map_resolution", ctypes.c_double),
        ("yaw_resolution", ctypes.c_double),
        ("lambda_heu", ctypes.c_double), ("weight_r2", ctypes.c_double),
        ("weight_so2", ctypes.c_double),
        ("weight_v_change", ctypes.c_double),
        ("weight_delta_change", ctypes.c_double),
        ("weight_sigma", ctypes.c_double),
        ("time_interval", ctypes.c_double),
        ("collision_interval", ctypes.c_double),
        ("oneshot_range", ctypes.c_double),
        ("wheel_base", ctypes.c_double), ("max_steer", ctypes.c_double),
        ("max_vel", ctypes.c_double),
        ("max_expansions", ctypes.c_int),
    ]


class InnerCostParams(ctypes.Structure):
    _fields_ = [
        ("nxy", ctypes.c_int), ("nyaw", ctypes.c_int), ("K", ctypes.c_int),
        ("jerk_scale", ctypes.c_double),
        ("sigma_weight", ctypes.c_double),
        ("time_weight", ctypes.c_double),
        ("max_vel", ctypes.c_double), ("max_acc_lon", ctypes.c_double),
        ("max_acc_lat", ctypes.c_double), ("max_kap", ctypes.c_double),
        ("min_cxi", ctypes.c_double), ("max_sig", ctypes.c_double),
        ("delta_sigl", ctypes.c_double), ("gravity", ctypes.c_double),
        ("gnx", ctypes.c_int), ("gny", ctypes.c_int),
        ("gnyaw", ctypes.c_int),
        ("origin_x", ctypes.c_double), ("origin_y", ctypes.c_double),
        ("origin_yaw", ctypes.c_double),
        ("xy_res", ctypes.c_double), ("yaw_res", ctypes.c_double),
    ]


def ensure_built() -> bool:
    """Build the shared library if missing; returns availability."""
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pcd_load.restype = ctypes.c_int
    lib.map_csv_read.restype = ctypes.c_int
    lib.map_csv_write.restype = ctypes.c_int
    lib.kino_astar_plan.restype = ctypes.c_int
    lib.dubins_distance.restype = ctypes.c_double
    lib.minco_generate.restype = ctypes.c_int
    lib.minco_jerk_cost.restype = ctypes.c_double
    lib.minco_inner_cost.restype = ctypes.c_double
    _lib = lib
    return True


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def pcd_load(path: str, lo=(-10.0, -10.0, -0.01), hi=(10.0, 10.0, 5.0),
             leaf: float = 0.01, capacity: int = 2_000_000) -> np.ndarray:
    """Native PCD read + crop + centroid voxel filter."""
    assert ensure_built(), "native library unavailable"
    out = np.empty((capacity, 3), dtype=np.float64)
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    n = _lib.pcd_load(path.encode(), _dptr(lo), _dptr(hi),
                      ctypes.c_double(leaf), _dptr(out), capacity)
    if n < 0:
        raise IOError(f"pcd_load({path}) failed: {n}")
    return out[:n].copy()


def map_csv_read(path: str, voxel_num) -> np.ndarray:
    assert ensure_built()
    nx, ny, nyaw = voxel_num
    out = np.zeros((nx, ny, nyaw, 4), dtype=np.float64)
    n = _lib.map_csv_read(path.encode(), nx, ny, nyaw, _dptr(out))
    if n < 0:
        raise IOError(f"map_csv_read({path}) failed")
    return out


def map_csv_write(path: str, data: np.ndarray) -> None:
    assert ensure_built()
    nx, ny, nyaw, _ = data.shape
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = _lib.map_csv_write(path.encode(), nx, ny, nyaw, _dptr(data))
    if n < 0:
        raise IOError(f"map_csv_write({path}) failed")


def kino_astar_plan(grid, frontend_cfg, start, goal,
                    max_expansions: int = 500_000,
                    cap: int = 100_000) -> Optional[np.ndarray]:
    """Exact reference-semantics A* over our TerrainGrid (the golden oracle
    for the batched search).  Returns [L, 3] path or None."""
    assert ensure_built()
    nx, ny, nyaw = grid.voxel_num
    p = KinoParams(
        origin_x=grid.origin[0], origin_y=grid.origin[1],
        xy_resolution=grid.xy_resolution,
        nx=nx, ny=ny, nyaw_map=nyaw,
        yaw_map_resolution=grid.yaw_resolution,
        yaw_resolution=frontend_cfg.yaw_resolution,
        lambda_heu=frontend_cfg.lambda_heu,
        weight_r2=frontend_cfg.weight_r2,
        weight_so2=frontend_cfg.weight_so2,
        weight_v_change=frontend_cfg.weight_v_change,
        weight_delta_change=frontend_cfg.weight_delta_change,
        weight_sigma=frontend_cfg.weight_sigma,
        time_interval=frontend_cfg.time_interval,
        collision_interval=frontend_cfg.collision_interval,
        oneshot_range=frontend_cfg.oneshot_range,
        wheel_base=frontend_cfg.wheel_base,
        max_steer=frontend_cfg.max_steer,
        max_vel=frontend_cfg.max_vel,
        max_expansions=max_expansions)
    occ = np.ascontiguousarray(np.asarray(grid.occ_xy), dtype=np.uint8)
    sigma = np.ascontiguousarray(
        np.asarray(grid.data[..., 1], dtype=np.float64))
    out = np.empty((cap, 3), dtype=np.float64)
    start = np.asarray(start, dtype=np.float64)
    goal = np.asarray(goal, dtype=np.float64)
    n = _lib.kino_astar_plan(
        ctypes.byref(p),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        _dptr(sigma), _dptr(start), _dptr(goal), _dptr(out), cap)
    if n < 0:
        raise RuntimeError(f"kino_astar_plan error {n}")
    if n == 0:
        return None
    return out[:n].copy()


def minco_generate(inner: np.ndarray, ts: np.ndarray, head: np.ndarray,
                   tail: np.ndarray) -> np.ndarray:
    """C++ MINCO s=3 generate (the L3 golden oracle twin of
    se2traj.hpp:595-680).  inner [N-1, D], ts [N], head/tail [3, D] ->
    coefficients [N, 6, D] ascending powers, all f64."""
    assert ensure_built(), "native library unavailable"
    N = ts.shape[0]
    D = head.shape[1]
    inner = np.ascontiguousarray(inner, np.float64)
    ts = np.ascontiguousarray(ts, np.float64)
    head = np.ascontiguousarray(head, np.float64)
    tail = np.ascontiguousarray(tail, np.float64)
    out = np.empty((N, 6, D), np.float64)
    r = _lib.minco_generate(N, D, _dptr(inner), _dptr(ts), _dptr(head),
                            _dptr(tail), _dptr(out))
    if r != 0:
        raise RuntimeError(f"minco_generate error {r}")
    return out


def minco_jerk_cost(coeffs: np.ndarray, ts: np.ndarray) -> float:
    assert ensure_built()
    N, _, D = coeffs.shape
    coeffs = np.ascontiguousarray(coeffs, np.float64)
    ts = np.ascontiguousarray(ts, np.float64)
    return float(_lib.minco_jerk_cost(N, D, _dptr(coeffs), _dptr(ts)))


def inner_cost(grid, alm_cfg, shape, x, bound, lam, mu, rho, scale_cx,
               scale_fx: float = 1.0) -> float:
    """C++ ALM inner-cost twin (innerCallback + calConstrainCostGrad
    forward, alm_traj_opt.cpp:280-347,663-991) at a fixed iterate.

    Arguments mirror solver/alm._inner_cost_impl: x is the flat decision
    vector, bound an alm.Boundary, lam [E], mu [I] (channel-major),
    scale_cx [7, S].  Used by tests as the independent f64 oracle for the
    JAX cost, and (via central differences) for the JAX gradient."""
    assert ensure_built()
    nx, ny, nyaw = grid.voxel_num
    trick = alm_cfg.scale_trick_jerk if alm_cfg.use_scaling else 1.0
    p = InnerCostParams(
        nxy=shape.piece_xy, nyaw=shape.piece_yaw, K=shape.int_K,
        jerk_scale=float(scale_fx) * float(trick),
        sigma_weight=alm_cfg.rho_ter * float(scale_fx),
        time_weight=alm_cfg.rho_T * float(scale_fx),
        max_vel=alm_cfg.max_vel, max_acc_lon=alm_cfg.max_acc_lon,
        max_acc_lat=alm_cfg.max_acc_lat, max_kap=alm_cfg.max_kap,
        min_cxi=alm_cfg.min_cxi, max_sig=alm_cfg.max_sig,
        delta_sigl=alm_cfg.delta_sigl, gravity=grid.gravity,
        gnx=nx, gny=ny, gnyaw=nyaw,
        origin_x=grid.origin[0], origin_y=grid.origin[1],
        origin_yaw=grid.origin[2],
        xy_res=grid.xy_resolution, yaw_res=grid.yaw_resolution)
    gdata = np.ascontiguousarray(np.asarray(grid.data), np.float64)
    x = np.ascontiguousarray(x, np.float64)
    hxy = np.ascontiguousarray(bound.head_xy, np.float64)
    txy = np.ascontiguousarray(bound.tail_xy, np.float64)
    hyaw = np.ascontiguousarray(bound.head_yaw, np.float64)
    tyaw = np.ascontiguousarray(bound.tail_yaw, np.float64)
    lam = np.ascontiguousarray(lam, np.float64)
    mu = np.ascontiguousarray(mu, np.float64)
    sc = np.ascontiguousarray(scale_cx, np.float64)
    return float(_lib.minco_inner_cost(
        ctypes.byref(p), _dptr(gdata), _dptr(x), _dptr(hxy), _dptr(txy),
        _dptr(hyaw), _dptr(tyaw), _dptr(lam), _dptr(mu),
        ctypes.c_double(float(rho)), _dptr(sc)))


def dubins_distance(q0, q1, rho: float) -> float:
    assert ensure_built()
    q0 = np.asarray(q0, dtype=np.float64)
    q1 = np.asarray(q1, dtype=np.float64)
    return float(_lib.dubins_distance(_dptr(q0), _dptr(q1),
                                      ctypes.c_double(rho)))
