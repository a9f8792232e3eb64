import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uneven_planner_tpu.config import FrontendConfig, MapConfig
from uneven_planner_tpu.frontend import dubins as jdubins
from uneven_planner_tpu.terrain import io
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from uneven_planner_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.ensure_built(),
                                reason="native toolchain unavailable")

TEST_CFG = MapConfig(xy_resolution=0.2, yaw_resolution=0.45)


def test_native_pcd_matches_python():
    path = io.REFERENCE_MAPS_DIR + "/mountain.pcd"
    py_pts = io.load_scene_cloud("mountain")
    c_pts = native.pcd_load(path)
    assert abs(len(c_pts) - len(py_pts)) <= max(3, len(py_pts) // 1000), \
        (len(c_pts), len(py_pts))
    # same bounding box and centroid (voxel iteration order differs)
    np.testing.assert_allclose(c_pts.min(0), py_pts.min(0), atol=0.02)
    np.testing.assert_allclose(c_pts.mean(0), py_pts.mean(0), atol=0.02)


def test_native_map_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(6, 5, 4, 4))
    p = str(tmp_path / "test.map")
    native.map_csv_write(p, data)
    back = native.map_csv_read(p, (6, 5, 4))
    np.testing.assert_allclose(back, data, rtol=1e-15)
    # cross-check against the python CSV loader
    back_py = io.load_map_csv(p, (6, 5, 4))
    np.testing.assert_allclose(back_py, data, rtol=1e-12)


def test_native_dubins_matches_jax():
    rng = np.random.default_rng(1)
    rho = 0.475
    for _ in range(20):
        q0 = np.concatenate([rng.uniform(-3, 3, 2),
                             rng.uniform(-np.pi, np.pi, 1)])
        q1 = np.concatenate([rng.uniform(-3, 3, 2),
                             rng.uniform(-np.pi, np.pi, 1)])
        d_c = native.dubins_distance(q0, q1, rho)
        d_j = float(jdubins.distance(jnp.asarray(q0), jnp.asarray(q1), rho))
        np.testing.assert_allclose(d_c, d_j, rtol=1e-9, atol=1e-9)


def test_native_astar_oracle():
    """The exact-semantics A* must find a path on the synthetic hill and it
    must be collision-free and reach the goal.  Uses the reference 0.05 m
    resolution: the A* lattice dedups on map cells (kino_astar.h:187-191),
    so cells must be finer than the 0.15 m arc step."""
    grid = make_synthetic_grid(MapConfig())
    fe = FrontendConfig()
    start = [-3.0, -3.0, 0.0]
    goal = [0.5, -3.0, 0.0]
    path = native.kino_astar_plan(grid, fe, start, goal)
    assert path is not None and len(path) >= 3
    np.testing.assert_allclose(path[0], start, atol=1e-9)
    np.testing.assert_allclose(path[-1], goal, atol=1e-9)
    occ = np.asarray(grid.occ_xy)
    for p in path:
        ix = int((p[0] - grid.origin[0]) / grid.xy_resolution)
        iy = int((p[1] - grid.origin[1]) / grid.xy_resolution)
        assert not occ[ix, iy]
    steps = np.linalg.norm(np.diff(path[:, :2], axis=0), axis=1)
    assert steps.max() < fe.max_vel * fe.time_interval + 1e-6
