import dataclasses

import jax
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


def test_native_minco_oracle():
    """JAX MINCO coefficients (minco.generate, the constant-inverse uniform
    fast path included) must match the independent C++ block-tridiagonal
    solve (native minco_generate) at f64 — the cross-implementation golden
    test SURVEY.md §4 requires for se2traj.hpp:595-680."""
    from uneven_planner_tpu.minco import minco, uniform

    rng = np.random.default_rng(3)
    for N, D in ((10, 2), (20, 1), (5, 2)):
        inner = rng.normal(size=(N - 1, D)) * 2.0
        ts = rng.uniform(0.2, 1.5, size=N)
        head = np.concatenate([inner[:1] - 1.0,
                               rng.normal(size=(2, D)) * 0.3])
        tail = np.concatenate([inner[-1:] + 1.0,
                               rng.normal(size=(2, D)) * 0.3])
        c_jax = np.asarray(minco.generate(
            jnp.asarray(inner), jnp.asarray(ts), jnp.asarray(head),
            jnp.asarray(tail)))
        c_cpp = native.minco_generate(inner, ts, head, tail)
        np.testing.assert_allclose(c_jax, c_cpp, rtol=1e-8, atol=1e-9)
        # jerk cost twin
        j_jax = float(minco.jerk_cost(jnp.asarray(c_jax), jnp.asarray(ts)))
        j_cpp = native.minco_jerk_cost(c_cpp, ts)
        np.testing.assert_allclose(j_jax, j_cpp, rtol=1e-9)

        # uniform-time fast path vs C++ at equal times
        tsu = np.full(N, 0.7)
        cT = uniform.generate_norm_cm(jnp.asarray(inner), jnp.asarray(0.7),
                                      jnp.asarray(head), jnp.asarray(tail),
                                      N)
        # normalized channel-major [D, 6N] -> physical [N, 6, D]
        cn = np.asarray(cT).T.reshape(N, 6, D)
        scale = (0.7 ** np.arange(6))[None, :, None]
        c_cpp_u = native.minco_generate(inner, tsu, head, tail)
        np.testing.assert_allclose(cn / scale, c_cpp_u, rtol=1e-6, atol=5e-8)


def _inner_cost_fixture(seed):
    """Shared (grid, cfg, shape, x, bound, duals, scaling) fixture for the
    inner-cost oracle tests, on a coarse f64 synthetic hill."""
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain import grid as tgrid

    rng = np.random.default_rng(seed)
    cfg = scene_config("hill")
    cfg = dataclasses.replace(cfg, map=TEST_CFG)
    grid = make_synthetic_grid(cfg.map, dtype=np.float64)
    grid = tgrid.with_pair_table(grid)
    shape = alm.ProblemShape(piece_xy=6, piece_yaw=12, int_K=8)

    ang = rng.uniform(-np.pi, np.pi)
    start = rng.uniform(-3.0, -1.5, size=2)
    goal = np.clip(start + 2.0 * np.array([np.cos(ang), np.sin(ang)]),
                   -3.5, 3.5)
    yaw = np.arctan2(goal[1] - start[1], goal[0] - start[0])
    t = np.linspace(0, 1, 16)[:, None]
    path = np.concatenate([(1 - t) * start + t * goal,
                           np.full((16, 1), yaw)], axis=1)
    x0, bound = manager.init_guess_fixed(path, cfg.manager,
                                         piece_xy=shape.piece_xy,
                                         piece_yaw=shape.piece_yaw)
    x = x0 + rng.normal(size=x0.shape) * 0.02  # off-init iterate
    E, I = shape.equal_num, shape.non_equal_num
    duals = alm.DualState(lam=jnp.asarray(rng.normal(size=E) * 0.1),
                          mu=jnp.asarray(np.abs(rng.normal(size=I)) * 0.1),
                          rho=jnp.asarray(rng.uniform(1.0, 3.0)))
    scaling = alm.Scaling(
        scale_fx=jnp.asarray(1.0, jnp.float64),
        scale_cx=alm.default_scale_cx(shape, cfg.alm, jnp.float64))
    return grid, cfg, shape, x, bound, duals, scaling


def test_native_inner_cost_oracle():
    """The JAX ALM inner cost must match the independent C++ forward at
    fixed (x, duals) iterates to f64 accuracy (the alm_traj_opt.cpp:280-991
    cross-implementation oracle)."""
    from uneven_planner_tpu.solver import alm

    for seed in range(6):
        grid, cfg, shape, x, bound, duals, scaling = \
            _inner_cost_fixture(seed)
        f_jax = float(alm.inner_cost(
            jnp.asarray(x, jnp.float64),
            jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), bound),
            shape, grid, cfg.alm, duals, scaling))
        f_cpp = native.inner_cost(
            grid, cfg.alm, shape, x, bound,
            np.asarray(duals.lam), np.asarray(duals.mu),
            float(duals.rho), np.asarray(scaling.scale_cx))
        np.testing.assert_allclose(f_jax, f_cpp, rtol=1e-9, atol=1e-10)


def test_native_inner_grad_oracle():
    """JAX autodiff gradient of the inner cost vs f64 central differences
    of the INDEPENDENT C++ forward — validates the whole gradient chain
    (MINCO adjoint + constraint chain rule, se2traj.hpp:751-816 +
    alm_traj_opt.cpp:948-985) against non-JAX math."""
    from uneven_planner_tpu.solver import alm

    grid, cfg, shape, x, bound, duals, scaling = _inner_cost_fixture(1)
    bnd = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), bound)
    g_jax = np.asarray(jax.grad(
        lambda xx: alm.inner_cost(xx, bnd, shape, grid, cfg.alm, duals,
                                  scaling))(jnp.asarray(x, jnp.float64)))

    lam = np.asarray(duals.lam)
    mu = np.asarray(duals.mu)
    rho = float(duals.rho)
    sc = np.asarray(scaling.scale_cx)
    h = 1e-6
    g_fd = np.zeros_like(x)
    for i in range(x.shape[0]):
        xp = x.copy(); xp[i] += h
        xm = x.copy(); xm[i] -= h
        fp = native.inner_cost(grid, cfg.alm, shape, xp, bound, lam, mu,
                               rho, sc)
        fm = native.inner_cost(grid, cfg.alm, shape, xm, bound, lam, mu,
                               rho, sc)
        g_fd[i] = (fp - fm) / (2 * h)
    # central differences on a PHR objective with active-set kinks: the
    # tolerance is FD-limited, not implementation-limited
    np.testing.assert_allclose(g_jax, g_fd, rtol=5e-4, atol=5e-6)
