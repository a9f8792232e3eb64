import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uneven_planner_tpu.minco import banded, minco
from uneven_planner_tpu.minco.traj import SE2Traj, non_hol_error, se2_state


def _random_blocks(rng, N, k, m):
    L = rng.normal(size=(N, k, k)) * 0.1
    U = rng.normal(size=(N, k, k)) * 0.1
    D = rng.normal(size=(N, k, k)) * 0.1 + np.eye(k) * 3.0
    b = rng.normal(size=(N, k, m))
    return map(jnp.asarray, (L, D, U, b))


def _dense(L, D, U):
    N, k, _ = D.shape
    A = np.zeros((N * k, N * k))
    for i in range(N):
        A[i*k:(i+1)*k, i*k:(i+1)*k] = D[i]
        if i > 0:
            A[i*k:(i+1)*k, (i-1)*k:i*k] = L[i]
        if i < N - 1:
            A[i*k:(i+1)*k, (i+1)*k:(i+2)*k] = U[i]
    return A


def test_block_tridiag_vs_dense():
    rng = np.random.default_rng(0)
    L, D, U, b = _random_blocks(rng, 7, 6, 2)
    x = banded.block_tridiag_solve(L, D, U, b)
    A = _dense(np.asarray(L), np.asarray(D), np.asarray(U))
    x_dense = np.linalg.solve(A, np.asarray(b).reshape(-1, 2))
    np.testing.assert_allclose(np.asarray(x).reshape(-1, 2), x_dense,
                               rtol=1e-9, atol=1e-10)
    # matvec consistency
    Ax = banded.block_tridiag_matvec(L, D, U, x)
    np.testing.assert_allclose(np.asarray(Ax), np.asarray(b),
                               rtol=1e-8, atol=1e-9)


@pytest.fixture(scope="module")
def minco_problem():
    rng = np.random.default_rng(1)
    N = 8
    inner = jnp.asarray(rng.normal(size=(N - 1, 2)))
    ts = jnp.asarray(rng.uniform(0.5, 1.5, size=(N,)))
    head = jnp.asarray([[0.0, 0.0], [0.3, 0.1], [0.0, 0.0]])
    tail = jnp.asarray([[2.0, 1.0], [0.0, 0.2], [0.1, 0.0]])
    return inner, ts, head, tail


def test_minco_interpolation_conditions(minco_problem):
    """The generated spline must hit boundary PVA, pass through inner points,
    and be C^4 at junctions (the defining conditions assembled in
    se2traj.hpp:595-680)."""
    inner, ts, head, tail = minco_problem
    c = minco.generate(inner, ts, head, tail)
    N = ts.shape[0]

    p0, v0, a0, _ = minco.eval_piece(c[0], jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray([p0, v0, a0]), np.asarray(minco_problem[2]),
                               atol=1e-9)
    pT, vT, aT, _ = minco.eval_piece(c[-1], ts[-1])
    np.testing.assert_allclose(np.asarray([pT, vT, aT]), np.asarray(minco_problem[3]),
                               atol=1e-8)

    for i in range(N - 1):
        end = minco.eval_piece(c[i], ts[i])
        start = minco.eval_piece(c[i + 1], jnp.asarray(0.0))
        # position hits the inner waypoint
        np.testing.assert_allclose(np.asarray(end[0]), np.asarray(inner[i]),
                                   atol=1e-8)
        # C0-C3 continuity (value, vel, acc, jerk)
        for k in range(4):
            np.testing.assert_allclose(np.asarray(end[k]), np.asarray(start[k]),
                                       atol=1e-7)
        # C4 (snap) continuity: d4/dt4 = 24 c4 + 120 c5 t
        snap_end = 24 * c[i, 4] + 120 * c[i, 5] * ts[i]
        snap_start = 24 * c[i + 1, 4]
        np.testing.assert_allclose(np.asarray(snap_end), np.asarray(snap_start),
                                   atol=1e-6)


def test_jerk_cost_matches_numeric_integral(minco_problem):
    inner, ts, head, tail = minco_problem
    c = minco.generate(inner, ts, head, tail)
    closed = float(minco.jerk_cost(c, ts))
    # numeric integral of ||jerk||^2
    total = 0.0
    for i in range(ts.shape[0]):
        s = np.linspace(0.0, float(ts[i]), 2001)
        jerk = np.stack([np.asarray(minco.eval_piece(c[i], jnp.asarray(si))[3])
                         for si in s])
        total += np.trapezoid(np.sum(jerk ** 2, axis=1), s)
    np.testing.assert_allclose(closed, total, rtol=1e-6)


def test_jerk_grad_matches_finite_difference(minco_problem):
    """Autodiff through generate (our replacement for the reference's
    hand-written adjoint calGradCTtoQT, se2traj.hpp:751-816) must equal
    finite differences of the jerk energy w.r.t. inner points and times."""
    inner, ts, head, tail = minco_problem

    @jax.jit
    def cost(inner, ts):
        return minco.jerk_cost(minco.generate(inner, ts, head, tail), ts)

    g_inner, g_ts = jax.jit(jax.grad(cost, argnums=(0, 1)))(inner, ts)
    eps = 1e-6
    for (arr, grad, name) in ((inner, g_inner, "inner"), (ts, g_ts, "ts")):
        flat = np.asarray(arr).ravel()
        gflat = np.asarray(grad).ravel()
        for j in [0, flat.size // 2, flat.size - 1]:
            pert = flat.copy(); pert[j] += eps
            fp = float(cost(jnp.asarray(pert.reshape(arr.shape)), ts)
                       if name == "inner" else
                       cost(inner, jnp.asarray(pert.reshape(arr.shape))))
            pert[j] -= 2 * eps
            fm = float(cost(jnp.asarray(pert.reshape(arr.shape)), ts)
                       if name == "inner" else
                       cost(inner, jnp.asarray(pert.reshape(arr.shape))))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(gflat[j], fd, rtol=2e-5,
                                       err_msg=f"{name}[{j}]")


def test_nonhol_error_straight_line():
    """A straight line driven along +x with yaw=0 is exactly non-holonomic-
    feasible: error must vanish (se2traj.hpp:551-561)."""
    N = 4
    xs = np.linspace(0.0, 3.0, N + 1)
    inner = jnp.asarray(np.stack([xs[1:-1], np.zeros(N - 1)], axis=1))
    ts = jnp.full((N,), 1.0)
    head = jnp.asarray([[0.0, 0.0], [0.75, 0.0], [0.0, 0.0]])
    tail = jnp.asarray([[3.0, 0.0], [0.75, 0.0], [0.0, 0.0]])
    c_xy = minco.generate(inner, ts, head, tail)
    c_yaw = minco.generate(jnp.zeros((N - 1, 1)), ts,
                           jnp.zeros((3, 1)), jnp.zeros((3, 1)))
    traj = SE2Traj(c_xy, ts, c_yaw, ts)
    err = float(non_hol_error(traj, num_samples=512))
    assert err < 1e-8
    # y stays 0 on the line
    _, vel, _, yaw, _, _ = se2_state(traj, jnp.asarray(1.234))
    assert abs(float(yaw)) < 1e-12


def test_uniform_fast_path_matches_generate():
    """The constant-inverse uniform-time path (minco/uniform.py) must equal
    the general block-tridiagonal `generate` for uniform piece times, for
    coefficients and jerk energy alike."""
    from uneven_planner_tpu.minco import uniform
    rng = np.random.default_rng(7)
    for N, dim in [(2, 2), (5, 2), (10, 2), (20, 1)]:
        Tp = 0.37
        inner = jnp.asarray(rng.normal(size=(N - 1, dim)))
        head = jnp.asarray(rng.normal(size=(3, dim)))
        tail = jnp.asarray(rng.normal(size=(3, dim)))
        ts = jnp.full((N,), Tp)
        c_ref = minco.generate(inner, ts, head, tail)
        cn = uniform.generate_norm(inner, jnp.asarray(Tp), head, tail, N)
        c_new = uniform.denormalize(cn, jnp.asarray(Tp))
        np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_ref),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            float(uniform.jerk_cost_norm(cn, jnp.asarray(Tp), N)),
            float(minco.jerk_cost(c_ref, ts)), rtol=1e-9)


def test_uniform_sample_plan_static_yaw_location():
    """The static yaw-piece mapping must agree with locating by global time
    (alm_traj_opt.cpp:747-764) away from exact junctions, and by C^4
    continuity the sampled yaw/dyaw agree everywhere."""
    from uneven_planner_tpu.minco import uniform
    N, Nyaw, K = 10, 20, 16
    _, _, _, yidx, BY0, BY1 = uniform.sample_plan(N, Nyaw, K)
    rng = np.random.default_rng(3)
    Tp = 0.21
    T = Tp * N
    Tpy = T / Nyaw
    inner = jnp.asarray(rng.normal(size=(Nyaw - 1, 1)))
    head = jnp.asarray(rng.normal(size=(3, 1)))
    tail = jnp.asarray(rng.normal(size=(3, 1)))
    c = minco.generate(inner, jnp.full((Nyaw,), Tpy), head, tail)
    cn = uniform.generate_norm(inner, jnp.asarray(Tpy), head, tail, Nyaw)
    # static-plan evaluation
    cy = np.asarray(cn[yidx.reshape(-1), :, 0])
    yaw_static = np.sum(BY0.reshape(-1, 6) * cy, axis=-1)
    dyaw_static = np.sum(BY1.reshape(-1, 6) * cy, axis=-1) / Tpy
    # dynamic evaluation at the same global times
    u = np.arange(K + 1) / K
    t_glob = ((np.arange(N)[:, None] + u[None, :]) * Tp).reshape(-1)
    for s in range(0, len(t_glob), 17):
        val, dot, _, _ = minco.eval_traj(c, jnp.full((Nyaw,), Tpy),
                                         jnp.asarray(t_glob[s]))
        np.testing.assert_allclose(yaw_static[s], float(val[0]),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(dyaw_static[s], float(dot[0]),
                                   rtol=1e-7, atol=1e-8)
