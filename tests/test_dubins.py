import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.frontend import dubins

RHO = 0.475  # wheel_base 0.26 / tan(0.5) (kino_astar.cpp:33)


def _rand_poses(n, seed=0, span=4.0):
    rng = np.random.default_rng(seed)
    q0 = np.concatenate([rng.uniform(-span, span, (n, 2)),
                         rng.uniform(-np.pi, np.pi, (n, 1))], axis=1)
    q1 = np.concatenate([rng.uniform(-span, span, (n, 2)),
                         rng.uniform(-np.pi, np.pi, (n, 1))], axis=1)
    return jnp.asarray(q0), jnp.asarray(q1)


def test_straight_line_case():
    q0 = jnp.asarray([0.0, 0.0, 0.0])
    q1 = jnp.asarray([3.0, 0.0, 0.0])
    d = float(dubins.distance(q0, q1, RHO))
    np.testing.assert_allclose(d, 3.0, atol=1e-9)
    mid = dubins.sample(q0, q1, RHO, jnp.asarray(1.5))
    np.testing.assert_allclose(np.asarray(mid), [1.5, 0.0, 0.0], atol=1e-9)


def test_endpoints_and_lower_bound():
    q0s, q1s = _rand_poses(40, seed=1)

    @jax.jit
    def run(q0s, q1s):
        dist = jax.vmap(lambda a, b: dubins.distance(a, b, RHO))(q0s, q1s)
        end = jax.vmap(lambda a, b, d: dubins.sample(a, b, RHO, d))(
            q0s, q1s, dist)
        start = jax.vmap(lambda a, b: dubins.sample(a, b, RHO,
                                                    jnp.asarray(0.0)))(
            q0s, q1s)
        return dist, start, end

    dist, start, end = jax.tree.map(np.asarray, run(q0s, q1s))
    q0s, q1s = np.asarray(q0s), np.asarray(q1s)
    euclid = np.linalg.norm(q1s[:, :2] - q0s[:, :2], axis=1)
    assert np.all(dist >= euclid - 1e-6), "Dubins below Euclidean bound"
    np.testing.assert_allclose(start[:, :2], q0s[:, :2], atol=1e-6)
    # wrapped heading at both ends
    np.testing.assert_allclose(np.sin(start[:, 2]), np.sin(q0s[:, 2]),
                               atol=1e-6)
    np.testing.assert_allclose(end[:, :2], q1s[:, :2], atol=1e-5)
    np.testing.assert_allclose(np.sin(end[:, 2]), np.sin(q1s[:, 2]),
                               atol=1e-5)
    np.testing.assert_allclose(np.cos(end[:, 2]), np.cos(q1s[:, 2]),
                               atol=1e-5)


def test_path_continuity_and_curvature():
    """Sampled path must be continuous with bounded turn rate |dtheta/ds|
    <= 1/rho."""
    q0 = jnp.asarray([0.0, 0.0, 2.0])
    q1 = jnp.asarray([1.2, -0.8, -1.0])
    L = float(dubins.distance(q0, q1, RHO))
    ss = jnp.linspace(0.0, L, 400)
    path = np.asarray(dubins.sample_many(q0, q1, RHO, ss))
    step = L / 399
    dxy = np.linalg.norm(np.diff(path[:, :2], axis=0), axis=1)
    assert np.all(dxy < 1.5 * step), "position jump in sampled path"
    dth = np.abs(np.diff(np.unwrap(path[:, 2])))
    assert np.all(dth <= step / RHO + 1e-6), "turn rate above 1/rho"
