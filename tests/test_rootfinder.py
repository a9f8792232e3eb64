import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.minco.traj import SE2Traj, max_vel_rate
from uneven_planner_tpu.utils import rootfinder


def test_roots_match_numpy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        p = rng.normal(size=6)  # quintic
        z = np.asarray(rootfinder.roots(jnp.asarray(p)))
        z_np = np.roots(p)
        # compare as multisets via sorted distance
        z_sorted = z[np.argsort(z.real + 1e-6 * z.imag)]
        np_sorted = z_np[np.argsort(z_np.real + 1e-6 * z_np.imag)]
        np.testing.assert_allclose(z_sorted, np_sorted, rtol=1e-5, atol=1e-6)


def test_poly_val_and_sqr():
    p = jnp.asarray([2.0, -1.0, 3.0])  # 2x^2 - x + 3
    assert float(rootfinder.poly_val(p, jnp.asarray(2.0))) == 9.0
    sq = np.asarray(rootfinder.poly_sqr(p))
    x = 1.7
    np.testing.assert_allclose(np.polyval(sq, x), np.polyval(np.asarray(p), x) ** 2,
                               rtol=1e-12)


def test_max_vel_rate_exact_vs_dense():
    """Root-isolation max ||v|| must match (and upper-bound) dense
    sampling."""
    rng = np.random.default_rng(1)
    N = 5
    inner = jnp.asarray(rng.normal(size=(N - 1, 2)))
    ts = jnp.asarray(rng.uniform(0.6, 1.4, size=N))
    head = jnp.asarray([[0.0, 0.0], [0.4, 0.1], [0.0, 0.0]])
    tail = jnp.asarray([[1.5, 1.0], [0.0, -0.2], [0.0, 0.0]])
    c_xy = minco.generate(inner, ts, head, tail)
    exact = float(rootfinder.max_vel_rate_exact(c_xy, ts))

    c_yaw = minco.generate(jnp.zeros((N - 1, 1)), ts, jnp.zeros((3, 1)),
                           jnp.zeros((3, 1)))
    traj = SE2Traj(c_xy, ts, c_yaw, ts)
    dense = float(max_vel_rate(traj, num_samples=4096))
    assert exact >= dense - 1e-6, "root-based max below sampled max"
    np.testing.assert_allclose(exact, dense, rtol=2e-3)
