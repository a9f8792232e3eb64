import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.solver import lbfgs


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def quadratic(x):
    d = jnp.arange(1, x.shape[0] + 1, dtype=x.dtype)
    return 0.5 * jnp.sum(d * x * x) - jnp.sum(x)


def nonsmooth(x):
    """Piecewise-smooth function (the Lewis–Overton search targets exactly
    this class)."""
    return jnp.sum(jnp.abs(x - 0.3)) + 0.5 * jnp.sum(x * x)


PARAMS = lbfgs.LBFGSParams(mem_size=16, g_epsilon=1e-8, past=3, delta=1e-12,
                           max_iterations=500)


def test_quadratic_exact():
    fun = jax.value_and_grad(quadratic)
    x0 = jnp.zeros(10)
    res = jax.jit(lambda x: lbfgs.minimize(fun, x, PARAMS))(x0)
    d = np.arange(1, 11)
    np.testing.assert_allclose(np.asarray(res.x), 1.0 / d, atol=1e-6)
    assert int(res.status) in (lbfgs.CONVERGENCE, lbfgs.STOP)


def test_rosenbrock():
    fun = jax.value_and_grad(rosenbrock)
    x0 = jnp.asarray(np.full(6, -1.2))
    res = jax.jit(lambda x: lbfgs.minimize(fun, x, PARAMS))(x0)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(6), atol=1e-5)
    assert float(res.f) < 1e-10


def test_nonsmooth():
    fun = jax.value_and_grad(nonsmooth)
    x0 = jnp.asarray(np.linspace(-2, 2, 8))
    params = lbfgs.LBFGSParams(mem_size=16, g_epsilon=0.0, past=3,
                               delta=1e-14, max_iterations=500)
    res = jax.jit(lambda x: lbfgs.minimize(fun, x, params))(x0)
    # minimum of |x-0.3| + 0.5 x^2 is x=0.3 (subgradient contains 0)
    np.testing.assert_allclose(np.asarray(res.x), 0.3, atol=1e-6)


def test_vmapped_batch_converges_independently():
    fun = jax.value_and_grad(rosenbrock)
    x0s = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, size=(8, 6)))
    res = jax.jit(jax.vmap(lambda x: lbfgs.minimize(fun, x, PARAMS)))(x0s)
    np.testing.assert_allclose(np.asarray(res.x), np.ones((8, 6)), atol=1e-4)
    # different starts take different iteration counts
    assert len(set(np.asarray(res.iters).tolist())) > 1


def test_max_iterations_status():
    fun = jax.value_and_grad(rosenbrock)
    params = lbfgs.LBFGSParams(mem_size=8, g_epsilon=1e-12, past=0,
                               max_iterations=3)
    res = jax.jit(lambda x: lbfgs.minimize(fun, x, params))(
        jnp.asarray(np.full(6, -1.2)))
    assert int(res.status) == lbfgs.MAXITER
    assert int(res.iters) == 3


def test_two_loop_unroll_matches_fori():
    """two_loop_unroll traces the identical op sequence; directions must
    match the fori_loop path to f32 reassociation noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uneven_planner_tpu.solver import lbfgs

    rng = np.random.default_rng(0)
    m, n = 16, 66
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    S = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    Y = S + 0.1 * jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    YS = jnp.einsum("ij,ij->i", S, Y)
    f0 = jax.jit(lambda *a: lbfgs._two_loop(*a, m, unroll=False))
    f1 = jax.jit(lambda *a: lbfgs._two_loop(*a, m, unroll=True))
    for end, bound in ((3, 3), (0, 16), (7, 16), (5, 0), (15, 7)):
        args = (g, S, Y, YS, jnp.asarray(end), jnp.asarray(bound),
                YS[end - 1], jnp.sum(Y[end - 1] ** 2))
        np.testing.assert_allclose(np.asarray(f0(*args)),
                                   np.asarray(f1(*args)),
                                   rtol=2e-5, atol=2e-6)
