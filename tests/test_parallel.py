import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.config import ALMConfig, ManagerConfig, MapConfig
from uneven_planner_tpu import manager
from uneven_planner_tpu.parallel import mesh as pmesh
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid


def _tiny_problem():
    grid = make_synthetic_grid(MapConfig(xy_resolution=0.25,
                                         yaw_resolution=0.45),
                               dtype=np.float64)
    t = np.linspace(0, 1, 12)[:, None]
    path = np.concatenate(
        [(1 - t) * np.array([-3.0, -3.0]) + t * np.array([-1.5, -3.0]),
         np.zeros((12, 1))], axis=1)
    x0, bound = manager.init_guess_fixed(path, ManagerConfig(),
                                         piece_xy=4, piece_yaw=8)
    shape = alm.ProblemShape(piece_xy=4, piece_yaw=8, int_K=8)
    return grid, jnp.asarray(x0), jax.tree.map(jnp.asarray, bound), shape


def test_shard_map_batch_over_8_devices():
    """Batched solve sharded over the 8 virtual CPU devices with psum
    metric reduction; results must match per-lane independence."""
    devices = jax.devices("cpu")
    assert len(devices) >= 8
    grid, x0, bound, shape = _tiny_problem()
    mesh = pmesh.make_mesh(devices[:8])
    run = pmesh.plan_batch_shard_map(
        mesh, shape, grid, ALMConfig(),
        lbfgs_overrides={"mem_size": 4, "max_iterations": 5})

    B = 16
    x0s = jnp.broadcast_to(x0, (B,) + x0.shape)
    bounds = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                          bound)
    res, (n_conv, n_inner) = run(x0s, bounds)
    assert res.x.shape[0] == B
    # identical inputs -> identical outputs across shards
    x_np = np.asarray(res.x)
    np.testing.assert_allclose(x_np, np.broadcast_to(x_np[0], x_np.shape),
                               atol=1e-12)
    assert int(n_inner) == int(np.sum(np.asarray(res.inner_iters)))


def test_graft_entry_shapes():
    """entry() must be jit-traceable (abstract eval only — no compile)."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.x.shape[0] == args[0].shape[0]
