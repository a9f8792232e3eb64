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


_MP_WORKER = """
import numpy as np
import jax
import jax.numpy as jnp
from uneven_planner_tpu.config import ALMConfig, ManagerConfig, MapConfig
from uneven_planner_tpu import manager
from uneven_planner_tpu.parallel import distributed as dist
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == nprocs * 4

grid = make_synthetic_grid(MapConfig(xy_resolution=0.25,
                                     yaw_resolution=0.45), dtype=np.float32)
shape = alm.ProblemShape(piece_xy=4, piece_yaw=8, int_K=8)
t = np.linspace(0, 1, 12)[:, None]
path = np.concatenate(
    [(1 - t) * np.array([-3.0, -3.0]) + t * np.array([-1.5, -3.0]),
     np.zeros((12, 1))], axis=1)
x0, bound = manager.init_guess_fixed(path, ManagerConfig(),
                                     piece_xy=4, piece_yaw=8)
B_local = 4  # one scenario per local virtual device
x0s = np.broadcast_to(np.asarray(x0, np.float32),
                      (B_local,) + x0.shape).copy()
bounds = jax.tree.map(
    lambda a: np.broadcast_to(np.asarray(a, np.float32),
                              (B_local,) + a.shape).copy(), bound)

mesh = dist.hierarchical_mesh()
assert mesh.devices.shape == (nprocs, 4), mesh.devices.shape
xg, bg = dist.shard_scenarios(mesh, x0s, bounds)
assert xg.shape[0] == nprocs * B_local
# Generous solver budget: truncated inner iterations make marginal lanes
# sensitive to width-dependent f32 rounding (different XLA tilings per
# shard width), so the cross-width comparison below needs fully-converged
# solves, not budget-limited ones.
ov = {"mem_size": 8, "max_iterations": 30}
run = dist.plan_batch_global(mesh, shape, grid, ALMConfig(),
                             lbfgs_overrides=ov)
res, (n_conv, n_inner) = run(xg, bg)
jax.block_until_ready(res)

# local single-device reference on this host's own scenarios
ref = jax.jit(jax.vmap(lambda x, b: alm.solve_flat(
    x, b, shape, grid, ALMConfig(), lbfgs_overrides=ov)))(
    jnp.asarray(x0s), jax.tree.map(jnp.asarray, bounds))
shards = sorted(res.x.addressable_shards, key=lambda s: s.index)
mine = np.concatenate([np.asarray(s.data) for s in shards])
# same solve, different vmap widths -> same optimum within solver tolerance
ok = np.allclose(mine, np.asarray(ref.x), atol=1e-2)
local_conv = int(np.asarray(ref.converged).sum())
# identical scenarios on every host -> global count is nprocs * local
print("RESULT", pid, int(n_conv), local_conv * nprocs, bool(ok), flush=True)
assert int(n_conv) == local_conv * nprocs
assert ok
print("WORKER_OK", pid, flush=True)
"""


def test_multiprocess_two_hosts():
    """Full jax.distributed path: 2 processes x 4 virtual CPU devices form
    one (2, 4) ("dcn", "ici") mesh; the batched solve shards over both axes
    and the converged-count psum crosses the process boundary (the
    multi-host runtime of SURVEY.md §2.7 / BASELINE config 5, exercised
    without a pod)."""
    from uneven_planner_tpu.parallel import distributed as dist

    out = dist.launch_local(_MP_WORKER, num_processes=2, local_devices=4,
                            timeout=900.0)
    for rc, stdout in out:
        assert rc == 0, stdout[-2000:]
        assert "WORKER_OK" in stdout, stdout[-2000:]


def test_graft_entry_shapes():
    """entry() must be jit-traceable (abstract eval only — no compile)."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.x.shape[0] == args[0].shape[0]
