"""Device-mesh scenario parallelism.

The reference has no distributed layer (SURVEY.md §2.7: ROS topics between
single-host processes).  Here the parallel axis is the *scenario batch*: a
whole ALM solve (or MPC solve) is the unit of parallelism, sharded over a
1-D device mesh.  Inside a solve everything stays on-chip; across the mesh
only metric reductions communicate (psum over ICI).

Two entry points:
- `plan_batch`: GSPMD path — `jax.jit` with NamedSharding on the batch axis;
  XLA partitions the vmapped solve with no manual collectives.
- `plan_batch_shard_map`: explicit `shard_map` path with a `psum` metrics
  reduction, used by the multi-chip dry run and scaling benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uneven_planner_tpu.solver import alm


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "batch") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def plan_batch(mesh: Mesh, shape: alm.ProblemShape, grid, cfg,
               lbfgs_overrides=None, axis_name: str = "batch"):
    """Compile a batched ALM solve with the batch dim sharded over the mesh.

    Returns a jitted fn (x0s [B, n], bounds batched Boundary) -> ALMResult.
    B must be divisible by the mesh size.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    solve_one = lambda x, b: alm.solve_flat(x, b, shape, grid, cfg,
                                       lbfgs_overrides=lbfgs_overrides)

    @partial(jax.jit,
             in_shardings=(batch_sharding,
                           jax.tree.map(lambda _: batch_sharding,
                                        alm.Boundary(0, 0, 0, 0))),
             out_shardings=None)
    def run(x0s, bounds):
        return jax.vmap(solve_one)(x0s, bounds)

    return run


def plan_batch_shard_map(mesh: Mesh, shape: alm.ProblemShape, grid, cfg,
                         lbfgs_overrides=None, axis_name: str = "batch"):
    """shard_map variant returning (result, metrics) where metrics are
    mesh-wide psum reductions (converged count, total inner iterations)."""
    from jax.experimental.shard_map import shard_map

    solve_one = lambda x, b: alm.solve_flat(x, b, shape, grid, cfg,
                                       lbfgs_overrides=lbfgs_overrides)

    def local(x0s, bounds):
        res = jax.vmap(solve_one)(x0s, bounds)
        n_conv = jax.lax.psum(jnp.sum(res.converged.astype(jnp.int32)),
                              axis_name)
        n_inner = jax.lax.psum(jnp.sum(res.inner_iters), axis_name)
        return res, (n_conv, n_inner)

    bound_spec = jax.tree.map(lambda _: P(axis_name),
                              alm.Boundary(0, 0, 0, 0))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis_name), bound_spec),
                   out_specs=(_result_spec(axis_name), (P(), P())),
                   check_rep=False)
    return jax.jit(fn)


def _result_spec(axis_name):
    """ALMResult pytree of PartitionSpecs: every leaf carries the batch axis."""
    from uneven_planner_tpu.minco.traj import SE2Traj
    p = P(axis_name)
    return alm.ALMResult(x=p, traj=SE2Traj(p, p, p, p), converged=p,
                         outer_iters=p, inner_iters=p, res_h=p, res_g=p,
                         lbfgs_status=p, evals=p)
