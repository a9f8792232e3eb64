"""Multi-host distributed runtime: jax.distributed + DCN-aware batch sharding.

The reference's only multi-process structure is its ROS node graph on one
machine (reference: src/uneven_planner/plan_manager/launch/run_hill.launch:
14-33 — manager, MPC, Gazebo, helpers over TCPROS).  The TPU-native
equivalent is a SPMD job: every host runs this same program,
`jax.distributed.initialize` forms the global runtime, and the scenario
batch is sharded over a (hosts x local-devices) mesh — the outer axis rides
DCN, the inner axis ICI, so batch halves never cross hosts and only metric
psums touch the network (SURVEY.md §2.7).

Entry points:
- `initialize(...)`: env-var-driven wrapper over jax.distributed.initialize.
- `hierarchical_mesh()`: 2-D ("dcn", "ici") mesh over all global devices.
- `shard_scenarios(...)`: build global jax.Arrays from per-host local
  scenario batches (each host generates only its own shard — scenario
  generation scales with the fleet, like the reference's per-node episode
  loaders, mpc.cpp:69-93).
- `plan_batch_global(...)`: jit the batched ALM solve over the global mesh
  with cross-host converged/iteration psums.
- `launch_local(...)`: test/bench helper that forks N single-host processes
  on this machine (CPU backend, virtual devices) to exercise the full
  multi-process path without a pod.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join (or form) the distributed runtime.

    Arguments default to the UNEVEN_COORDINATOR / UNEVEN_NUM_PROCESSES /
    UNEVEN_PROCESS_ID environment variables so the same program text runs
    on every host of a fleet (SPMD launch contract).  No-op when neither
    arguments nor env vars are present (single-process mode).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "UNEVEN_COORDINATOR")
    if coordinator_address is None:
        return
    num_processes = num_processes if num_processes is not None else int(
        os.environ["UNEVEN_NUM_PROCESSES"])
    process_id = process_id if process_id is not None else int(
        os.environ["UNEVEN_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def hierarchical_mesh(devices: Optional[Sequence] = None):
    """2-D mesh [hosts, devices-per-host] with axes ("dcn", "ici").

    Sharding the batch over ("dcn", "ici") keeps each scenario's solve on
    one chip, each host's shard on its own chips, and routes the only
    cross-host traffic (metric psums) hierarchically: intra-host over ICI
    first, one value per host over DCN.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices) if devices is not None else jax.devices()
    procs = sorted({d.process_index for d in devices})
    per_host = {}
    for d in devices:
        per_host.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in per_host.values()}
    assert len(counts) == 1, f"uneven devices per host: {per_host}"
    arr = np.asarray([sorted(per_host[p], key=lambda d: d.id)
                      for p in procs])
    return Mesh(arr, ("dcn", "ici"))


def batch_sharding(mesh):
    """NamedSharding placing the scenario batch over both mesh axes."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(("dcn", "ici")))


def shard_scenarios(mesh, local_x0s: np.ndarray, local_bounds):
    """Global (x0s, bounds) jax.Arrays from this process's local shard.

    `local_x0s` [B_local, n] and `local_bounds` (Boundary of [B_local, ...])
    are host numpy; the returned arrays are globally sharded with
    B_global = B_local * num_processes.
    """
    import jax

    sh = batch_sharding(mesh)

    def mk(a):
        return jax.make_array_from_process_local_data(sh, np.asarray(a))

    return mk(local_x0s), jax.tree.map(mk, local_bounds)


def plan_batch_global(mesh, shape, grid, cfg, lbfgs_overrides=None):
    """Jit the batched flat ALM solve over the global mesh.

    Returns run(x0s, bounds) -> (ALMResult sharded over the batch,
    (n_converged, total_inner_iters) replicated) — the psums are the only
    cross-host collectives (they ride ICI then DCN).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from uneven_planner_tpu.solver import alm

    axes = ("dcn", "ici")
    solve_one = lambda x, b: alm.solve_flat(
        x, b, shape, grid, cfg, lbfgs_overrides=lbfgs_overrides)

    def local(x0s, bounds):
        res = jax.vmap(solve_one)(x0s, bounds)
        n_conv = jax.lax.psum(jnp.sum(res.converged.astype(jnp.int32)),
                              axes)
        n_inner = jax.lax.psum(jnp.sum(res.inner_iters), axes)
        return res, (n_conv, n_inner)

    from uneven_planner_tpu.minco.traj import SE2Traj
    p = P(axes)
    bound_spec = jax.tree.map(lambda _: p, alm.Boundary(0, 0, 0, 0))
    res_spec = alm.ALMResult(x=p, traj=SE2Traj(p, p, p, p), converged=p,
                             outer_iters=p, inner_iters=p, res_h=p,
                             res_g=p, lbfgs_status=p, evals=p)
    fn = shard_map(local, mesh=mesh, in_specs=(p, bound_spec),
                   out_specs=(res_spec, (P(), P())), check_rep=False)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Local multi-process launcher (tests / single-box scaling runs)
# ---------------------------------------------------------------------------

_WORKER_PROLOGUE = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count={local_devices}")
from uneven_planner_tpu.parallel import distributed
distributed.initialize({coord!r}, {nprocs}, {pid})
"""


def launch_local(worker_body: str, num_processes: int = 2,
                 local_devices: int = 4, timeout: float = 600.0,
                 port: Optional[int] = None):
    """Fork `num_processes` CPU-backend workers on this machine, each running
    `worker_body` (python source, executed after distributed init with
    variables `pid`, `nprocs` in scope).  Returns list of (returncode,
    stdout) per process.  This is the dev-box analog of a pod launch: same
    initialize() path, same global mesh, DCN axis = local TCP.
    """
    import socket
    import subprocess
    import sys
    import tempfile

    if port is None:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    # worker scripts live in one TemporaryDirectory scoped to the launch —
    # no per-process NamedTemporaryFile leak across bench/test loops
    with tempfile.TemporaryDirectory(prefix="upt_workers_") as tdir:
        procs = []
        for pid in range(num_processes):
            src = (_WORKER_PROLOGUE.format(repo=repo, coord=coord,
                                           nprocs=num_processes, pid=pid,
                                           local_devices=local_devices)
                   + f"\npid = {pid}\nnprocs = {num_processes}\n"
                   + worker_body)
            fname = os.path.join(tdir, f"worker{pid}.py")
            with open(fname, "w") as f:
                f.write(src)
            env = dict(os.environ)
            # The axon dev-TPU sitecustomize registers its PJRT plugin
            # (which overrides JAX_PLATFORMS and reports a single-process
            # backend) whenever PALLAS_AXON_POOL_IPS is set — scrub it so
            # workers get a clean multi-device CPU backend.
            for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                      "AXON_POOL_SVC_OVERRIDE", "PJRT_LIBRARY_PATH",
                      "TPU_LIBRARY_PATH", "JAX_PLATFORMS"):
                env.pop(k, None)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                                f"{local_devices}")
            procs.append(subprocess.Popen(
                [sys.executable, fname], stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True, env=env))
        out = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                stdout, _ = p.communicate()
            out.append((p.returncode, stdout))
        return out
