"""Mesh-scaling benchmark: batched solves across 1..N devices.

BASELINE config 5 measurement harness: shard the scenario batch over a 1-D
mesh with `shard_map` (psum metric reductions ride the interconnect) and
report solves/s and scaling efficiency per device count.  On a multi-chip
TPU slice the mesh axes map to ICI; on this single-chip dev box the same
code runs against virtual CPU devices (functional validation; absolute
numbers are only meaningful on real chips).

Usage: python -m uneven_planner_tpu.bench.scaling [--devices 8 --batch 64]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


_MP_BENCH_WORKER = """
import time
import numpy as np
import jax
import jax.numpy as jnp
from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu import manager
from uneven_planner_tpu.parallel import distributed as dist
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

cfg = scene_config("hill")
grid = make_synthetic_grid(cfg.map, dtype=np.float32)
shape = alm.ProblemShape(10, 20, 16)
B_local = {b_local}

rng = np.random.default_rng(1000 + pid)
x0s, bounds = [], []
for _ in range(B_local):
    ang = rng.uniform(-np.pi, np.pi)
    start = rng.uniform(-3.5, -1.5, size=2)
    goal = np.clip(start + 2.5 * np.array([np.cos(ang), np.sin(ang)]),
                   -4, 4)
    yaw = np.arctan2(goal[1] - start[1], goal[0] - start[0])
    t = np.linspace(0, 1, 16)[:, None]
    p = np.concatenate([(1 - t) * start + t * goal,
                        np.full((16, 1), yaw)], axis=1)
    xi, bi = manager.init_guess_fixed(p, cfg.manager, 10, 20)
    x0s.append(np.asarray(xi, np.float32))
    bounds.append(jax.tree.map(lambda a: np.asarray(a, np.float32), bi))
x0s = np.stack(x0s)
bounds = jax.tree.map(lambda *a: np.stack(a), *bounds)

mesh = dist.hierarchical_mesh()
xg, bg = dist.shard_scenarios(mesh, x0s, bounds)
run = dist.plan_batch_global(mesh, shape, grid, cfg.alm,
                             lbfgs_overrides={{"mem_size": 8,
                                               "max_iterations": 150}})
res, (n_conv, _) = run(xg, bg)
jax.block_until_ready(res)
t0 = time.time()
res, (n_conv, _) = run(xg, bg)
jax.block_until_ready(res)
dt = time.time() - t0
if pid == 0:
    B = B_local * nprocs
    print(f"MPBENCH procs={{nprocs}} batch={{B}} time={{dt:.3f}}s "
          f"solves/s={{B / dt:.1f}} converged={{int(n_conv)}}/{{B}}",
          flush=True)
"""


def run_multiprocess(nprocs: int, local_devices: int, b_local: int,
                     out_path: str | None = None):
    """Fork nprocs CPU workers; each runs the distributed solve over the
    global (nprocs x local_devices) mesh.  Prints per-config rate; scaling
    efficiency = rate(n) / (n * rate(1)).  With `out_path`, writes the
    sweep as a JSON artifact (committed evidence for the multi-host
    runtime; absolute rates on virtual CPU devices are only meaningful
    relative to each other)."""
    import json

    from uneven_planner_tpu.parallel import distributed as dist

    rates = {}
    for n in range(1, nprocs + 1):
        out = dist.launch_local(_MP_BENCH_WORKER.format(b_local=b_local),
                                num_processes=n,
                                local_devices=local_devices,
                                timeout=1800.0)
        for rc, stdout in out:
            if rc != 0:
                print(stdout[-1500:])
                raise SystemExit(f"worker failed (procs={n})")
        for rc, stdout in out:
            for line in stdout.splitlines():
                if line.startswith("MPBENCH"):
                    print(line)
                    rates[n] = float(line.split("solves/s=")[1].split()[0])
    points = []
    if 1 in rates:
        for n, r in sorted(rates.items()):
            eff = r / (rates[1] * n)
            print(f"procs={n} efficiency={eff * 100:.1f}%")
            points.append({"procs": n, "local_devices": local_devices,
                           "batch": b_local * n,
                           "solves_per_sec": round(r, 2),
                           "efficiency": round(eff, 4)})
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"kind": "multiprocess_scaling_sweep",
                       "backend": "cpu-virtual",
                       "note": "jax.distributed N-process sweep on one box;"
                               " efficiency is relative (DCN-topology"
                               " functional evidence, not chip perf)",
                       "points": points}, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all available)")
    ap.add_argument("--batch", type=int, default=64,
                    help="total scenario batch (divisible by device counts)")
    ap.add_argument("--platform", default=None,
                    help="jax platform to use (e.g. cpu, tpu)")
    ap.add_argument("--multiprocess", type=int, default=0,
                    help="run N-process jax.distributed scaling sweep "
                         "(CPU backend, single box)")
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual devices per process in --multiprocess")
    ap.add_argument("--local-batch", type=int, default=16,
                    help="scenarios per process in --multiprocess")
    ap.add_argument("--out", default=None,
                    help="write the sweep as a JSON artifact")
    args = ap.parse_args()

    if args.multiprocess:
        run_multiprocess(args.multiprocess, args.local_devices,
                         args.local_batch, out_path=args.out)
        return

    import jax
    import jax.numpy as jnp

    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.parallel import mesh as pmesh
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

    devices = jax.devices(args.platform) if args.platform else jax.devices()
    n_max = args.devices or len(devices)
    cfg = scene_config("hill")
    grid = jax.device_put(
        make_synthetic_grid(cfg.map, dtype=np.float32), devices[0])
    shape = alm.ProblemShape(10, 20, 16)

    rng = np.random.default_rng(0)
    x0s, bounds = [], []
    for i in range(args.batch):
        ang = rng.uniform(-np.pi, np.pi)
        start = rng.uniform(-3.5, -1.5, size=2)
        goal = np.clip(start + 2.5 * np.array([np.cos(ang), np.sin(ang)]),
                       -4, 4)
        yaw = np.arctan2(goal[1] - start[1], goal[0] - start[0])
        t = np.linspace(0, 1, 16)[:, None]
        p = np.concatenate([(1 - t) * start + t * goal,
                            np.full((16, 1), yaw)], axis=1)
        xi, bi = manager.init_guess_fixed(p, cfg.manager, 10, 20)
        x0s.append(xi)
        bounds.append(bi)
    xs = jnp.asarray(np.stack(x0s), jnp.float32)
    bs = jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                      *bounds)

    base_rate = None
    n = 1
    while n <= n_max:
        mesh = pmesh.make_mesh(devices[:n])
        run = pmesh.plan_batch_shard_map(
            mesh, shape, grid, cfg.alm,
            lbfgs_overrides={"mem_size": 8, "max_iterations": 250})
        res, (n_conv, _) = run(xs, bs)
        jax.block_until_ready(res)
        t0 = time.time()
        res, (n_conv, _) = run(xs, bs)
        jax.block_until_ready(res)
        dt = time.time() - t0
        rate = args.batch / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(f"devices={n} solves/s={rate:.1f} "
              f"efficiency={eff * 100:.1f}% converged={int(n_conv)}"
              f"/{args.batch}")
        n *= 2


if __name__ == "__main__":
    main()
