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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all available)")
    ap.add_argument("--batch", type=int, default=64,
                    help="total scenario batch (divisible by device counts)")
    ap.add_argument("--platform", default=None,
                    help="jax platform to use (e.g. cpu, tpu)")
    args = ap.parse_args()

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
