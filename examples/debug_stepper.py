"""Optimization debug stepper — the reference `in_debug` analog.

The reference publishes the intermediate trajectory after every L-BFGS
iteration with a 20 ms sleep so RViz can animate the solve (reference:
src/uneven_planner/back_end/src/alm_traj_opt.cpp:993-1017).  Here the
batched-solver equivalent records every evaluation's iterate and dumps a
CSV of sampled intermediate trajectories for plotting.

Usage: python examples/debug_stepper.py [out.csv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.minco import traj as mtraj
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain import grid as tgrid
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

    cfg = scene_config("hill")
    grid = tgrid.with_pair_table(
        make_synthetic_grid(cfg.map, dtype=np.float32))
    t = np.linspace(0, 1, 16)[:, None]
    path = np.concatenate(
        [(1 - t) * np.array([-3.0, -3.0]) + t * np.array([-0.5, -1.0]),
         np.full((16, 1), np.arctan2(2.0, 2.5))], axis=1)
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
    x0, bound = manager.init_guess_fixed(path, cfg.manager, 10, 20)
    x0 = jnp.asarray(x0, jnp.float32)
    bound = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), bound)

    rec = jax.jit(lambda x0, bound, grid: alm.debug_iterates(
        x0, bound, shape, grid, cfg.alm, max_evals=192,
        lbfgs_overrides={"mem_size": 16, "max_iterations": 30}))(
        x0, bound, grid)
    rec = jax.tree.map(np.asarray, rec)
    n_valid = int(rec["valid"].sum())
    print(f"recorded {n_valid} evaluations "
          f"(outer rounds: {rec['outer'][rec['valid']].max() + 1})")

    # sample each 8th iterate's xy trajectory at 40 points
    out = sys.argv[1] if len(sys.argv) > 1 else "debug_iterates.csv"
    rows = []
    u = np.linspace(0.0, 1.0, 40)
    for i in range(0, n_valid, 8):
        c_xy, ts_xy, c_yaw, ts_yaw, T = alm._coeffs(
            jnp.asarray(rec["x"][i]), bound, shape)
        tr = mtraj.SE2Traj(c_xy=c_xy, ts_xy=ts_xy, c_yaw=c_yaw,
                           ts_yaw=ts_yaw)
        for uu in u:
            p = np.asarray(mtraj.se2_pos(tr, jnp.asarray(uu * float(T))))
            rows.append((i, float(rec["f"][i]), uu * float(T),
                         p[0], p[1], p[2]))
    with open(out, "w") as f:
        f.write("eval,fval,t,x,y,yaw\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
