"""End-to-end planning demo: the textual equivalent of the reference's
"click a goal in RViz" flow (hill.sh -> plan_manager -> back end report).

Builds (or loads) a terrain map, runs search + trajectory optimization +
closed-loop tracking for one start/goal pair, and prints the same post-solve
report the reference prints after every solve (plan_manager.cpp:142-148),
then writes the planned SE(3) poses to a CSV for visualization.

Usage:
  python examples/plan_demo.py [--scene hill] [--start -3 -3 0]
                               [--goal 0 -3 0] [--out traj.csv]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="hill")
    ap.add_argument("--start", nargs=3, type=float, default=[-3.0, -3.0, 0.0])
    ap.add_argument("--goal", nargs=3, type=float, default=[0.0, -3.0, 0.0])
    ap.add_argument("--out", default=None, help="CSV of planned SE(3) poses")
    ap.add_argument("--track", action="store_true",
                    help="also run closed-loop MPC tracking")
    ap.add_argument("--cache-dir", default="data")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.frontend import kino_init
    from uneven_planner_tpu.minco.traj import (max_metrics, non_hol_error,
                                               sample_dense)
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain import build, grid as tgrid, io
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

    scfg = scene_config(args.scene)

    # ---- map (with npz cache, the reference's .map-cache behavior)
    os.makedirs(args.cache_dir, exist_ok=True)
    cache = os.path.join(args.cache_dir, f"{args.scene}.npz")
    t0 = time.time()
    if args.scene == "hill":
        grid = make_synthetic_grid(scfg.map, dtype=np.float32)
        print(f"[map] synthetic hill grid in {time.time()-t0:.1f}s")
    elif os.path.exists(cache):
        data = io.load_map_npz(cache)
        grid = tgrid.from_buffers(
            jnp.asarray(data, jnp.float32), scfg.map.min_cnormal,
            scfg.map.max_rho, scfg.map.xy_resolution,
            scfg.map.yaw_resolution, scfg.map.map_origin, scfg.map.gravity)
        print(f"[map] loaded cache {cache} in {time.time()-t0:.1f}s")
    else:
        cloud = io.load_scene_cloud(args.scene)
        print(f"[map] cloud: {len(cloud)} pts; constructing "
              f"{scfg.map.voxel_num} grid...")
        grid = build.construct_map(cloud, scfg.map)
        io.save_map_npz(cache, np.asarray(grid.data))
        print(f"[map] constructed + cached in {time.time()-t0:.1f}s")
    grid = jax.device_put(grid)

    start = jnp.asarray(args.start, jnp.float32)
    goal = jnp.asarray(args.goal, jnp.float32)

    # ---- front end
    t0 = time.time()
    kres = jax.jit(lambda s, g, gr: kino_init.plan(gr, scfg.frontend, s, g))(
        start, goal, grid)
    print(f"[front end] success={bool(kres.success)} "
          f"rounds={int(kres.rounds)} cost={float(kres.cost):.3f} "
          f"({(time.time()-t0):.1f}s incl. compile)")
    if not bool(kres.success):
        return 1

    # ---- back end
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
    x0, bound = manager.init_guess_fixed_jax(
        kres.path, kres.path_mask, scfg.manager, shape.piece_xy,
        shape.piece_yaw)
    t0 = time.time()
    res = jax.jit(lambda x, b, gr: alm.solve(
        x, b, shape, gr, scfg.alm,
        lbfgs_overrides={"mem_size": 8, "max_iterations": 250}))(
        x0, bound, grid)
    print(f"[back end] converged={bool(res.converged)} "
          f"outer={int(res.outer_iters)} inner={int(res.inner_iters)} "
          f"({(time.time()-t0):.1f}s incl. compile)")

    # ---- post-solve report (plan_manager.cpp:142-148)
    m = jax.jit(lambda tr, gr: max_metrics(tr, gr, 2048))(res.traj, grid)
    nh = float(jax.jit(lambda tr: non_hol_error(tr, 2048))(res.traj))
    print(f"equal error: {nh:.6f}")
    print(f"max vx rate: {float(m['max_vx']):.4f} (limit {scfg.alm.max_vel})")
    print(f"max ax rate: {float(m['max_ax']):.4f} "
          f"(limit {scfg.alm.max_acc_lon})")
    print(f"max ay rate: {float(m['max_ay']):.4f} "
          f"(limit {scfg.alm.max_acc_lat})")
    print(f"max cur:     {float(m['max_cur']):.4f} (limit {scfg.alm.max_kap})")
    print(f"min cosxi:   {float(m['min_cxi']):.4f} (limit {scfg.alm.min_cxi})")
    print(f"max sigma:   {float(m['max_sig']):.5f} (limit {scfg.alm.max_sig})")

    # ---- tracking (optional)
    if args.track:
        from uneven_planner_tpu.mpc import traj_msg
        from uneven_planner_tpu.sim import rollout
        msg = traj_msg.msg_from_traj(res.traj)
        traj = traj_msg.traj_from_msg(msg)
        t0 = time.time()
        tres = jax.jit(lambda tr, s: rollout.track_trajectory(
            tr, s, scfg.mpc, n_steps=600, max_sqp_iter=1))(traj, start)
        print(f"[tracking] mean err={float(tres.mean_err)*100:.2f} cm "
              f"({(time.time()-t0):.1f}s incl. compile)")

    # ---- export SE(3) path
    if args.out:
        poses, mask = jax.jit(lambda tr: sample_dense(tr, 1024, 0.03))(
            res.traj)
        poses = np.asarray(poses)[np.asarray(mask)]
        rows = []
        for p in poses:
            R, p3 = tgrid.se3_lift(grid, jnp.asarray(p, jnp.float32))
            rows.append(list(np.asarray(p3)) + [float(p[2])])
        np.savetxt(args.out, np.asarray(rows), delimiter=",",
                   header="x,y,z,yaw", comments="")
        print(f"[export] {len(rows)} SE(3) poses -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
