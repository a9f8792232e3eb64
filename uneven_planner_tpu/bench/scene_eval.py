"""Per-scene evaluation on the real reference maps at full resolution.

For each reference scene PCD (desert / forest / mountain / vocano, built at
the reference's 0.05 m / 0.1 rad resolution — run_hill.yaml:3-10), samples
free-space start/goal scenarios and runs the full plan->optimize->track
pipeline batched on device, reporting per scene:

  - terrain-map construction wall time + plane fits/s (BASELINE config 4;
    uneven_map.cpp:317-398) when the map is built fresh (cache miss),
  - frontend success rate (batched kinodynamic init vs occupancy),
  - ALM convergence rate + the reference's 6-metric post-solve report
    (max |vx|, |ax|, |ay|, |kappa|, min cos_xi, max sigma —
    ALMTrajOpt::getMaxVxAxAyCurAttSig, alm_traj_opt.h:170-229) on
    converged lanes,
  - closed-loop mean/final tracking error (ideal plant).

This is the committed-evidence harness for the reference's per-scene
acceptance flow (plan_manager.cpp:141-148 prints the same metrics after
every solve; here they become a recorded artifact).

Usage: python -m uneven_planner_tpu.bench.scene_eval
         [--scenes desert forest ...] [--batch 64] [--out SCENES.json]
Writes one JSON object per scene (and an aggregate) to --out and stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def sample_free_scenarios(occ_xy: np.ndarray, map_cfg, B: int, rng,
                          d_min: float = 1.5, d_max: float = 3.0,
                          margin_cells: int = 2,
                          border_margin: float = 0.8):
    """Rejection-sample B (start, goal) SE(2) pairs whose endpoints are
    free in the 2D occupancy projection (the reference aborts on occupied
    start/goal, kino_astar.cpp:86-95).  Yaw faces the goal, matching the
    manager's tangential init (plan_manager.cpp:86-94).  The endpoint keep-
    out from the map border is derived from the map geometry
    (origin + shape * resolution), not hardcoded."""
    nx, ny = occ_xy.shape
    res = map_cfg.xy_resolution
    ox, oy, _ = map_cfg.map_origin
    lo = np.array([ox + border_margin, oy + border_margin])
    hi = np.array([ox + nx * res - border_margin,
                   oy + ny * res - border_margin])
    # erode the free mask so endpoints keep a margin from obstacles;
    # relax the margin if a strict scene (forest: max_rho=0.001) leaves
    # too little eroded free space
    free = ~occ_xy
    for m in range(margin_cells, -1, -1):
        er = free.copy()
        for _ in range(m):
            f = er.copy()
            f[1:, :] &= er[:-1, :]
            f[:-1, :] &= er[1:, :]
            f[:, 1:] &= er[:, :-1]
            f[:, :-1] &= er[:, 1:]
            er = f
        if er.sum() >= max(64, 4 * B):
            break
    free = er
    # connected-component labels: start and goal must share a free-space
    # component, else the scenario is unplannable by construction (vocano's
    # crater rim separates regions; the reference operator only ever clicks
    # reachable goals).  4-connectivity matches the planner's cell steps.
    from scipy import ndimage
    labels, _ = ndimage.label(free)
    ii, jj = np.nonzero(free)
    if ii.size < 2:
        raise RuntimeError("no free space to sample scenarios from")
    xs = ox + (ii + 0.5) * res
    ys = oy + (jj + 0.5) * res
    pts = np.stack([xs, ys], axis=1)
    comp = labels[ii, jj]
    # keep away from the map border so the planner has room
    inner = ((pts > lo) & (pts < hi)).all(axis=1)
    if inner.sum() >= 2:
        pts = pts[inner]
        comp = comp[inner]

    starts, goals = [], []
    attempts = 0
    while len(starts) < B:
        attempts += 1
        if attempts > 200000:
            raise RuntimeError(
                f"scenario sampling stalled at {len(starts)}/{B}")
        if attempts % 20000 == 0:
            d_min = max(0.5, 0.8 * d_min)  # relax on cluttered scenes
        k = rng.integers(len(pts))
        a = pts[k]
        ang = rng.uniform(-np.pi, np.pi)
        d = rng.uniform(d_min, d_max)
        g = a + d * np.array([np.cos(ang), np.sin(ang)])
        gi = int((g[0] - ox) / res)
        gj = int((g[1] - oy) / res)
        if not (0 <= gi < nx and 0 <= gj < ny) or not free[gi, gj]:
            continue
        if labels[gi, gj] != comp[k]:
            continue
        if (g < lo).any() or (g > hi).any():
            continue
        yaw = np.arctan2(g[1] - a[1], g[0] - a[0])
        starts.append([a[0], a[1], yaw])
        goals.append([g[0], g[1], yaw])
    return (np.asarray(starts, np.float32), np.asarray(goals, np.float32))


def run_scene(name: str, B: int = 64, cache_dir: str = "data",
              n_track_steps: int = 500, seed: int = 0,
              lbfgs_overrides: dict | None = None):
    import jax
    import jax.numpy as jnp

    from uneven_planner_tpu import api
    from uneven_planner_tpu.minco.traj import max_metrics
    from uneven_planner_tpu.parallel import pipeline
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain import grid as tgrid

    ovr = lbfgs_overrides or {"mem_size": 16, "max_iterations": 250}
    cached = name == "hill" or os.path.exists(
        os.path.join(cache_dir, f"{name}.npz"))
    t_map = time.time()
    scfg, grid = api.load_or_build_scene(name, cache_dir=cache_dir)
    map_build_s = time.time() - t_map
    nx, ny, nyaw = grid.voxel_num
    n_fits = nx * ny * nyaw * scfg.map.iter_num
    grid = tgrid.with_pair_table(grid)
    rng = np.random.default_rng(seed)
    starts, goals = sample_free_scenarios(
        np.asarray(grid.occ_xy), scfg.map, B, rng)
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)

    # two-phase orchestrator (jitted plan+solve, host-chunked tracking):
    # the fused vmapped rollout crashes this TPU's worker at batch x ticks
    # beyond ~(8 x 50) — see sim/rollout.track_trajectory_batched
    run = lambda g, s, go: pipeline.plan_track_batch_chunked(
        g, scfg, s, go, shape,
        n_track_steps=n_track_steps, lbfgs_overrides=ovr)
    metrics_fn = jax.jit(lambda g, tr: jax.vmap(
        lambda t: max_metrics(t, g, num_samples=1024))(tr))

    t0 = time.time()
    res = run(grid, jnp.asarray(starts), jnp.asarray(goals))
    # np.array (copy): np.asarray of a device array is read-only, and the
    # retry pass writes recovered lanes in place
    res = jax.tree.map(lambda a: np.array(a), res)
    wall = time.time() - t0

    a = scfg.alm
    # Acceptance follows the reference exit flow: ALMTrajOpt publishes the
    # trajectory when the outer loop ends, converged OR at the iteration
    # cap with a small residual (alm_traj_opt.cpp:265-278; the reference
    # manager publishes unconditionally, plan_manager.cpp:134-138 — the
    # residual window here is a HARNESS acceptance choice stricter than
    # publish-always).  On forest (rho_T=500, max_sig=1e-3, scaling off)
    # the cap exit is the NORMAL outcome with res_g ~ 0.01-0.02.
    # Residuals come from the SAME pipeline solve whose trajectories were
    # tracked (round-5 fix; previously a separate re-solve could misalign).
    def _accept(r):
        return (r.res_h < 5e-3) & (r.res_g < 0.05)

    accepted = _accept(res)
    ok = res.plan_success & accepted

    # --- one retry pass for failed lanes (round-5, VERDICT r4 #8): longer
    # init time (easier dynamic feasibility) + a deeper frontend search;
    # the same lever a practitioner would pull after a failed replan
    n_retry = 0
    retried_ok = 0
    fail = np.nonzero(~ok)[0]
    if fail.size:
        import dataclasses as _dc
        scfg_r = _dc.replace(
            scfg,
            manager=_dc.replace(scfg.manager,
                                init_time_times=scfg.manager.init_time_times
                                * 1.5),
            alm=_dc.replace(scfg.alm,
                            max_iter=int(scfg.alm.max_iter * 2.5),
                            # relax the time-minimization weight for the
                            # retry: rho_T is a tuning objective, not a
                            # feasibility gate (forest's rho_T=500 forces
                            # short T, which is what strands the failing
                            # lanes' non-holonomy residuals); the res_h /
                            # res_g acceptance windows still apply
                            rho_T=scfg.alm.rho_T * 0.1),
            frontend=_dc.replace(scfg.frontend,
                                 max_rounds=scfg.frontend.max_rounds * 2))
        width = 8
        while width < fail.size:
            width *= 2
        pad = np.concatenate([fail, np.full(width - fail.size, fail[0])])
        rrun = lambda g, s, go: pipeline.plan_track_batch_chunked(
            g, scfg_r, s, go, shape,
            n_track_steps=n_track_steps, lbfgs_overrides=ovr)
        rres = jax.tree.map(lambda a: np.array(a), rrun(
            grid, jnp.asarray(starts[pad]), jnp.asarray(goals[pad])))
        r_ok = (rres.plan_success & _accept(rres))[:fail.size]
        n_retry = int(fail.size)
        retried_ok = int(r_ok.sum())
        # merge recovered lanes into the per-lane arrays
        rec = fail[r_ok]
        sel = np.nonzero(r_ok)[0]
        for field in ("plan_success", "alm_converged", "res_h", "res_g",
                      "non_hol", "mean_track_err", "final_track_err"):
            full = getattr(res, field)
            part = getattr(rres, field)
            full[rec] = part[sel]
        jax.tree.map(lambda full, part: full.__setitem__(rec, part[sel]),
                     res.traj, rres.traj)
        accepted = _accept(res)
        ok = res.plan_success & accepted

    # failure attribution (post-retry): frontend vs ALM vs tracking; a
    # non-finite tracking error is a FAILURE (excluded from ok so the
    # success rate and the mean-error artifact stay finite/consistent)
    fe_fail = ~res.plan_success
    alm_fail = res.plan_success & ~accepted
    trk_bad = ok & ~np.isfinite(res.mean_track_err)
    ok = ok & ~trk_bad

    # kinodynamic feasibility oracle: the exact-reference-semantics C++ A*
    # (native/, kino_astar.cpp:67-236 twin).  Blind-sampled scenarios can
    # be genuinely unreachable under the curvature/occupancy constraints
    # (measured: on vocano the oracle fails the SAME lanes the batched
    # search fails, at 2x search depth too) — the reference would abort on
    # them as well, so per-lane quality is reported on the feasible subset
    # alongside the raw blind rates.
    feasible = None
    try:
        from uneven_planner_tpu.utils import native
        if native.ensure_built():
            feasible = np.array([
                native.kino_astar_plan(grid, scfg.frontend, starts[i],
                                       goals[i]) is not None
                for i in range(B)])
    except Exception:
        feasible = None

    # 6-metric report on the TRACKED trajectories (the pipeline's own)
    mm = jax.tree.map(np.asarray, metrics_fn(
        grid, jax.tree.map(jnp.asarray, res.traj)))
    conv = res.alm_converged
    res_h = res.res_h
    res_g = res.res_g

    def _agg(key, lo=False):
        vals = mm[key][conv]
        if vals.size == 0:
            return None
        return float(vals.min() if lo else vals.max())

    report = {
        "scene": name,
        "batch": B,
        "map_cells": [int(nx), int(ny), int(nyaw)],
        "map_cached": bool(cached),
        "map_build_s": round(map_build_s, 2),
        "map_fits_per_sec": (round(n_fits / map_build_s, 1)
                             if not cached else None),
        "wall_s": round(wall, 2),
        "frontend_success_rate": float(res.plan_success.mean()),
        "alm_convergence_rate": float(conv.mean()),
        "alm_accepted_rate": float(accepted.mean()),
        "accept_criterion": ("res_h<5e-3 & res_g<0.05 — harness acceptance "
                             "window on the cap-exit flow "
                             "(alm_traj_opt.cpp:265-278); stricter than the "
                             "reference manager, which publishes "
                             "unconditionally (plan_manager.cpp:134-138)"),
        "failure_breakdown": {
            "frontend": int(fe_fail.sum()),
            "alm_residual": int(alm_fail.sum()),
            "tracking_nonfinite": int(trk_bad.sum()),
        },
        "retried_lanes": n_retry,
        "retry_recovered": retried_ok,
        "oracle_feasible_rate": (float(feasible.mean())
                                 if feasible is not None else None),
        "frontend_success_on_feasible": (
            float(res.plan_success[feasible].mean())
            if feasible is not None and feasible.any() else None),
        "pipeline_success_on_feasible": (
            float(ok[feasible].mean())
            if feasible is not None and feasible.any() else None),
        "res_h_p95": float(np.percentile(res_h, 95)),
        "res_g_p95": float(np.percentile(res_g, 95)),
        "pipeline_success_rate": float(ok.mean()),
        "mean_track_err_m": float(res.mean_track_err[ok].mean())
        if ok.any() else None,
        "final_track_err_m": float(res.final_track_err[ok].mean())
        if ok.any() else None,
        "max_non_hol": float(np.abs(res.non_hol[ok]).max())
        if ok.any() else None,
        # worst-case constraint report over converged lanes vs bounds
        "metrics": {
            "max_vx": _agg("max_vx"), "bound_vx": a.max_vel,
            "max_ax": _agg("max_ax"), "bound_ax": a.max_acc_lon,
            "max_ay": _agg("max_ay"), "bound_ay": a.max_acc_lat,
            "max_kap": _agg("max_cur"), "bound_kap": a.max_kap,
            "min_cxi": _agg("min_cxi", lo=True), "bound_cxi": a.min_cxi,
            "max_sig": _agg("max_sig"), "bound_sig": a.max_sig,
        },
    }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+",
                    default=["desert", "forest", "mountain", "vocano"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--track-steps", type=int, default=500)
    ap.add_argument("--cache-dir", default="data")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    reports = []
    for scene in args.scenes:
        rep = run_scene(scene, B=args.batch, cache_dir=args.cache_dir,
                        n_track_steps=args.track_steps)
        print(json.dumps(rep), flush=True)
        reports.append(rep)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"scenes": reports}, f, indent=1)


if __name__ == "__main__":
    main()
