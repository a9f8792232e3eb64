"""Fused plan -> optimize -> track pipeline.

The end-to-end product (BASELINE config 5 shape): front-end batched search,
MINCO PHR-ALM optimization, wire-format round trip, and closed-loop MPC
tracking in the batched simulator — one jitted program per scenario, vmapped
over the scenario batch and shardable over a device mesh.  This replaces the
reference's ROS node graph (goal callback -> plan_manager -> traj topic ->
mpc node -> cmd topic -> Gazebo, SURVEY.md §3.2-3.4) with a single pure
function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uneven_planner_tpu import manager
from uneven_planner_tpu.config import SceneConfig
from uneven_planner_tpu.frontend import kino_init
from uneven_planner_tpu.minco.traj import max_metrics, non_hol_error
from uneven_planner_tpu.mpc import traj_msg
from uneven_planner_tpu.sim import rollout
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain import grid as tgrid


class PipelineResult(NamedTuple):
    plan_success: jax.Array
    alm_converged: jax.Array
    outer_iters: jax.Array
    inner_iters: jax.Array
    non_hol: jax.Array
    mean_track_err: jax.Array
    final_track_err: jax.Array
    # final scaled ALM residuals of the SAME solve whose trajectory was
    # tracked (round-5: acceptance gates must not come from a separate
    # re-solve that can diverge numerically from the tracked program)
    res_h: jax.Array = None
    res_g: jax.Array = None
    # the tracked trajectories (post wire round-trip) for metric reports
    traj: "SE2Traj | None" = None


def plan_track_scenario(grid: tgrid.TerrainGrid, scfg: SceneConfig,
                        start, goal, shape: alm.ProblemShape,
                        n_track_steps: int = 500,
                        lbfgs_overrides=None,
                        max_sqp_iter: int = 3,
                        metric_samples: int = 1024,
                        plant_params=None) -> PipelineResult:
    """One full scenario: search -> optimize -> message round trip ->
    closed-loop tracking.  vmap over (start, goal) for batches.

    `max_sqp_iter` bounds the MPC relinearization loop (the reference
    relinearizes until du < du_th or a 10 ms wall budget, up to 150
    iterations, mpc.cpp:797-841; mpc_step's while_loop applies the same
    du_th exit so extra iterations only cost when they help).
    `plant_params` switches the tracking plant to the slip/actuator-lag
    model (sim.rollout.PlantParams)."""
    kres = kino_init.plan(grid, scfg.frontend, start, goal)

    x0, bound = manager.init_guess_fixed_jax(
        kres.path, kres.path_mask, scfg.manager,
        shape.piece_xy, shape.piece_yaw)
    ares = alm.solve_flat(x0, bound, shape, grid, scfg.alm,
                     lbfgs_overrides=lbfgs_overrides)

    # wire-format round trip: the tracker reconstructs the polynomial from
    # waypoints + times exactly as the reference controller does
    msg = traj_msg.msg_from_traj(ares.traj)
    traj = traj_msg.traj_from_msg(msg)

    start_state = jnp.stack([start[0], start[1], start[2]])
    tres = rollout.track_trajectory(traj, start_state, scfg.mpc,
                                    n_steps=n_track_steps,
                                    max_sqp_iter=max_sqp_iter,
                                    plant_params=plant_params)

    nh = non_hol_error(ares.traj, num_samples=metric_samples)
    return PipelineResult(
        plan_success=kres.success,
        alm_converged=ares.converged,
        outer_iters=ares.outer_iters,
        inner_iters=ares.inner_iters,
        non_hol=nh,
        mean_track_err=tres.mean_err,
        final_track_err=tres.errs[-1],
        res_h=ares.res_h, res_g=ares.res_g, traj=traj)


def plan_track_batch(grid, scfg, starts, goals, shape,
                     **kwargs):
    return jax.vmap(lambda s, g: plan_track_scenario(
        grid, scfg, s, g, shape, **kwargs))(starts, goals)


# ---------------------------------------------------------------------------
# Two-phase orchestrator (the TPU production path)
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _plan_phase_fn(scfg: SceneConfig, shape: alm.ProblemShape,
                   overrides_key, metric_samples: int):
    """Memoized jitted phase 1: search -> optimize -> wire round trip.
    (Process-lifetime cache: re-creating jits per call re-traces the whole
    program — seconds of host time, see alm._compacted_fns.)"""
    overrides = dict(overrides_key) if overrides_key else None

    def one(grid, start, goal):
        kres = kino_init.plan(grid, scfg.frontend, start, goal)
        x0, bound = manager.init_guess_fixed_jax(
            kres.path, kres.path_mask, scfg.manager,
            shape.piece_xy, shape.piece_yaw)
        ares = alm.solve_flat(x0, bound, shape, grid, scfg.alm,
                              lbfgs_overrides=overrides)
        msg = traj_msg.msg_from_traj(ares.traj)
        traj = traj_msg.traj_from_msg(msg)
        nh = non_hol_error(ares.traj, num_samples=metric_samples)
        return (kres.success, ares.converged, ares.outer_iters,
                ares.inner_iters, nh, ares.res_h, ares.res_g, traj)

    return jax.jit(lambda g, ss, gg: jax.vmap(
        lambda s_, g_: one(g, s_, g_))(ss, gg))


def plan_track_batch_chunked(grid, scfg: SceneConfig, starts, goals,
                             shape: alm.ProblemShape,
                             n_track_steps: int = 500,
                             lbfgs_overrides=None,
                             max_sqp_iter: int = 3,
                             metric_samples: int = 1024,
                             plant_params=None,
                             chunk_ticks: int = 25) -> PipelineResult:
    """`plan_track_batch` split into (jitted plan+optimize) followed by the
    host-chunked closed-loop tracking — the TPU production path: on this
    platform the single-program vmapped rollout miscompiles past ~(8 x 50)
    (batch x ticks) and crashes the TPU worker (see
    sim/rollout.track_trajectory_batched).  Results match the fused path
    (same per-tick math; only the dispatch granularity differs)."""
    key = (tuple(sorted(lbfgs_overrides.items()))
           if lbfgs_overrides else None)
    pf = _plan_phase_fn(scfg, shape, key, metric_samples)
    succ, conv, oi, ii, nh, rh, rg, traj = pf(grid, starts, goals)
    tres = rollout.track_trajectory_batched(
        traj, starts, scfg.mpc, n_track_steps, max_sqp_iter=max_sqp_iter,
        plant_params=plant_params, chunk_ticks=chunk_ticks,
        traj_batched=True)
    return PipelineResult(plan_success=succ, alm_converged=conv,
                          outer_iters=oi, inner_iters=ii, non_hol=nh,
                          mean_track_err=tres.mean_err,
                          final_track_err=tres.errs[:, -1],
                          res_h=rh, res_g=rg, traj=traj)
