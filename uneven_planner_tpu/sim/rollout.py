"""Batched closed-loop plant simulator.

TPU-native equivalent of the reference's Gazebo loop (reference: carsim
package — cmdvel2gazebo.py Ackermann wheel mapping + true_state_pub.py
odometry): the capability is a closed-loop plant for the tracker, so the
plant here is the kinematic bicycle/unicycle the wheel mapping realizes,
stepped in lockstep with the controller at the 100 Hz control rate
(mpc.cpp:50), with the actuation dead-man semantics (cmdvel2gazebo.py:80-94)
represented by a command-valid flag.  SE(3) state comes from the terrain
lift when a grid is provided (true_state_pub publishes the rear-axle pose on
the terrain).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from uneven_planner_tpu.config import MPCConfig
from uneven_planner_tpu.minco.traj import SE2Traj
from uneven_planner_tpu.mpc import tracker


def plant_step(state, cmd, cfg: MPCConfig, dt: float,
               cmd_valid=True):
    """Integrate the plant for dt under (v, omega-or-steer); dead-man zeroes
    velocity when the command is stale."""
    v = jnp.where(cmd_valid, cmd[0], 0.0)
    if cfg.model_type == tracker.DIFF:
        w = cmd[1]
    else:
        w = v / cfg.wheel_base * jnp.tan(cmd[1])
    return jnp.array([
        state[0] + v * jnp.cos(state[2]) * dt,
        state[1] + v * jnp.sin(state[2]) * dt,
        state[2] + w * dt,
    ])


class PlantParams(NamedTuple):
    """Non-ideal plant effects.  The reference README flags Gazebo wheel
    slip as the main tracking-accuracy limiter (reference README.md:86-89
    "the accuracy ... is not very high ... wheel slip" ); this models the
    same effects analytically so the tracker can be exercised against a
    plant that does NOT match its internal kinematic model:

      slip_lon  — fraction of commanded longitudinal speed lost to slip
      slip_lat  — lateral creep: v_lat = slip_lat * v * omega (understeer
                  drift proportional to centripetal demand)
      v_tau     — first-order actuator lag on v [s] (drive inertia)
      steer_tau — first-order lag on steer/omega [s] (servo inertia)

    All-zero parameters reduce exactly to the ideal kinematic plant.
    """
    slip_lon: float = 0.0
    slip_lat: float = 0.0
    v_tau: float = 0.0
    steer_tau: float = 0.0


def plant_step_physical(state, act, cmd, cfg: MPCConfig, dt: float,
                        params: PlantParams, cmd_valid=True):
    """`plant_step` with actuator lag + wheel slip.  `act` is the actuator
    state [v_act, u2_act]; returns (new_state, new_act)."""
    v_cmd = jnp.where(cmd_valid, cmd[0], 0.0)
    a_v = dt / (params.v_tau + dt)
    a_s = dt / (params.steer_tau + dt)
    v_act = act[0] + a_v * (v_cmd - act[0])
    u2_act = act[1] + a_s * (cmd[1] - act[1])

    v_eff = v_act * (1.0 - params.slip_lon)
    if cfg.model_type == tracker.DIFF:
        w = u2_act
    else:
        w = v_eff / cfg.wheel_base * jnp.tan(u2_act)
    v_lat = params.slip_lat * v_eff * w
    c, s = jnp.cos(state[2]), jnp.sin(state[2])
    new_state = jnp.array([
        state[0] + (v_eff * c - v_lat * s) * dt,
        state[1] + (v_eff * s + v_lat * c) * dt,
        state[2] + w * dt,
    ])
    return new_state, jnp.array([v_act, u2_act])


class TrackResult(NamedTuple):
    states: jax.Array      # [n_steps, 3] plant states
    cmds: jax.Array        # [n_steps, 2]
    errs: jax.Array        # [n_steps] tracking error vs ref point 0
    at_goal: jax.Array     # [n_steps] bool
    mean_err: jax.Array    # mean error over pre-goal steps


def track_trajectory(traj: SE2Traj, start_state, cfg: MPCConfig,
                     n_steps: int, ctrl_dt: float = 0.01,
                     max_sqp_iter: int = 3,
                     plant_params: Optional[PlantParams] = None
                     ) -> TrackResult:
    """Closed-loop tracking of one trajectory (the test_mpc / benchmark
    episode loop, mpc.cpp:122-192): per 10 ms tick sample the reference
    horizon, smooth yaw, run the MPC, apply the command to the plant.

    `plant_params` switches the plant to the slip/lag model
    (`plant_step_physical`) — the analytic analog of the reference's
    Gazebo wheel-slip realism."""
    dtype = start_state.dtype
    init = _roll_init(start_state, cfg, dtype)
    _, (states, cmds, errs, at_goal) = _track_chunk(
        traj, init, cfg, n_steps, ctrl_dt, max_sqp_iter, plant_params)
    pre_goal = ~at_goal
    mean_err = jnp.sum(errs * pre_goal) / jnp.maximum(jnp.sum(pre_goal), 1)
    return TrackResult(states=states, cmds=cmds, errs=errs, at_goal=at_goal,
                       mean_err=mean_err)


class _RollState(NamedTuple):
    state: jax.Array
    act: jax.Array
    output: jax.Array
    buff: jax.Array
    t: jax.Array


def _roll_init(start_state, cfg: MPCConfig, dtype) -> _RollState:
    T = cfg.predict_steps
    d = max(cfg.delay_num, 1)
    return _RollState(state=start_state,
                      act=jnp.zeros((2,), dtype),
                      output=jnp.zeros((2, T), dtype),
                      buff=jnp.zeros((d, 2), dtype),
                      t=jnp.zeros((), dtype))


def _track_chunk(traj: SE2Traj, init: _RollState, cfg: MPCConfig,
                 n_ticks: int, ctrl_dt: float, max_sqp_iter: int,
                 plant_params: Optional[PlantParams]):
    """Advance the closed loop by n_ticks; returns (carry, stacked outputs)
    — the scan core shared by the fused and the host-chunked rollouts."""

    def step(s: _RollState, _):
        refs, at_goal = tracker.get_ref_points(traj, s.t, cfg)
        err = jnp.linalg.norm(refs[:2, 0] - s.state[:2])
        refs = tracker.smooth_yaw(refs, s.state[2])
        res = tracker.mpc_step(s.state, refs,
                               jnp.zeros_like(refs[:2]), s.output, s.buff,
                               cfg, max_sqp_iter=max_sqp_iter)
        cmd = jnp.where(at_goal, jnp.zeros(2, s.state.dtype), res.cmd)
        if plant_params is None:
            state = plant_step(s.state, cmd, cfg, ctrl_dt)
            act = s.act
        else:
            state, act = plant_step_physical(s.state, s.act, cmd, cfg,
                                             ctrl_dt, plant_params)
        return (_RollState(state=state, act=act, output=res.output,
                           buff=res.output_buff, t=s.t + ctrl_dt),
                (s.state, cmd, err, at_goal))

    return jax.lax.scan(step, init, None, length=n_ticks)


import functools as _functools
import math as _math


@_functools.lru_cache(maxsize=None)
def _chunk_fn(cfg: MPCConfig, chunk: int, ctrl_dt: float,
              max_sqp_iter: int, plant_params: Optional[PlantParams],
              traj_batched: bool):
    def one(traj, s):
        return _track_chunk(traj, s, cfg, chunk, ctrl_dt, max_sqp_iter,
                            plant_params)
    return jax.jit(jax.vmap(one, in_axes=(0 if traj_batched else None, 0)))


def track_trajectory_batched(traj: SE2Traj, start_states, cfg: MPCConfig,
                             n_steps: int, ctrl_dt: float = 0.01,
                             max_sqp_iter: int = 3,
                             plant_params: Optional[PlantParams] = None,
                             chunk_ticks: int = 25,
                             traj_batched: bool = False) -> TrackResult:
    """Batched closed-loop tracking, dispatched in chunks of <= chunk_ticks
    control ticks; the loop carry stays on device between dispatches.

    This is the TPU production path.  It is NOT an optimization fallback:
    on this platform the single-program vmapped rollout miscompiles and
    crashes the TPU worker once (batch x ticks) grows past ~(8 x 50) —
    isolated in round 4 across loop constructs (while/scan), linalg
    custom-calls (removed), and compiled-HLO audits; a bounded-chunk
    program is the shape that provably executes.  ~n_steps/chunk_ticks
    dispatch latencies of host cost; all state stays on device.

    `traj_batched` selects per-lane trajectories ([B, ...] SE2Traj leaves,
    the pipeline case) vs one shared trajectory (the figure-eight bench).
    """
    B = start_states.shape[0]
    # joint (batch x chunk) safety envelope: the round-4 fault map with
    # the 150-var full QP crashed the worker past ~2048 lane-ticks; with
    # the round-5 condensed 60-var QP the envelope re-probe (e34) executes
    # (8x150), (256x25..128) and (512x64) — i.e. >=32k lane-ticks —
    # cleanly, so the cap sits at 8192 with 4x margin below the largest
    # verified product.  For B > 2048 the per-chunk tick count would fall
    # below a useful size, so split the batch into sub-batches instead
    # and keep >=4 ticks per dispatch.
    max_lane_ticks = 8192
    max_sub = max_lane_ticks // 4
    if B > max_sub:
        subs = [
            track_trajectory_batched(
                jax.tree.map(lambda a: a[i:i + max_sub], traj)
                if traj_batched else traj,
                start_states[i:i + max_sub], cfg, n_steps, ctrl_dt,
                max_sqp_iter, plant_params, chunk_ticks, traj_batched)
            for i in range(0, B, max_sub)]
        return TrackResult(*(jnp.concatenate(parts, axis=0)
                             for parts in zip(*subs)))
    chunk_ticks = max(1, min(chunk_ticks, max_lane_ticks // max(B, 1)))
    dtype = start_states.dtype
    T = cfg.predict_steps
    d = max(cfg.delay_num, 1)
    s = _RollState(state=start_states,
                   act=jnp.zeros((B, 2), dtype),
                   output=jnp.zeros((B, 2, T), dtype),
                   buff=jnp.zeros((B, d, 2), dtype),
                   t=jnp.zeros((B,), dtype))
    fn = _chunk_fn(cfg, chunk_ticks, ctrl_dt, max_sqp_iter, plant_params,
                   traj_batched)
    outs = []
    for _ in range(_math.ceil(n_steps / chunk_ticks)):
        s, out = fn(traj, s)
        outs.append(out)
    states, cmds, errs, at_goal = (
        jnp.concatenate([o[i] for o in outs], axis=1)[:, :n_steps]
        for i in range(4))
    pre_goal = ~at_goal
    mean_err = jnp.sum(errs * pre_goal, axis=1) \
        / jnp.maximum(jnp.sum(pre_goal, axis=1), 1)
    return TrackResult(states=states, cmds=cmds, errs=errs,
                       at_goal=at_goal, mean_err=mean_err)
