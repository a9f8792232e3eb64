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
    T = cfg.predict_steps
    d = max(cfg.delay_num, 1)

    class S(NamedTuple):
        state: jax.Array
        act: jax.Array
        output: jax.Array
        buff: jax.Array
        t: jax.Array

    def step(s: S, _):
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
        return (S(state=state, act=act, output=res.output,
                  buff=res.output_buff, t=s.t + ctrl_dt),
                (s.state, cmd, err, at_goal))

    dtype = start_state.dtype
    init = S(state=start_state,
             act=jnp.zeros((2,), dtype),
             output=jnp.zeros((2, T), dtype),
             buff=jnp.zeros((d, 2), dtype),
             t=jnp.zeros((), dtype))
    _, (states, cmds, errs, at_goal) = jax.lax.scan(
        step, init, None, length=n_steps)
    pre_goal = ~at_goal
    mean_err = jnp.sum(errs * pre_goal) / jnp.maximum(jnp.sum(pre_goal), 1)
    return TrackResult(states=states, cmds=cmds, errs=errs, at_goal=at_goal,
                       mean_err=mean_err)
