"""Compact trajectory wire format + controller-side reconstruction.

The reference planner publishes trajectories as waypoints + piece times
(mpc_controller/msg/SE2Traj.msg:1-9, packed in plan_manager.cpp:150-185) and
the controller *re-solves* the MINCO system from that compact message to
recover the exact polynomial (TrajAnalyzer::setTraj(msg),
mpc_controller/include/utils/traj_anal.hpp:125-181, using the duplicated
MINCO implementation in utils/minco_traj.hpp — collapsed here into the one
shared uneven_planner_tpu.minco module).

Also provides the figure-eight test trajectory of the controller's
standalone test mode (setTestTraj, traj_anal.hpp:447-483).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.minco.traj import SE2Traj


class SE2TrajMsg(NamedTuple):
    """Wire format (SE2Traj.msg): piece-start waypoints + goal, durations,
    boundary velocity/acceleration."""
    pos_pts: jax.Array    # [Nxy+1, 2]
    pos_ts: jax.Array     # [Nxy]
    angle_pts: jax.Array  # [Nyaw+1, 1]
    angle_ts: jax.Array   # [Nyaw]
    init_v: jax.Array     # [2]
    init_a: jax.Array     # [2]


def msg_from_traj(traj: SE2Traj) -> SE2TrajMsg:
    """Pack a trajectory (plan_manager.cpp:150-185; note the reference
    zeroes init_v/init_a in the message)."""
    starts_xy = jax.vmap(lambda c: minco.eval_piece(c, jnp.asarray(
        0.0, traj.ts_xy.dtype))[0])(traj.c_xy)
    end_xy = minco.eval_piece(traj.c_xy[-1], traj.ts_xy[-1])[0]
    starts_yaw = jax.vmap(lambda c: minco.eval_piece(c, jnp.asarray(
        0.0, traj.ts_yaw.dtype))[0])(traj.c_yaw)
    end_yaw = minco.eval_piece(traj.c_yaw[-1], traj.ts_yaw[-1])[0]
    return SE2TrajMsg(
        pos_pts=jnp.concatenate([starts_xy, end_xy[None]], axis=0),
        pos_ts=traj.ts_xy,
        angle_pts=jnp.concatenate([starts_yaw, end_yaw[None]], axis=0),
        angle_ts=traj.ts_yaw,
        init_v=jnp.zeros(2, traj.ts_xy.dtype),
        init_a=jnp.zeros(2, traj.ts_xy.dtype))


def traj_from_msg(msg: SE2TrajMsg) -> SE2Traj:
    """Re-solve MINCO through the waypoints (setTraj, traj_anal.hpp:125-181:
    head = (wp0, init_v, init_a), tail = (wpN, 0, 0))."""
    dtype = msg.pos_ts.dtype
    head_xy = jnp.stack([msg.pos_pts[0], msg.init_v, msg.init_a])
    tail_xy = jnp.stack([msg.pos_pts[-1], jnp.zeros(2, dtype),
                         jnp.zeros(2, dtype)])
    c_xy = minco.generate(msg.pos_pts[1:-1], msg.pos_ts, head_xy, tail_xy)
    head_yaw = jnp.stack([msg.angle_pts[0], jnp.zeros(1, dtype),
                          jnp.zeros(1, dtype)])
    tail_yaw = jnp.stack([msg.angle_pts[-1], jnp.zeros(1, dtype),
                          jnp.zeros(1, dtype)])
    c_yaw = minco.generate(msg.angle_pts[1:-1], msg.angle_ts, head_yaw,
                           tail_yaw)
    return SE2Traj(c_xy=c_xy, ts_xy=msg.pos_ts, c_yaw=c_yaw,
                   ts_yaw=msg.angle_ts)


def figure_eight(max_vel: float, n_pieces: int = 16,
                 radius: float = 1.2, dtype=jnp.float64) -> SE2Traj:
    """Hardcoded figure-eight test trajectory for isolating the controller
    (setTestTraj, traj_anal.hpp:447-483)."""
    length = 2 * (2 * math.pi * radius)
    total_t = length / max_vel
    ts = np.linspace(0.0, 1.0, n_pieces + 1)
    ang = 2 * math.pi * ts
    x = radius * np.sin(2 * np.pi * ts)
    y = radius * np.sin(2 * np.pi * ts) * np.cos(2 * np.pi * ts)
    dx = np.gradient(x, ts)
    dy = np.gradient(y, ts)
    yaw = np.unwrap(np.arctan2(dy, dx))

    piece_t = jnp.full((n_pieces,), total_t / n_pieces, dtype)
    head_xy = jnp.asarray([[x[0], y[0]],
                           [dx[0] / total_t, dy[0] / total_t],
                           [0.0, 0.0]], dtype)
    tail_xy = jnp.asarray([[x[-1], y[-1]],
                           [dx[-1] / total_t, dy[-1] / total_t],
                           [0.0, 0.0]], dtype)
    inner_xy = jnp.asarray(np.stack([x[1:-1], y[1:-1]], axis=1), dtype)
    c_xy = minco.generate(inner_xy, piece_t, head_xy, tail_xy)
    head_yaw = jnp.asarray([[yaw[0]], [0.0], [0.0]], dtype)
    tail_yaw = jnp.asarray([[yaw[-1]], [0.0], [0.0]], dtype)
    c_yaw = minco.generate(jnp.asarray(yaw[1:-1, None], dtype), piece_t,
                           head_yaw, tail_yaw)
    return SE2Traj(c_xy=c_xy, ts_xy=piece_t, c_yaw=c_yaw, ts_yaw=piece_t)
