"""Ackermann wheel-level actuation mapping.

Batched re-design of the reference's cmdvel2gazebo node (reference:
src/carsim/scripts/cmdvel2gazebo.py): (v, steer) commands map to per-wheel
velocities and per-side steering angles from the inner/outer turning-radius
geometry, with the same velocity scale (linear.x / 0.05,
cmdvel2gazebo.py:69), ideal-middle-tire steer clamp derived from the
maximum inside-tire angle (:44-56), and the 0.2 s dead-man timeout (:40,
80-94).  Used by the simulator's wheel-level plant mode and exposed for
hardware bring-up parity.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

WHEEL_BASE = 0.26     # cmdvel2gazebo.py:30
TREAD_FRONT = 0.18    # :33
TREAD_REAR = 0.18     # :34
MAX_VEL = 1.5         # :37
VEL_SCALE = 0.05      # :69  (x = linear.x / 0.05)
MAX_STEER_INSIDE = 1.5  # :44
DEADMAN_TIMEOUT = 0.2   # :40


def max_ideal_steer() -> float:
    """Steer clamp for the ideal middle tire (cmdvel2gazebo.py:47-56)."""
    r_max = WHEEL_BASE / math.tan(MAX_STEER_INSIDE)
    r_ideal = r_max + TREAD_FRONT / 2.0
    return math.atan2(WHEEL_BASE, r_ideal)


class WheelCommand(NamedTuple):
    rear_left: jax.Array
    rear_right: jax.Array
    front_left: jax.Array
    front_right: jax.Array
    steer_left: jax.Array
    steer_right: jax.Array


def wheel_commands(v_cmd, steer_cmd, stale) -> WheelCommand:
    """Map a (linear.x, angular.z) command to the six wheel controllers
    (cmdvel2gazebo.py:74-155).  `stale` = dead-man tripped."""
    # (the reference clamps to maxvel before overwriting x — dead code,
    # cmdvel2gazebo.py:68-69; here the clamp is applied for real)
    x = jnp.minimum(v_cmd / VEL_SCALE, MAX_VEL)
    z = jnp.clip(steer_cmd, -max_ideal_steer(), max_ideal_steer())

    L = WHEEL_BASE
    sgn = jnp.sign(z)
    r = L / jnp.maximum(jnp.abs(jnp.tan(z)), 1e-9)
    rl_rear = r - sgn * TREAD_REAR / 2.0
    rr_rear = r + sgn * TREAD_REAR / 2.0
    rl_front = r - sgn * TREAD_FRONT / 2.0
    rr_front = r + sgn * TREAD_FRONT / 2.0

    turning = jnp.abs(z) > 0.0
    rear_l = jnp.where(turning, x * rl_rear / r, x)
    rear_r = jnp.where(turning, x * rr_rear / r, x)
    steer_l = jnp.where(turning, jnp.arctan2(L, rl_front) * sgn, z)
    steer_r = jnp.where(turning, jnp.arctan2(L, rr_front) * sgn, z)
    front_l = jnp.where(turning,
                        jnp.sqrt(rr_front ** 2 + L ** 2) * x / r, x)
    front_r = jnp.where(turning,
                        jnp.sqrt(rl_front ** 2 + L ** 2) * x / r, x)

    zero = jnp.zeros_like(x)
    return WheelCommand(
        rear_left=jnp.where(stale, zero, rear_l),
        rear_right=jnp.where(stale, zero, rear_r),
        front_left=jnp.where(stale, zero, front_l),
        front_right=jnp.where(stale, zero, front_r),
        steer_left=jnp.where(stale, zero, steer_l),
        steer_right=jnp.where(stale, zero, steer_r))


def rear_axle_pose(center_pose, offset: float = 0.13):
    """Rear-axle pose from the body-center pose (true_state_pub.py:49-53:
    -0.13 m along body x)."""
    x, y, yaw = center_pose[0], center_pose[1], center_pose[2]
    return jnp.stack([x - offset * jnp.cos(yaw),
                      y - offset * jnp.sin(yaw), yaw])


def quaternion_from_rotation(R):
    """(x, y, z, w) quaternion of a rotation matrix (Shepperd's branchless
    max-trace form, safe for all orientations the terrain lift produces)."""
    import jax.numpy as jnp
    t = jnp.trace(R)
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + t, 1e-12))
    s = 0.25 / jnp.maximum(qw, 1e-9)
    qx = (R[2, 1] - R[1, 2]) * s
    qy = (R[0, 2] - R[2, 0]) * s
    qz = (R[1, 0] - R[0, 1]) * s
    return jnp.stack([qx, qy, qz, qw])


def world_tf(grid, se2_pose):
    """world -> base_footprint transform of the car's center pose:
    (translation [3], quaternion [4] xyzw).

    TPU-native equivalent of the reference's world_tf_pub node (reference:
    carsim/scripts/world_tf_pub.py:1-30), which re-broadcasts the center
    PoseStamped as a TF — here the SE(2) state lifts through the terrain
    (SE(3) pose on the surface) and returns the transform as arrays."""
    from uneven_planner_tpu.terrain.grid import se3_lift
    R, p = se3_lift(grid, se2_pose)
    return p, quaternion_from_rotation(R)
