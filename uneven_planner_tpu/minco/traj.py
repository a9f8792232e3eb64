"""SE(2) trajectory evaluation and post-solve metrics.

Mirrors the evaluation surface of the reference SE2Trajectory
(src/uneven_planner/back_end/include/utils/se2traj.hpp:408-562) and the
post-solve constraint report ALMTrajOpt::getMaxVxAxAyCurAttSig
(back_end/include/back_end/alm_traj_opt.h:170-229).  Trajectories are plain
arrays (c_xy [Nxy,6,2], ts_xy [Nxy], c_yaw [Nyaw,6,1], ts_yaw [Nyaw]);
metrics use masked fixed-size sampling so everything stays jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.terrain import grid as tgrid

DELTA_V = 0.01      # se2traj.hpp:18 (curvature regularizer)
DELTA_SIGL = 0.01   # alm_traj_opt.h:16


class SE2Traj(NamedTuple):
    """Piecewise-quintic SE(2) trajectory (xy and yaw pieces share total
    duration but may differ in count, se2traj.hpp:819-830)."""
    c_xy: jax.Array    # [Nxy, 6, 2]
    ts_xy: jax.Array   # [Nxy]
    c_yaw: jax.Array   # [Nyaw, 6, 1]
    ts_yaw: jax.Array  # [Nyaw]

    @property
    def total_duration(self):
        return jnp.minimum(jnp.sum(self.ts_xy), jnp.sum(self.ts_yaw))


def se2_state(traj: SE2Traj, t: jax.Array):
    """(pos[2], vel[2], acc[2], yaw, dyaw, d2yaw) at global time t."""
    pos, vel, acc, _ = minco.eval_traj(traj.c_xy, traj.ts_xy, t)
    yaw, dyaw, d2yaw, _ = minco.eval_traj(traj.c_yaw, traj.ts_yaw, t)
    return pos, vel, acc, yaw[0], dyaw[0], d2yaw[0]


def se2_pos(traj: SE2Traj, t: jax.Array) -> jax.Array:
    pos, _, _, yaw, _, _ = se2_state(traj, t)
    return jnp.array([pos[0], pos[1], yaw])


def lon_lat_acc(acc, yaw):
    """Longitudinal / lateral body-frame acceleration (se2traj.hpp:471-483)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return acc[0] * c + acc[1] * s, -acc[0] * s + acc[1] * c


def curvature(vel, yaw, dyaw):
    """Signed curvature with the reference's low-speed guard and direction
    sign eta (se2traj.hpp:485-498)."""
    vnorm = jnp.linalg.norm(vel)
    heading = jnp.array([jnp.cos(yaw), jnp.sin(yaw)])
    eta = jnp.where(jnp.dot(vel, heading) < 0, -1.0, 1.0)
    cur = dyaw / (eta * jnp.sqrt(jnp.sum(vel * vel) + DELTA_V))
    return jnp.where(vnorm < 1e-4, 0.0, cur)


def _sample_times(traj: SE2Traj, num_samples: int, dt: float = 0.01):
    """Masked absolute-dt sampling grid: t = 0, dt, 2dt, ... < duration,
    matching the reference's metric loops (se2traj.hpp:514,554;
    alm_traj_opt.h:184)."""
    t = jnp.arange(num_samples, dtype=traj.ts_xy.dtype) * dt
    mask = t < traj.total_duration
    return t, mask


def non_hol_error(traj: SE2Traj, num_samples: int = 4096) -> jax.Array:
    """Sum over samples of |v . (sin yaw, -cos yaw)|
    (SE2Trajectory::getNonHolError, se2traj.hpp:551-561)."""
    t, mask = _sample_times(traj, num_samples)

    def one(ti):
        _, vel, _, yaw, _, _ = se2_state(traj, ti)
        return jnp.abs(vel[0] * jnp.sin(yaw) - vel[1] * jnp.cos(yaw))

    return jnp.sum(jax.vmap(one)(t) * mask)


def max_metrics(traj: SE2Traj, grid: tgrid.TerrainGrid,
                num_samples: int = 4096):
    """Post-solve report {max |vx|, max |ax|, max |ay|, max |kappa|,
    min cos_xi, max sigma} (ALMTrajOpt::getMaxVxAxAyCurAttSig,
    alm_traj_opt.h:170-229)."""
    t, mask = _sample_times(traj, num_samples)
    gravity = grid.gravity

    def one(ti):
        pos, vel, acc, yaw, dyaw, _ = se2_state(traj, ti)
        se2 = jnp.array([pos[0], pos[1], tgrid.normalize_so2(yaw)])
        v = tgrid.get_terrain_variables(grid, se2)
        inv_cos_vphix, sin_phix, inv_cos_vphiy, sin_phiy = v[0], v[1], v[2], v[3]
        cos_xi, inv_cos_xi, sigma = v[4], v[5], v[6]
        la, lata = lon_lat_acc(acc, yaw)
        vx = jnp.linalg.norm(vel) * inv_cos_vphix
        ax = la * inv_cos_vphix + gravity * sin_phix
        ay = lata * inv_cos_vphiy + gravity * sin_phiy
        wz = dyaw * inv_cos_xi
        cur = wz / jnp.sqrt(vx * vx + DELTA_SIGL)
        return jnp.array([jnp.abs(vx), jnp.abs(ax), jnp.abs(ay),
                          jnp.abs(cur), cos_xi, sigma])

    vals = jax.vmap(one)(t)
    big = jnp.where(mask[:, None], vals, -jnp.inf)
    small = jnp.where(mask[:, None], vals, jnp.inf)
    return {
        "max_vx": jnp.max(big[:, 0]),
        "max_ax": jnp.max(big[:, 1]),
        "max_ay": jnp.max(big[:, 2]),
        "max_cur": jnp.max(big[:, 3]),
        "min_cxi": jnp.min(small[:, 4]),
        "max_sig": jnp.max(big[:, 5]),
    }


def max_vel_rate(traj: SE2Traj, num_samples: int = 4096) -> jax.Array:
    """Max ||v|| by dense sampling (reference uses polynomial root isolation
    for the same diagnostic, se2traj.hpp:152-201)."""
    t, mask = _sample_times(traj, num_samples)
    v = jax.vmap(lambda ti: jnp.linalg.norm(se2_state(traj, ti)[1]))(t)
    return jnp.max(jnp.where(mask, v, -jnp.inf))


def sample_dense(traj: SE2Traj, num_samples: int, dt: float):
    """[num_samples, 3] SE(2) poses at t = i*dt (clamped to duration) plus a
    validity mask — the visualization / wire sampling pattern
    (alm_traj_opt.cpp:1068-1140)."""
    t = jnp.arange(num_samples, dtype=traj.ts_xy.dtype) * dt
    mask = t <= traj.total_duration
    t = jnp.minimum(t, traj.total_duration)
    poses = jax.vmap(lambda ti: se2_pos(traj, ti))(t)
    return poses, mask
