"""Tracking-error benchmark harness (the reference's bk_mode).

Re-implements the reference benchmark loop (reference: mpc.cpp:59-93,139-177
+ TrajAnalyzer loaders traj_anal.hpp:183-354): load a trajectory file in one
of three formats, run tracking episodes (teleport to the episode's initial
pose, track to goal, record mean ||xy err||), and write the per-episode
errors plus `all_mean_track_err` to an `err_*` file.

File formats (whitespace-separated, one trajectory per line):
- "proposed" (BK_UNEVEN, traj_anal.hpp:185-259): MINCO waypoints —
  n_pos n_ang, start xy, inner xys, tail xy, start yaw, inner yaws,
  tail yaw, pos piece times, yaw piece times; rebuilt by a MINCO solve.
- "Wangs" (BK_TOWARDS, :260-313): piece count then per piece duration +
  3x6 descending-power coefficient matrix; heading follows velocity.
- "Jians" (BK_PUTN, :314-353): waypoint count, dt, then x y theta triples.

The plant is the batched kinematic simulator; teleportation is simply
resetting its state (the capability of carsim's /set_model_location,
searchForSetPoint.cpp:33-66).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.config import MPCConfig
from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.minco.traj import SE2Traj
from uneven_planner_tpu.sim import rollout


class PolyTraj3(NamedTuple):
    """Wangs/towards format: 3D quintic pieces, descending coefficients."""
    coeffs: jax.Array  # [N, 3, 6] descending (t^5 .. 1)
    ts: jax.Array      # [N]


class WaypointTraj(NamedTuple):
    """Jians/PUTN format: fixed-dt (x, y, theta) waypoints."""
    points: jax.Array  # [M, 3]
    dt: float


def load_benchmark_file(path: str):
    """Returns (kind, [trajectories]); kind inferred from the file name like
    the reference (find("proposed"/"Wangs"/"Jians"))."""
    with open(path) as f:
        lines = [ln.split() for ln in f if ln.strip()]

    if "proposed" in path:
        trajs = []
        for d in lines:
            npos, nang = int(d[0]), int(d[1])
            i = 2
            start_xy = [float(d[i]), float(d[i + 1])]; i += 2
            inner_xy = np.asarray(
                [[float(d[i + 2 * k]), float(d[i + 2 * k + 1])]
                 for k in range(npos - 1)]); i += 2 * (npos - 1)
            tail_xy = [float(d[i]), float(d[i + 1])]; i += 2
            start_yaw = float(d[i]); i += 1
            inner_yaw = np.asarray([[float(d[i + k])]
                                    for k in range(nang - 1)]); i += nang - 1
            tail_yaw = float(d[i]); i += 1
            pos_t = np.asarray([float(d[i + k]) for k in range(npos)])
            i += npos
            ang_t = np.asarray([float(d[i + k]) for k in range(nang)])
            i += nang

            zeros2 = np.zeros((1, 2))
            head = np.concatenate([[start_xy], zeros2, zeros2])
            tail = np.concatenate([[tail_xy], zeros2, zeros2])
            c_xy = minco.generate(jnp.asarray(inner_xy.reshape(npos - 1, 2)),
                                  jnp.asarray(pos_t), jnp.asarray(head),
                                  jnp.asarray(tail))
            heady = np.asarray([[start_yaw], [0.0], [0.0]])
            taily = np.asarray([[tail_yaw], [0.0], [0.0]])
            c_yaw = minco.generate(jnp.asarray(inner_yaw), jnp.asarray(ang_t),
                                   jnp.asarray(heady), jnp.asarray(taily))
            trajs.append(SE2Traj(c_xy, jnp.asarray(pos_t), c_yaw,
                                 jnp.asarray(ang_t)))
        return "proposed", trajs

    if "Wangs" in path:
        trajs = []
        for d in lines:
            n = int(d[0])
            i = 1
            ts, mats = [], []
            for _ in range(n):
                ts.append(float(d[i])); i += 1
                mat = np.asarray([float(x) for x in d[i:i + 18]]
                                 ).reshape(3, 6)
                i += 18
                mats.append(mat)
            trajs.append(PolyTraj3(coeffs=jnp.asarray(np.stack(mats)),
                                   ts=jnp.asarray(np.asarray(ts))))
        return "Wangs", trajs

    if "Jians" in path:
        trajs = []
        for d in lines:
            m = int(d[0])
            dt = float(d[1])
            pts = np.asarray([float(x) for x in d[2:2 + 3 * m]]
                             ).reshape(m, 3)
            trajs.append(WaypointTraj(points=jnp.asarray(pts), dt=dt))
        return "Jians", trajs

    raise ValueError(f"unknown benchmark format for {path}")


def _poly3_state(traj: PolyTraj3, t):
    """Position + velocity of a descending-coefficient 3D poly traj."""
    csum = jnp.cumsum(traj.ts)
    idx, s = minco.locate_piece(csum, t)
    c = traj.coeffs[idx]  # [3, 6] descending
    powers = s ** jnp.arange(5, -1, -1)
    dpow = jnp.concatenate([jnp.arange(5, 0, -1) * s ** jnp.arange(4, -1, -1),
                            jnp.zeros(1, s.dtype)])
    return c @ powers, c @ dpow


def ref_points_for(kind: str, traj, t_now, cfg: MPCConfig):
    """Reference horizon for any benchmark trajectory type
    (getRefPoints, traj_anal.hpp:485-573)."""
    T = cfg.predict_steps
    if kind == "proposed":
        from uneven_planner_tpu.mpc import tracker
        return tracker.get_ref_points(traj, t_now, cfg)
    ts = t_now + jnp.arange(T, dtype=t_now.dtype) * cfg.dt
    if kind == "Wangs":
        dur = jnp.sum(traj.ts)
        tc = jnp.minimum(ts, dur)
        pos, vel = jax.vmap(lambda x: _poly3_state(traj, x))(tc)
        theta = jnp.arctan2(vel[:, 1], vel[:, 0])
        refs = jnp.stack([pos[:, 0], pos[:, 1], theta], axis=0)
        return refs, t_now > dur + 1.0
    if kind == "Jians":
        m = traj.points.shape[0]
        dur = traj.dt * m
        idx = jnp.clip((jnp.minimum(ts, dur - 1e-9) / traj.dt)
                       .astype(jnp.int32), 0, m - 1)
        refs = traj.points[idx].T
        return refs, t_now > dur + 1.0
    raise ValueError(kind)


class EpisodeResult(NamedTuple):
    mean_err: float
    steps: int


def run_benchmark(path: str, cfg: MPCConfig, out_path: str | None = None,
                  ctrl_dt: float = 0.01, max_sqp_iter: int = 1,
                  max_steps: int = 6000) -> Tuple[List[EpisodeResult], float]:
    """Episode loop (mpc.cpp:139-177): teleport, track, log errors."""
    kind, trajs = load_benchmark_file(path)
    results = []
    total = 0.0
    for traj in trajs:
        if kind == "proposed":
            start = np.zeros(3)
            p0, *_ = minco.eval_piece(traj.c_xy[0], jnp.asarray(0.0))
            y0, *_ = minco.eval_piece(traj.c_yaw[0], jnp.asarray(0.0))
            start[:2] = np.asarray(p0)
            start[2] = float(y0[0])
            dur = float(traj.total_duration)
            res = jax.jit(lambda tr, s: rollout.track_trajectory(
                tr, s, cfg, n_steps=min(int((dur + 1.2) / ctrl_dt),
                                        max_steps),
                ctrl_dt=ctrl_dt, max_sqp_iter=max_sqp_iter))(
                traj, jnp.asarray(start))
            mean_err = float(res.mean_err)
            steps = len(np.asarray(res.errs))
        else:
            mean_err, steps = _track_generic(kind, traj, cfg, ctrl_dt,
                                             max_sqp_iter, max_steps)
        results.append(EpisodeResult(mean_err=mean_err, steps=steps))
        total += mean_err

    if out_path:
        with open(out_path, "w") as f:
            for r in results:
                f.write(f"{r.mean_err}\n")
            f.write(f"all_mean_track_err: {total}\n")
    return results, total


def _track_generic(kind, traj, cfg, ctrl_dt, max_sqp_iter, max_steps):
    """Closed-loop tracking for the non-MINCO formats."""
    from uneven_planner_tpu.mpc import tracker

    if kind == "Wangs":
        dur = float(jnp.sum(traj.ts))
        pos0, vel0 = _poly3_state(traj, jnp.asarray(0.0))
        start = jnp.asarray([float(pos0[0]), float(pos0[1]),
                             float(jnp.arctan2(vel0[1], vel0[0]))])
    else:
        start = traj.points[0]
        dur = traj.dt * traj.points.shape[0]
    n_steps = min(int((dur + 1.2) / ctrl_dt), max_steps)
    T = cfg.predict_steps
    d = max(cfg.delay_num, 1)

    def step(carry, _):
        state, output, buff, t = carry
        refs, at_goal = ref_points_for(kind, traj, t, cfg)
        err = jnp.linalg.norm(refs[:2, 0] - state[:2])
        refs = tracker.smooth_yaw(refs, state[2])
        res = tracker.mpc_step(state, refs, jnp.zeros_like(refs[:2]),
                               output, buff, cfg,
                               max_sqp_iter=max_sqp_iter)
        cmd = jnp.where(at_goal, jnp.zeros(2, state.dtype), res.cmd)
        state = rollout.plant_step(state, cmd, cfg, ctrl_dt)
        return (state, res.output, res.output_buff, t + ctrl_dt), \
            (err, at_goal)

    init = (start, jnp.zeros((2, T), start.dtype),
            jnp.zeros((d, 2), start.dtype), jnp.zeros((), start.dtype))
    _, (errs, at_goal) = jax.jit(lambda c: jax.lax.scan(
        step, c, None, length=n_steps))(init)
    pre = ~np.asarray(at_goal)
    errs = np.asarray(errs)
    mean_err = float(errs[pre].mean()) if pre.any() else float(errs.mean())
    return mean_err, n_steps


def save_proposed_file(path: str, trajs: List[SE2Traj]) -> None:
    """Write trajectories in the reference 'proposed' format so reference
    and TPU builds can exchange benchmark files."""
    with open(path, "w") as f:
        for tr in trajs:
            npos = tr.ts_xy.shape[0]
            nang = tr.ts_yaw.shape[0]
            starts = [np.asarray(minco.eval_piece(tr.c_xy[i], jnp.asarray(
                0.0))[0]) for i in range(npos)]
            end_xy = np.asarray(minco.eval_piece(tr.c_xy[-1],
                                                 tr.ts_xy[-1])[0])
            ystarts = [float(np.asarray(minco.eval_piece(
                tr.c_yaw[i], jnp.asarray(0.0))[0])[0]) for i in range(nang)]
            end_yaw = float(np.asarray(minco.eval_piece(
                tr.c_yaw[-1], tr.ts_yaw[-1])[0])[0])
            row = [npos, nang]
            row += list(starts[0])
            for s in starts[1:]:
                row += list(s)
            row += list(end_xy)
            row += [ystarts[0]] + ystarts[1:] + [end_yaw]
            row += list(np.asarray(tr.ts_xy))
            row += list(np.asarray(tr.ts_yaw))
            f.write(" ".join(str(float(x)) if not isinstance(x, int)
                             else str(x) for x in row) + "\n")
