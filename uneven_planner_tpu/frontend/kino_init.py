"""Massively parallel batched-sampling kinodynamic initializer.

TPU-native replacement for the reference's kinodynamic A* front end
(reference: src/uneven_planner/front_end/src/kino_astar.cpp:67-236).  Same
capability — a feasible SE(2) init path from start to goal honoring
curvature, 2D occupancy, and terrain flatness — produced by a different,
batch-parallel algorithm:

Instead of one node popped per iteration, a *frontier* of F states expands
simultaneously each round through the same control lattice (v x steer cross
product, kino_astar.cpp:138-145) with the exact constant-curvature bicycle
propagation (stateTransit, kino_astar.h:218-240).  Candidates are
collision-checked along their arcs (collision_interval sampling,
kino_astar.cpp:171-185), scored with the reference g-score terms
(w_r2*arc + w_so2*|steer|*arc + w_v*dv + w_delta*ddelta + w_sigma*sigma,
:187-195), deduplicated per (x, y, yaw-bin) cell via scatter-min
(label-correcting parallel search), and pruned to the best F by
f = g + lambda_heu * tie_breaker * dist (getHeu, kino_astar.h:213-216).
Within oneshot_range of the goal a closed-form Dubins connection is
attempted with the same radius and collision sampling
(asignShotTraj, kino_astar.h:242-271).

Everything is one jitted while_loop; parent pointers in a preallocated
arena give path reconstruction (retrievePath, kino_astar.h:273-292).

TPU layout: every per-node quantity is a separate flat 1-D array (x, y,
yaw, g, f, ... each [Pn] / [arena_n] / [F*I]), NEVER an [N, 3] or
[N, ..., 4] tensor — under a wide scenario vmap a small trailing dim pays
16-64x (8, 128) tile padding, and the round-3 frontend benchmark OOMed at
21.5 GiB on exactly that (per-candidate sigma corners, [.., 2,2,2,4]).
Terrain sigma and occupancy go through the channel-major batch lookups
(terrain/grid.py terrain_sigma_cm / is_occupancy_xy_batch), whose gather
results are [M]-minor.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.config import FrontendConfig
from uneven_planner_tpu.frontend import dubins
from uneven_planner_tpu.terrain import grid as tgrid


def control_lattice(cfg: FrontendConfig) -> np.ndarray:
    """The reference's input cross product (kino_astar.cpp:138-145), minus
    the no-op v=0 rows."""
    vs = [0.5 * cfg.max_vel, cfg.max_vel]
    steers = [-cfg.max_steer, -0.5 * cfg.max_steer, 0.0,
              0.5 * cfg.max_steer, cfg.max_steer]
    return np.asarray([[v, s] for v in vs for s in steers])


def state_transit(state, v, steer, T, wheel_base):
    """Exact constant-curvature propagation (kino_astar.h:218-240)."""
    s = v * T
    y = s * jnp.tan(steer) / wheel_base
    straight = jnp.stack([state[0] + s * jnp.cos(state[2]),
                          state[1] + s * jnp.sin(state[2]),
                          state[2]])
    r = s / jnp.where(jnp.abs(y) > 1e-12, y, 1.0)
    turn = jnp.stack([
        state[0] + r * (jnp.sin(state[2] + y) - jnp.sin(state[2])),
        state[1] - r * (jnp.cos(state[2] + y) - jnp.cos(state[2])),
        tgrid.normalize_so2(state[2] + y)])
    return jnp.where(jnp.abs(steer) > 1e-4, turn, straight)


def state_transit_cm(x, y, yaw, v, steer, T, wheel_base):
    """`state_transit` on coordinate arrays (broadcasting, channel-major):
    returns (x', y', yaw') elementwise — the batched hot path."""
    s = v * T
    t = s * jnp.tan(steer) / wheel_base
    sx = x + s * jnp.cos(yaw)
    sy = y + s * jnp.sin(yaw)
    r = s / jnp.where(jnp.abs(t) > 1e-12, t, 1.0)
    tx = x + r * (jnp.sin(yaw + t) - jnp.sin(yaw))
    ty = y - r * (jnp.cos(yaw + t) - jnp.cos(yaw))
    tyaw = tgrid.normalize_so2(yaw + t)
    turn = jnp.abs(steer) > 1e-4
    return (jnp.where(turn, tx, sx), jnp.where(turn, ty, sy),
            jnp.where(turn, tyaw, yaw))


class KinoResult(NamedTuple):
    path: jax.Array        # [L, 3] SE(2) path (start -> goal), padded
    path_mask: jax.Array   # [L] valid entries
    success: jax.Array     # bool
    cost: jax.Array        # g + shot length
    rounds: jax.Array
    # Expanded-node record (visExpanded, kino_astar.cpp:266-276): only
    # populated by plan(..., with_arena=True) — a [arena_n, 3] SE(2) state
    # per expanded node plus its parent arena id (-1 = unused slot).
    arena: jax.Array | None = None
    arena_parent: jax.Array | None = None


def _yaw_bins(cfg: FrontendConfig) -> int:
    return max(int(math.ceil(2.0 * math.pi / cfg.dedup_yaw_resolution)), 1)


def plan(grid: tgrid.TerrainGrid, cfg: FrontendConfig,
         start, goal, n_shot_samples: int = 64,
         with_arena: bool = False) -> KinoResult:
    """Search for an init path from start to goal (single instance; vmap
    for batches of scenarios).  with_arena=True additionally returns the
    expanded-node record for visualization (utils/vis.expanded_nodes)."""
    F = cfg.frontier_size
    R = cfg.max_rounds
    lattice = control_lattice(cfg)
    I = lattice.shape[0]
    rho = cfg.wheel_base / math.tan(cfg.max_steer)
    nyaw_bins = _yaw_bins(cfg)
    nx, ny, _ = grid.voxel_num
    # dedup grid must be finer than the per-round arc progress or every
    # candidate lands in its parent's cell and the wavefront stalls
    dedup_res = cfg.dedup_resolution or min(
        grid.xy_resolution, 0.5 * cfg.max_vel * cfg.time_interval)
    nx_d = int(math.ceil(nx * grid.xy_resolution / dedup_res))
    ny_d = int(math.ceil(ny * grid.xy_resolution / dedup_res))
    n_cells = nx_d * ny_d * nyaw_bins
    n_col = max(int(math.ceil(cfg.max_vel * cfg.time_interval
                              / cfg.collision_interval)), 1)
    arena_n = 1 + F * R
    dtype = start.dtype
    FI = F * I
    lat_v = jnp.asarray(np.tile(lattice[:, 0], F), dtype)     # [FI]
    lat_s = jnp.asarray(np.tile(lattice[:, 1], F), dtype)
    parent_lane = jnp.asarray(np.repeat(np.arange(F), I), jnp.int32)
    ox, oy, _ = grid.origin

    def cells_of(cx, cy, cyaw):
        ix = jnp.clip(jnp.floor((cx - ox) / dedup_res).astype(jnp.int32),
                      0, nx_d - 1)
        iy = jnp.clip(jnp.floor((cy - oy) / dedup_res).astype(jnp.int32),
                      0, ny_d - 1)
        ib = jnp.clip(jnp.floor((tgrid.normalize_so2(cyaw) + jnp.pi)
                                / cfg.dedup_yaw_resolution)
                      .astype(jnp.int32), 0, nyaw_bins - 1)
        return (ix * ny_d + iy) * nyaw_bins + ib

    def heu(cx, cy):
        return (1.0 + 1.0 / 10000) * jnp.hypot(cx - goal[0], cy - goal[1])

    shot_ss = jnp.arange(n_shot_samples, dtype=dtype) * cfg.collision_interval

    def try_shot(ex, ey, eyaw, g_shot):
        """Dubins connections to the goal with collision checks, over all
        [F] expanded states at once (asignShotTraj, kino_astar.h:242-271)."""
        near = jnp.hypot(ex - goal[0], ey - goal[1]) < cfg.oneshot_range
        Ls = jax.vmap(lambda xx, yy, ww: dubins.distance(
            jnp.stack([xx, yy, ww]), goal, rho))(ex, ey, eyaw)
        valid_s = shot_ss[None, :] <= Ls[:, None]             # [F, S]
        pts = jax.vmap(lambda xx, yy, ww, L: dubins.sample_many(
            jnp.stack([xx, yy, ww]), goal, rho,
            jnp.minimum(shot_ss, L)).T)(ex, ey, eyaw, Ls)     # [F, 3, S]
        occ = tgrid.is_occupancy_xy_batch(
            grid, pts[:, 0].reshape(-1),
            pts[:, 1].reshape(-1)).reshape(F, -1)
        blocked = jnp.any(occ & valid_s, axis=1)
        fits = Ls <= (n_shot_samples - 1) * cfg.collision_interval
        ok = near & ~blocked & fits
        return ok, jnp.where(ok, g_shot + Ls, jnp.inf)

    # Persistent OPEN pool (batched A*): each round the best F open nodes
    # expand in parallel and their surviving children are merged back.
    # A frontier-only wavefront would discard the open backlog and die in
    # cul-de-sacs; the pool is what makes the search complete like A*.
    Pn = 8 * F

    class S(NamedTuple):
        pool_x: jax.Array        # [Pn]
        pool_y: jax.Array
        pool_yaw: jax.Array
        pool_g: jax.Array
        pool_f: jax.Array        # inf = empty/closed
        pool_v: jax.Array        # arrival input v
        pool_steer: jax.Array    # arrival input steer
        pool_parent: jax.Array   # [Pn] arena id of generating parent
        best_g: jax.Array        # [n_cells]
        arena_x: jax.Array       # [arena_n] expanded nodes
        arena_y: jax.Array
        arena_yaw: jax.Array
        arena_parent: jax.Array
        rnd: jax.Array
        shot_ok: jax.Array
        shot_cost: jax.Array
        shot_node: jax.Array     # arena id of shot origin
        done: jax.Array

    def body(s: S):
        # select best-F open nodes for expansion; they become arena nodes
        negf, sel = jax.lax.top_k(-s.pool_f, F)
        exp_x, exp_y = s.pool_x[sel], s.pool_y[sel]
        exp_yaw = s.pool_yaw[sel]
        exp_g = s.pool_g[sel]
        exp_v, exp_steer = s.pool_v[sel], s.pool_steer[sel]
        exp_parents = s.pool_parent[sel]
        active = jnp.isfinite(s.pool_f[sel])
        pool_f = s.pool_f.at[sel].set(jnp.inf)  # close them

        base = 1 + s.rnd * F
        exp_ids = base + jnp.arange(F, dtype=jnp.int32)
        arena_x = jax.lax.dynamic_update_slice(s.arena_x, exp_x, (base,))
        arena_y = jax.lax.dynamic_update_slice(s.arena_y, exp_y, (base,))
        arena_yaw = jax.lax.dynamic_update_slice(s.arena_yaw, exp_yaw,
                                                 (base,))
        arena_parent = jax.lax.dynamic_update_slice(
            s.arena_parent, jnp.where(active, exp_parents, -1), (base,))

        # one-shot attempts from the expanded set (best lane wins)
        exp_g_shot = jnp.where(active, exp_g, jnp.inf)
        oks, totals = try_shot(exp_x, exp_y, exp_yaw, exp_g_shot)
        totals = jnp.where(oks, totals, jnp.inf)
        best_lane = jnp.argmin(totals)
        better = totals[best_lane] < s.shot_cost
        hit = oks[best_lane] & better
        shot_ok = s.shot_ok | hit
        shot_cost = jnp.where(hit, totals[best_lane], s.shot_cost)
        shot_node = jnp.where(hit, exp_ids[best_lane], s.shot_node)

        # expand through the control lattice ([FI] flat candidate arrays)
        px0 = exp_x[parent_lane]
        py0 = exp_y[parent_lane]
        pyaw0 = exp_yaw[parent_lane]
        cx, cy, cyaw = state_transit_cm(px0, py0, pyaw0, lat_v, lat_s,
                                        cfg.time_interval, cfg.wheel_base)

        in_map = (cx > ox + 1e-4) & (cx < ox + nx * grid.xy_resolution - 1e-4) \
            & (cy > oy + 1e-4) & (cy < oy + ny * grid.xy_resolution - 1e-4)
        # collision sampling along the arcs (kino_astar.cpp:171-185)
        fr = (jnp.arange(1, n_col + 1, dtype=dtype) / n_col
              * cfg.time_interval)
        ax_, ay_, _ = state_transit_cm(
            px0[:, None], py0[:, None], pyaw0[:, None],
            lat_v[:, None], lat_s[:, None], fr[None, :], cfg.wheel_base)
        occ_arc = tgrid.is_occupancy_xy_batch(
            grid, ax_.reshape(-1), ay_.reshape(-1)).reshape(FI, n_col)
        free = ~jnp.any(occ_arc, axis=1)
        sig = tgrid.terrain_sigma_cm(grid, cx, cy, tgrid.normalize_so2(cyaw))

        arc = lat_v * cfg.time_interval
        dg = (cfg.weight_r2 * arc
              + cfg.weight_so2 * jnp.abs(lat_s) * arc
              + cfg.weight_v_change * jnp.abs(lat_v - exp_v[parent_lane])
              + cfg.weight_delta_change
              * jnp.abs(lat_s - exp_steer[parent_lane])
              + cfg.weight_sigma * sig)
        g_new = exp_g[parent_lane] + dg
        ok = active[parent_lane] & in_map & free
        g_new = jnp.where(ok, g_new, jnp.inf)

        # per-cell winners via scatter-min (dedup within the round and
        # against all previously accepted nodes)
        cells = cells_of(cx, cy, cyaw)
        round_best = jnp.full((n_cells,), jnp.inf, dtype).at[cells].min(g_new)
        improved = (g_new <= round_best[cells]) & \
            (g_new < s.best_g[cells] - 1e-9) & jnp.isfinite(g_new)
        first_idx = jnp.full((n_cells,), FI, jnp.int32) \
            .at[cells].min(jnp.where(improved,
                                     jnp.arange(FI, dtype=jnp.int32),
                                     FI))
        winner = improved & (first_idx[cells] == jnp.arange(FI))

        f_cand = jnp.where(winner, g_new + cfg.lambda_heu * heu(cx, cy),
                           jnp.inf)

        # merge pool (minus expanded) with winners, keep best Pn by f
        merged_f = jnp.concatenate([pool_f, f_cand])
        _, keep = jax.lax.top_k(-merged_f, Pn)
        merged_g = jnp.concatenate([s.pool_g, g_new])
        take = lambda old, new: jnp.concatenate([old, new])[keep]
        new_pool_f = merged_f[keep]
        new_pool = S(
            pool_x=take(s.pool_x, cx), pool_y=take(s.pool_y, cy),
            pool_yaw=take(s.pool_yaw, cyaw),
            pool_g=merged_g[keep], pool_f=new_pool_f,
            pool_v=take(s.pool_v, lat_v),
            pool_steer=take(s.pool_steer, lat_s),
            pool_parent=take(s.pool_parent, exp_ids[parent_lane]),
            best_g=s.best_g, arena_x=arena_x, arena_y=arena_y,
            arena_yaw=arena_yaw, arena_parent=arena_parent, rnd=s.rnd + 1,
            shot_ok=shot_ok, shot_cost=shot_cost, shot_node=shot_node,
            done=s.done)

        # accepted candidates (kept & from the candidate part) claim best_g
        cand_keep = keep >= Pn
        claim_cells = jnp.where(cand_keep, cells[jnp.clip(keep - Pn, 0)], 0)
        claim_g = jnp.where(cand_keep, merged_g[keep], jnp.inf)
        best_after = s.best_g.at[claim_cells].min(claim_g)

        rnd = s.rnd + 1
        any_open = jnp.any(jnp.isfinite(new_pool_f))
        done = shot_ok | (rnd >= R) | ~any_open
        return new_pool._replace(best_g=best_after, done=done)

    start_yaw = tgrid.normalize_so2(start[2])
    start_n = jnp.stack([start[0], start[1], start_yaw])
    # occupied-start/goal early-out (reference aborts before searching,
    # kino_astar.cpp:86-95: SE(2) occupancy at start, 2D occupancy at goal)
    feasible = ~tgrid.is_occupancy(grid, start_n) \
        & ~tgrid.is_occupancy_xy(grid, goal[:2])
    pool_f0 = jnp.full((Pn,), jnp.inf, dtype).at[0].set(
        jnp.where(feasible,
                  cfg.lambda_heu * heu(start_n[0], start_n[1]), jnp.inf))
    init = S(pool_x=jnp.full((Pn,), start[0], dtype),
             pool_y=jnp.full((Pn,), start[1], dtype),
             pool_yaw=jnp.full((Pn,), start_yaw, dtype),
             pool_g=jnp.full((Pn,), jnp.inf, dtype).at[0].set(0.0),
             pool_f=pool_f0,
             pool_v=jnp.zeros((Pn,), dtype),
             pool_steer=jnp.zeros((Pn,), dtype),
             pool_parent=jnp.zeros((Pn,), jnp.int32),
             best_g=jnp.full((n_cells,), jnp.inf, dtype).at[
                 cells_of(start[0], start[1], start_yaw)].set(0.0),
             arena_x=jnp.full((arena_n,), start[0], dtype),
             arena_y=jnp.full((arena_n,), start[1], dtype),
             arena_yaw=jnp.full((arena_n,), start_yaw, dtype),
             arena_parent=jnp.full((arena_n,), -1, jnp.int32),
             rnd=jnp.asarray(0, jnp.int32),
             shot_ok=jnp.asarray(False),
             shot_cost=jnp.asarray(jnp.inf, dtype),
             shot_node=jnp.asarray(0, jnp.int32),
             done=~feasible)

    out = jax.lax.while_loop(lambda s: ~s.done, body, init)

    # ---- path reconstruction (retrievePath, kino_astar.h:273-292)
    def back(carry, _):
        node, _ = carry
        nid = jnp.maximum(node, 0)
        st = jnp.stack([out.arena_x[nid], out.arena_y[nid],
                        out.arena_yaw[nid]])
        valid = node >= 0
        nxt = jnp.where(valid, out.arena_parent[nid], -1)
        return (nxt, valid), (st, valid)

    (_, _), (rev_states, rev_valid) = jax.lax.scan(
        back, (out.shot_node, jnp.asarray(True)), None, length=R + 1)
    # reverse into start->shot order, left-aligned
    n_valid = jnp.sum(rev_valid.astype(jnp.int32))
    idx = n_valid - 1 - jnp.arange(R + 1)
    tree_states = jnp.where((idx >= 0)[:, None],
                            rev_states[jnp.clip(idx, 0, R)], 0.0)
    tree_mask = idx >= 0

    shot_state = jnp.stack([out.arena_x[out.shot_node],
                            out.arena_y[out.shot_node],
                            out.arena_yaw[out.shot_node]])
    L = dubins.distance(shot_state, goal, rho)
    ss = jnp.arange(1, n_shot_samples + 1, dtype=dtype) \
        * cfg.collision_interval
    shot_pts = dubins.sample_many(shot_state, goal, rho,
                                  jnp.minimum(ss, L))
    shot_mask = ss <= L

    path = jnp.concatenate([tree_states, shot_pts, goal[None, :]], axis=0)
    mask = jnp.concatenate([tree_mask, shot_mask, jnp.asarray([True])])
    mask = mask & out.shot_ok
    arena = (jnp.stack([out.arena_x, out.arena_y, out.arena_yaw], axis=1)
             if with_arena else None)
    return KinoResult(path=path, path_mask=mask, success=out.shot_ok,
                      cost=out.shot_cost, rounds=out.rnd,
                      arena=arena,
                      arena_parent=out.arena_parent if with_arena else None)


def extract_path(result: KinoResult) -> np.ndarray:
    """Host-side ragged path (rows in order, masked rows dropped)."""
    m = np.asarray(result.path_mask)
    return np.asarray(result.path)[m]
