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


class KinoResult(NamedTuple):
    path: jax.Array        # [L, 3] SE(2) path (start -> goal), padded
    path_mask: jax.Array   # [L] valid entries
    success: jax.Array     # bool
    cost: jax.Array        # g + shot length
    rounds: jax.Array


def _yaw_bins(cfg: FrontendConfig) -> int:
    return max(int(math.ceil(2.0 * math.pi / cfg.dedup_yaw_resolution)), 1)


def plan(grid: tgrid.TerrainGrid, cfg: FrontendConfig,
         start, goal, n_shot_samples: int = 64) -> KinoResult:
    """Search for an init path from start to goal (single instance; vmap
    for batches of scenarios)."""
    F = cfg.frontier_size
    R = cfg.max_rounds
    lattice = jnp.asarray(control_lattice(cfg), start.dtype)
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

    def cell_of(state):
        o = jnp.asarray(grid.origin[:2], dtype)
        ix = jnp.clip(jnp.floor((state[0] - o[0]) / dedup_res)
                      .astype(jnp.int32), 0, nx_d - 1)
        iy = jnp.clip(jnp.floor((state[1] - o[1]) / dedup_res)
                      .astype(jnp.int32), 0, ny_d - 1)
        ib = jnp.clip(jnp.floor((tgrid.normalize_so2(state[2]) + jnp.pi)
                                / cfg.dedup_yaw_resolution)
                      .astype(jnp.int32), 0, nyaw_bins - 1)
        return (ix * ny_d + iy) * nyaw_bins + ib

    def heu(state):
        return (1.0 + 1.0 / 10000) * jnp.linalg.norm(state[:2] - goal[:2])

    def arc_free(state, v, steer):
        """Collision sampling along the primitive (kino_astar.cpp:171-185)."""
        fr = (jnp.arange(1, n_col + 1, dtype=dtype) / n_col
              * cfg.time_interval)
        pts = jax.vmap(lambda t: state_transit(state, v, steer, t,
                                               cfg.wheel_base))(fr)
        occ = jax.vmap(lambda p: tgrid.is_occupancy_xy(grid, p[:2]))(pts)
        return ~jnp.any(occ)

    def try_shot(state, g):
        """Dubins connection to the goal with collision check."""
        near = jnp.linalg.norm(state[:2] - goal[:2]) < cfg.oneshot_range
        L = dubins.distance(state, goal, rho)
        ss = jnp.arange(n_shot_samples, dtype=dtype) \
            * cfg.collision_interval
        valid_s = ss <= L
        pts = dubins.sample_many(state, goal, rho, jnp.minimum(ss, L))
        occ = jax.vmap(lambda p: tgrid.is_occupancy_xy(grid, p[:2]))(pts)
        blocked = jnp.any(occ & valid_s)
        fits = L <= (n_shot_samples - 1) * cfg.collision_interval
        ok = near & ~blocked & fits
        return ok, jnp.where(ok, g + L, jnp.inf)

    # Persistent OPEN pool (batched A*): each round the best F open nodes
    # expand in parallel and their surviving children are merged back.
    # A frontier-only wavefront would discard the open backlog and die in
    # cul-de-sacs; the pool is what makes the search complete like A*.
    Pn = 8 * F

    class S(NamedTuple):
        pool_states: jax.Array   # [Pn, 3]
        pool_g: jax.Array        # [Pn]
        pool_f: jax.Array        # [Pn] inf = empty/closed
        pool_inputs: jax.Array   # [Pn, 2] arrival inputs
        pool_parent: jax.Array   # [Pn] arena id of generating parent
        best_g: jax.Array        # [n_cells]
        arena_states: jax.Array  # [arena_n, 3] expanded nodes
        arena_parent: jax.Array  # [arena_n]
        rnd: jax.Array
        shot_ok: jax.Array
        shot_cost: jax.Array
        shot_node: jax.Array     # arena id of shot origin
        done: jax.Array

    def body(s: S):
        # select best-F open nodes for expansion; they become arena nodes
        sel = jnp.argsort(s.pool_f)[:F]
        exp_states = s.pool_states[sel]
        exp_g = s.pool_g[sel]
        exp_inputs = s.pool_inputs[sel]
        exp_parents = s.pool_parent[sel]
        active = jnp.isfinite(s.pool_f[sel])
        pool_f = s.pool_f.at[sel].set(jnp.inf)  # close them

        base = 1 + s.rnd * F
        exp_ids = base + jnp.arange(F, dtype=jnp.int32)
        arena_states = jax.lax.dynamic_update_slice(
            s.arena_states, exp_states, (base, jnp.zeros((), jnp.int32)))
        arena_parent = jax.lax.dynamic_update_slice(
            s.arena_parent, jnp.where(active, exp_parents, -1), (base,))

        # one-shot attempts from the expanded set (best lane wins)
        exp_g_shot = jnp.where(active, exp_g, jnp.inf)
        oks, totals = jax.vmap(try_shot)(exp_states, exp_g_shot)
        totals = jnp.where(oks, totals, jnp.inf)
        best_lane = jnp.argmin(totals)
        better = totals[best_lane] < s.shot_cost
        shot_ok = s.shot_ok | (oks[best_lane] & better)
        shot_cost = jnp.where(better & oks[best_lane], totals[best_lane],
                              s.shot_cost)
        shot_node = jnp.where(better & oks[best_lane], exp_ids[best_lane],
                              s.shot_node)

        # expand through the control lattice
        cand = jax.vmap(lambda st: jax.vmap(
            lambda u: state_transit(st, u[0], u[1], cfg.time_interval,
                                    cfg.wheel_base))(lattice))(exp_states)
        cand = cand.reshape(F * I, 3)
        v = jnp.tile(lattice[:, 0], F)
        steer = jnp.tile(lattice[:, 1], F)
        parent_lane = jnp.repeat(jnp.arange(F), I)

        in_map = jax.vmap(lambda p: tgrid.is_in_map(grid, p))(
            cand.at[:, 2].set(jnp.clip(
                cand[:, 2], grid.origin[2] + 1e-3,
                -grid.origin[2] - 1e-3)))
        free = jax.vmap(arc_free)(exp_states[parent_lane], v, steer)
        sig = jax.vmap(lambda p: tgrid.terrain_sigma(grid, p))(cand)

        arc = v * cfg.time_interval
        dg = (cfg.weight_r2 * arc
              + cfg.weight_so2 * jnp.abs(steer) * arc
              + cfg.weight_v_change
              * jnp.abs(v - exp_inputs[parent_lane, 0])
              + cfg.weight_delta_change
              * jnp.abs(steer - exp_inputs[parent_lane, 1])
              + cfg.weight_sigma * sig)
        g_new = exp_g[parent_lane] + dg
        ok = active[parent_lane] & in_map & free
        g_new = jnp.where(ok, g_new, jnp.inf)

        # per-cell winners via scatter-min (dedup within the round and
        # against all previously accepted nodes)
        cells = jax.vmap(cell_of)(cand)
        round_best = jnp.full((n_cells,), jnp.inf, dtype).at[cells].min(g_new)
        improved = (g_new <= round_best[cells]) & \
            (g_new < s.best_g[cells] - 1e-9) & jnp.isfinite(g_new)
        first_idx = jnp.full((n_cells,), F * I, jnp.int32) \
            .at[cells].min(jnp.where(improved,
                                     jnp.arange(F * I, dtype=jnp.int32),
                                     F * I))
        winner = improved & (first_idx[cells] == jnp.arange(F * I))

        f_cand = jnp.where(winner,
                           g_new + cfg.lambda_heu * jax.vmap(heu)(cand),
                           jnp.inf)

        # merge pool (minus expanded) with winners, keep best Pn by f
        merged_f = jnp.concatenate([pool_f, f_cand])
        keep = jnp.argsort(merged_f)[:Pn]
        merged_states = jnp.concatenate([s.pool_states, cand])
        merged_g = jnp.concatenate([s.pool_g, g_new])
        merged_inputs = jnp.concatenate(
            [s.pool_inputs, jnp.stack([v, steer], axis=1)])
        merged_parent = jnp.concatenate(
            [s.pool_parent, exp_ids[parent_lane]])
        new_pool_f = merged_f[keep]
        new_pool = S(
            pool_states=merged_states[keep], pool_g=merged_g[keep],
            pool_f=new_pool_f, pool_inputs=merged_inputs[keep],
            pool_parent=merged_parent[keep],
            best_g=s.best_g, arena_states=arena_states,
            arena_parent=arena_parent, rnd=s.rnd + 1,
            shot_ok=shot_ok, shot_cost=shot_cost, shot_node=shot_node,
            done=s.done)

        # accepted candidates (kept & from the candidate part) claim best_g
        cand_keep = keep >= Pn
        claim_cells = jnp.where(cand_keep, cells[jnp.clip(keep - Pn, 0)], 0)
        claim_g = jnp.where(cand_keep,
                            merged_g[keep], jnp.inf)
        best_after = s.best_g.at[claim_cells].min(claim_g)

        rnd = s.rnd + 1
        any_open = jnp.any(jnp.isfinite(new_pool_f))
        done = shot_ok | (rnd >= R) | ~any_open
        return new_pool._replace(best_g=best_after, done=done)

    start_n = start.at[2].set(tgrid.normalize_so2(start[2]))
    # occupied-start/goal early-out (reference aborts before searching,
    # kino_astar.cpp:86-95: SE(2) occupancy at start, 2D occupancy at goal)
    feasible = ~tgrid.is_occupancy(grid, start_n) \
        & ~tgrid.is_occupancy_xy(grid, goal[:2])
    pool_states0 = jnp.broadcast_to(start_n, (Pn, 3)).copy()
    pool_g0 = jnp.full((Pn,), jnp.inf, dtype).at[0].set(0.0)
    pool_f0 = jnp.full((Pn,), jnp.inf, dtype).at[0].set(
        jnp.where(feasible, cfg.lambda_heu * heu(start_n), jnp.inf))
    best_g0 = jnp.full((n_cells,), jnp.inf, dtype).at[
        cell_of(start_n)].set(0.0)
    init = S(pool_states=pool_states0, pool_g=pool_g0, pool_f=pool_f0,
             pool_inputs=jnp.zeros((Pn, 2), dtype),
             pool_parent=jnp.zeros((Pn,), jnp.int32),
             best_g=best_g0,
             arena_states=jnp.broadcast_to(start_n, (arena_n, 3)).copy(),
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
        st = out.arena_states[jnp.maximum(node, 0)]
        valid = node >= 0
        nxt = jnp.where(valid, out.arena_parent[jnp.maximum(node, 0)], -1)
        return (nxt, valid), (st, valid)

    (_, _), (rev_states, rev_valid) = jax.lax.scan(
        back, (out.shot_node, jnp.asarray(True)), None, length=R + 1)
    # reverse into start->shot order, left-aligned
    n_valid = jnp.sum(rev_valid.astype(jnp.int32))
    idx = n_valid - 1 - jnp.arange(R + 1)
    tree_states = jnp.where((idx >= 0)[:, None],
                            rev_states[jnp.clip(idx, 0, R)], 0.0)
    tree_mask = idx >= 0

    shot_state = out.arena_states[out.shot_node]
    L = dubins.distance(shot_state, goal, rho)
    ss = jnp.arange(1, n_shot_samples + 1, dtype=dtype) \
        * cfg.collision_interval
    shot_pts = dubins.sample_many(shot_state, goal, rho,
                                  jnp.minimum(ss, L))
    shot_mask = ss <= L

    path = jnp.concatenate([tree_states, shot_pts, goal[None, :]], axis=0)
    mask = jnp.concatenate([tree_mask, shot_mask, jnp.asarray([True])])
    mask = mask & out.shot_ok
    return KinoResult(path=path, path_mask=mask, success=out.shot_ok,
                      cost=out.shot_cost, rounds=out.rnd)


def extract_path(result: KinoResult) -> np.ndarray:
    """Host-side ragged path (rows in order, masked rows dropped)."""
    m = np.asarray(result.path_mask)
    return np.asarray(result.path)[m]
