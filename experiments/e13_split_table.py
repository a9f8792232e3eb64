"""e13: split hi+lo bf16 packed table vs f32 pair table, measured on-chip.

Round-2's flat-bf16 packed table halved gather items but its ~4e-3 field
noise broke the Lewis-Overton line search (PLATFORM_NOTES.md §8b).  Round 3
replaces it with a SPLIT table: bf16 high part + bf16 residual, <=4e-6
field error.  This experiment measures, on the real TPU:

  1. time per fused cost+grad evaluation (chained scan, fresh x per step)
     at B in {1024, 4096} for exact (4-item) vs packed (2-item) lookups;
  2. a full solve_flat_compacted B=2048 wall-time + convergence comparison.

Run: python experiments/e13_split_table.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from uneven_planner_tpu import manager

cfg = scene_config("hill")
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
base = make_synthetic_grid(cfg.map, dtype=np.float32)
grid_pair = jax.device_put(tgrid.with_pair_table(base))
grid_split = jax.device_put(tgrid.with_packed_table(tgrid.with_pair_table(base)))

rng = np.random.default_rng(0)

def make_batch(B):
    x0s, bounds = [], []
    for _ in range(B):
        ang = rng.uniform(-np.pi, np.pi)
        start = rng.uniform(-3.5, -1.5, size=2)
        goal = np.clip(start + 2.5*np.array([np.cos(ang), np.sin(ang)]), -4.0, 4.0)
        yaw = np.arctan2(goal[1]-start[1], goal[0]-start[0])
        t = np.linspace(0, 1, 16)[:, None]
        path = np.concatenate([(1-t)*start + t*goal, np.full((16,1), yaw)], axis=1)
        xi, bi = manager.init_guess_fixed(path, cfg.manager, piece_xy=shape.piece_xy,
                                          piece_yaw=shape.piece_yaw)
        x0s.append(xi); bounds.append(bi)
    x0s = jnp.asarray(np.stack(x0s), jnp.float32)
    bounds = jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32), *bounds)
    return x0s, bounds

# --- 1. chained-eval timing ---------------------------------------------
def eval_chain(grid, exact, B, n_chain=64):
    x0s, bounds = make_batch(B)
    E, I = shape.equal_num, shape.non_equal_num
    duals = alm.DualState(lam=jnp.zeros((B, E), jnp.float32),
                          mu=jnp.zeros((B, I), jnp.float32),
                          rho=jnp.full((B,), cfg.alm.rho, jnp.float32))
    sc = jax.jit(lambda xs, bs, g: jax.vmap(
        lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs, bs))(x0s, bounds, grid)

    def one(x, b, d, s, g):
        f, gr = jax.value_and_grad(
            lambda xx: alm.inner_cost(xx, b, shape, g, cfg.alm, d, s, exact))(x)
        return f, gr

    def chain(xs, bs, ds, ss, g):
        def body(c, _):
            f, gr = jax.vmap(lambda x, b, d, s: one(x, b, d, s, g))(c, bs, ds, ss)
            return c - 1e-6 * gr, f
        out, fs = jax.lax.scan(body, xs, None, length=n_chain)
        return out, fs
    fn = jax.jit(chain)
    out, fs = fn(x0s, bounds, duals, sc, grid)   # warmup/compile
    np.asarray(fs)
    x2, bounds2 = make_batch(B)
    t0 = time.time()
    out, fs = fn(x2, bounds2, duals, sc, grid)
    np.asarray(fs)
    dt = time.time() - t0
    return dt / n_chain

for B in (1024, 4096):
    t_pair = eval_chain(grid_pair, True, B)
    t_split = eval_chain(grid_split, False, B)
    print(f"B={B}: eval pair(4-item)={t_pair*1e3:.2f} ms  "
          f"split(2-item)={t_split*1e3:.2f} ms  speedup={t_pair/t_split:.2f}x")

# --- 2. full solve comparison -------------------------------------------
def full_solve(grid, B=2048):
    x0s, bounds = make_batch(B)
    overrides = {"mem_size": 16, "max_iterations": 30}
    res = alm.solve_flat_compacted(x0s, bounds, shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides, chunk_steps=128,
                                   buckets=(1, 4, 16), max_dispatch=4096)
    np.asarray(res.converged)   # warm compile for this width
    x2, b2 = make_batch(B)
    t0 = time.time()
    res = alm.solve_flat_compacted(x2, b2, shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides, chunk_steps=128,
                                   buckets=(1, 4, 16), max_dispatch=4096)
    conv = np.asarray(res.converged)
    dt = time.time() - t0
    return dt, conv.mean(), np.asarray(res.inner_iters).mean()

dt_p, conv_p, ii_p = full_solve(grid_pair)
print(f"solve pair : {dt_p:.1f}s conv={conv_p*100:.1f}% inner_iters={ii_p:.0f} -> {2048/dt_p:.1f} solves/s")
dt_s, conv_s, ii_s = full_solve(grid_split)
print(f"solve split: {dt_s:.1f}s conv={conv_s*100:.1f}% inner_iters={ii_s:.0f} -> {2048/dt_s:.1f} solves/s")
