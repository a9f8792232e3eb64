"""Eval-cost breakdown + evals/solve stats on the real TPU.

1. Time one batched value_and_grad(inner_cost) at B=4096 (the solver's unit
   of work), with fresh x per rep.
2. Same with the terrain lookup replaced by an analytic stand-in (no gather)
   -> isolates the gather share.
3. Run one compacted solve batch and report the evals/lane distribution.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

sys.path.insert(0, "/root/repo/experiments")
from importlib import import_module

B = int(os.environ.get("B", "4096"))
cfg = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)

from bench import make_batch  # reuse scenario generator
sys.path.insert(0, "/root/repo")

rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg, shape, rng)

duals = alm.DualState(
    lam=jnp.zeros((B, shape.equal_num), jnp.float32),
    mu=jnp.zeros((B, shape.non_equal_num), jnp.float32),
    rho=jnp.full((B,), cfg.alm.rho, jnp.float32))
scaling = alm.Scaling(
    scale_fx=jnp.ones((B,), jnp.float32),
    scale_cx=jnp.broadcast_to(
        alm.default_scale_cx(shape, cfg.alm, jnp.float32),
        (B, 7, shape.equal_num)))


def eval_batch(xs, bounds, duals, scaling, grid):
    def one(x, b, d, s):
        (f, _), g = jax.value_and_grad(alm.inner_cost_aux, has_aux=True)(
            x, b, shape, grid, cfg.alm, d, s)
        return f, g
    return jax.vmap(one)(xs, bounds, duals, scaling)


jf = jax.jit(eval_batch)

print(f"=== 1: full eval at B={B} ===")
xs_list = [x0s + 0.001 * i for i in range(5)]
out = jf(xs_list[0], bounds, duals, scaling, grid)
jax.block_until_ready(out)
ts = []
for i in range(1, 5):
    t0 = time.perf_counter()
    out = jf(xs_list[i], bounds, duals, scaling, grid)
    np.asarray(out[0])
    ts.append(time.perf_counter() - t0)
dt = float(np.median(ts))
print(f"eval+grad: {dt*1e3:.2f} ms -> {dt/B*1e6:.2f} us/lane")

print("=== 2: eval with analytic terrain (no gather) ===")
# monkeypatch the terrain-variable lookup with pure math of same flop order
orig = tgrid.get_terrain_variables_cm

def fake_tv(grid_, px, py, yaw):
    sig = 0.01 * (jnp.sin(3 * px) * jnp.cos(2 * py) + 1.0)
    zb0 = 0.05 * jnp.sin(px + yaw)
    zb1 = 0.05 * jnp.cos(py)
    c = jnp.sqrt(jnp.maximum(1.0 - zb0 ** 2 - zb1 ** 2, 1e-12))
    inv_c = 1.0 / c
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    t = cy * zb0 + sy * zb1
    s = sy * zb0 - cy * zb1
    sq = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    return jnp.stack([1.0 / sq, -c * t / sq, sq * inv_c, s / sq, c, inv_c,
                      sig])

tgrid.get_terrain_variables_cm = fake_tv
jf2 = jax.jit(eval_batch)
out = jf2(xs_list[0], bounds, duals, scaling, grid)
jax.block_until_ready(out)
ts = []
for i in range(1, 5):
    t0 = time.perf_counter()
    out = jf2(xs_list[i], bounds, duals, scaling, grid)
    np.asarray(out[0])
    ts.append(time.perf_counter() - t0)
dt2 = float(np.median(ts))
print(f"eval+grad (no gather): {dt2*1e3:.2f} ms -> {dt2/B*1e6:.2f} us/lane")
tgrid.get_terrain_variables_cm = orig

print("=== 3: evals/solve stats ===")
res = alm.solve_flat_compacted(
    x0s, bounds, shape, grid, cfg.alm,
    lbfgs_overrides={"mem_size": 16, "max_iterations": 30},
    chunk_steps=128, buckets=(1, 4, 16), max_dispatch=4096)
inner = np.asarray(res.inner_iters)
outer = np.asarray(res.outer_iters)
conv = np.asarray(res.converged)
print(f"converged: {conv.mean()*100:.1f}%")
print(f"inner iters: mean={inner.mean():.0f} p50={np.percentile(inner,50):.0f} "
      f"p90={np.percentile(inner,90):.0f} p99={np.percentile(inner,99):.0f} "
      f"max={inner.max()}")
print(f"outer iters: mean={outer.mean():.2f} p90={np.percentile(outer,90):.0f} "
      f"max={outer.max()}")
