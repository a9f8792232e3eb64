"""Chained-eval timing: N back-to-back evals on device, one scalar pull.

Sweeps batch width to see whether the fused eval is latency-bound or
compute-bound, and isolates the tunnel-pull cost from e2's numbers.
"""
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

sys.path.insert(0, "/root/repo")
from bench import make_batch

cfg = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
CHAIN = 16

for B in [512, 1024, 2048, 4096, 8192]:
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

    def chained(xs, bounds, duals, scaling, grid):
        def one_eval(x, b, d, s):
            (f, _), g = jax.value_and_grad(alm.inner_cost_aux, has_aux=True)(
                x, b, shape, grid, cfg.alm, d, s)
            return f, g

        def step(xs, _):
            f, g = jax.vmap(one_eval)(xs, bounds, duals, scaling)
            xs = xs - 1e-6 * g
            return xs, jnp.sum(f)

        xs, fs = jax.lax.scan(step, xs, None, length=CHAIN)
        return jnp.sum(fs)

    jf = jax.jit(chained)
    seeds = [x0s + 1e-3 * i for i in range(4)]
    out = jf(seeds[0], bounds, duals, scaling, grid)
    jax.block_until_ready(out)
    ts = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        out = jf(seeds[i], bounds, duals, scaling, grid)
        float(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / CHAIN
    print(f"B={B:6d}: {dt*1e3:8.3f} ms/eval  {dt/B*1e6:8.3f} us/lane",
          flush=True)
