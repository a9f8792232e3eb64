"""e15: scheduling-waste accounting for the compacted driver, today.

e13/e14b establish today's cost model: ~24 ms per dispatch, ~4.7 us/lane
per eval at width 4096, in-loop per-eval kernel floor ~9 ms.  Mean lane
needs ~100-130 accepted steps but the B=4096 bench pays ~1250 eval-steps
of wall time — this experiment logs the live-width trajectory per chunk
round and the per-round wall time to locate the waste (within-chunk
retirement lag vs bucket rounding vs straggler tail), then sweeps
chunk_steps and bucket density.
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
grid = jax.device_put(tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
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
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32), *bounds))

B = 4096
ov = {"mem_size": 16, "max_iterations": 30}

# --- instrumented single run: replicate the driver loop with logging -----
x0s, bounds = make_batch(B)
p = alm.lbfgs_params_from(cfg.alm)
import dataclasses as dc
p = dc.replace(p, **ov)
scalings = jax.jit(lambda xs, bs, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs, bs))(x0s, bounds, grid)
states = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))(x0s)

chunk = 128
buckets_sizes = sorted({max(1, B // b) for b in (1, 4, 16)} | {B}, reverse=True)
run_fns, take_fns = {}, {}
def get_run(n):
    if n not in run_fns:
        run_fns[n] = jax.jit(lambda st, bd, sc, g: jax.vmap(
            lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm, p, chunk))(st, bd, sc))
    return run_fns[n]
def get_take(key):
    if key not in take_fns:
        take_fns[key] = jax.jit(lambda tree, ii: jax.tree.map(lambda a: a[ii], tree))
    return take_fns[key]

idx = np.arange(B); cur = (states, bounds, scalings); cur_size = B
# warm compile every bucket size once (rough warmup: full run)
print("warmup...")
_ = alm.solve_flat_compacted(x0s, bounds, shape, grid, cfg.alm, lbfgs_overrides=ov,
                             chunk_steps=chunk, buckets=(1,4,16), max_dispatch=4096)
x0s, bounds = make_batch(B)
scalings = jax.jit(lambda xs, bs, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs, bs))(x0s, bounds, grid)
states = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))(x0s)
cur = (states, bounds, scalings); idx = np.arange(B); cur_size = B
t_total0 = time.time(); rounds = 0; evals_paid = 0
while True:
    nlive = len(idx)
    t0 = time.time()
    out = get_run(cur_size)(cur[0], cur[1], cur[2], grid)
    done = np.asarray(out.done)[:nlive]
    dt = time.time() - t0
    rounds += 1; evals_paid += cur_size * chunk
    print(f"round {rounds}: width={cur_size} live={nlive} done_now={done.sum()} "
          f"wall={dt*1e3:.0f}ms ({dt/chunk*1e3:.1f} ms/eval)")
    still = np.nonzero(~done)[0]
    if still.size == 0: break
    to_size = min([s for s in buckets_sizes if s >= still.size], default=buckets_sizes[0])
    pad = np.zeros(to_size - still.size, np.int32)
    ii = jnp.asarray(np.concatenate([still.astype(np.int32), pad]))
    nxt = get_take((cur_size, to_size))((out, cur[1], cur[2]), ii)
    cur = nxt; idx = idx[still]; cur_size = to_size
t_total = time.time() - t_total0
print(f"total {t_total:.1f}s  evals_paid={evals_paid}  -> {B/t_total:.1f} solves/s")
