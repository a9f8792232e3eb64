"""e22 (round 4): flat_step overhead — the new wall.

e21 measured the RAW fused cost+grad eval at 4.5 us/lane (K8/packed,
w2048) with a ~0.5 ms dispatch floor, yet the production solver pays
~33 us/lane-eval (e20: 14.7 s for 4096 lanes x ~110 evals).  ~85% of the
solver's wall is therefore flat_step bookkeeping, with the two-loop
recursion (2*m fori iterations, each dispatching dynamic-slice + dot
kernels inside the vmapped while_loop) the prime suspect.

Measures chained flat_run wall per eval at w2048, K8/packed for
{mem16, mem8} x {fori, unrolled}, then re-runs the full warm production
solve with the winner.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu.solver import alm, lbfgs
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from uneven_planner_tpu import manager
import dataclasses

cfg = scene_config("hill")
base = make_synthetic_grid(cfg.map, dtype=np.float32)
grid = jax.device_put(tgrid.with_packed_table(tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
W = int(os.environ.get("E22_W", "2048"))
N_STEPS = 128  # matches chunk_steps=128: reuses the e20-cached programs


def make_batch(B):
    x0s, bounds = [], []
    for _ in range(B):
        ang = rng.uniform(-np.pi, np.pi)
        start = rng.uniform(-3.5, -1.5, size=2)
        goal = np.clip(start + 2.5*np.array([np.cos(ang), np.sin(ang)]),
                       -4.0, 4.0)
        yaw = np.arctan2(goal[1]-start[1], goal[0]-start[0])
        t = np.linspace(0, 1, 16)[:, None]
        path = np.concatenate([(1-t)*start + t*goal,
                               np.full((16, 1), yaw)], axis=1)
        xi, bi = manager.init_guess_fixed(path, cfg.manager, 10, 20)
        x0s.append(xi); bounds.append(bi)
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))


def step_cost(mem, unroll):
    ovr = {"mem_size": mem, "max_iterations": 30,
           "two_loop_unroll": unroll}
    p = alm.lbfgs_params_from(cfg.alm)
    p = dataclasses.replace(p, **ovr)
    xs, bs = make_batch(W)
    scs = jax.jit(lambda xs_, bs_, g_: jax.vmap(
        lambda x, b: alm._make_scaling(x, b, shape, g_, cfg.alm))(
        xs_, bs_))(xs, bs, grid)
    sts = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))(
        xs)

    run = jax.jit(lambda st, bd, sc, g: jax.vmap(
        lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm, p,
                                        N_STEPS))(st, bd, sc))
    out = run(sts, bs, scs, grid)
    _ = np.asarray(out.evals)  # compile+warm (fresh states below re-time)
    xs2, bs2 = make_batch(W)
    scs2 = jax.jit(lambda xs_, bs_, g_: jax.vmap(
        lambda x, b: alm._make_scaling(x, b, shape, g_, cfg.alm))(
        xs_, bs_))(xs2, bs2, grid)
    sts2 = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm,
                                                    p)))(xs2)
    t0 = time.time()
    out = run(sts2, bs2, scs2, grid)
    ev = np.asarray(out.evals)
    dt = time.time() - t0
    per_eval = dt / N_STEPS
    print(f"mem={mem:2d} unroll={int(unroll)} flat_run {N_STEPS} steps: "
          f"{dt:6.2f}s  step={per_eval*1e3:7.2f}ms "
          f"({per_eval/W*1e6:6.2f} us/lane)", flush=True)


# mem8 dropped: every (mem, unroll) variant is a fresh ~20-min remote
# compile on this tunnel; the candidate is the unroll knob at the
# production mem_size.
for unroll in (False, True):
    step_cost(16, unroll)

# full warm production solve with the best knob (unroll on)
overrides = {"mem_size": 16, "max_iterations": 30, "two_loop_unroll": True}
B = 4096


def harvest():
    pb = make_batch(512)
    res = alm.solve_flat_compacted(pb[0], pb[1], shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides,
                                   chunk_steps=128, buckets=(1, 4, 16),
                                   max_dispatch=W, return_duals=True)
    conv = np.asarray(res.converged)
    return alm.DualState(
        lam=jnp.asarray(np.asarray(res.duals.lam)[conv].mean(0)),
        mu=jnp.asarray(np.asarray(res.duals.mu)[conv].mean(0)),
        rho=jnp.asarray(float(np.median(np.asarray(res.duals.rho)[conv])),
                        jnp.float32))


wd = harvest()
wb = make_batch(B)
alm.solve_flat_compacted(wb[0], wb[1], shape, grid, cfg.alm,
                         lbfgs_overrides=overrides, chunk_steps=128,
                         buckets=(1, 4, 16), max_dispatch=W, warm_duals=wd)
tb = make_batch(B)
t0 = time.time()
res = alm.solve_flat_compacted(tb[0], tb[1], shape, grid, cfg.alm,
                               lbfgs_overrides=overrides, chunk_steps=128,
                               buckets=(1, 4, 16), max_dispatch=W,
                               warm_duals=wd)
conv = np.asarray(res.converged)
dt = time.time() - t0
ev = np.asarray(res.evals)
print(f"K8,packed,w{W},c128,warm,UNROLL  wall={dt:6.1f}s "
      f"solves/s={B/dt:7.1f} conv={conv.mean()*100:5.1f}% "
      f"evals mean={ev.mean():6.1f} p95={np.percentile(ev, 95):6.0f}",
      flush=True)
