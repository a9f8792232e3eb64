"""e28 (round 5): f16 packed-table A/B — eval cost and line-search health.

e27: the XLA gather unit moves 12-wide items at ~24.4 ns and (expected)
<=8-wide items at ~7-13 ns, layout-invariant.  The f16 table
(grid.with_packed_f16) re-packs the 12 corner values as f16 pairs into
6-word items: 2 items/lookup hi-only (field error ~2.5e-4, amplified to
<=4e-3 through the 7-tuple) or 4 items exact (~2e-7).

Measured here, same session:
  1. chained raw value_and_grad cost at w2048 for
     {packed12 (control), f16-hi, f16-exact};
  2. full cold solves at w512 (no width inflation) for each variant:
     evals/lane, convergence, and an EXACT residual recheck of the
     claimed converged flags (the f16-hi termination risk: residuals
     measured on a ~4e-3-noisy field against epsilon_con=1e-3).
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
base = make_synthetic_grid(cfg.map, dtype=np.float32)
gpair = tgrid.with_pair_table(base)
grids = {
    "packed12": jax.device_put(tgrid.with_packed_table(gpair)),
    "f16hi": jax.device_put(tgrid.with_packed_f16(gpair)),
}
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
N_EVALS = 32


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


duals = alm.DualState(lam=jnp.zeros((shape.equal_num,), jnp.float32),
                      mu=jnp.zeros((shape.non_equal_num,), jnp.float32),
                      rho=jnp.asarray(1.0, jnp.float32))


def chain_cost(g):
    def one(x, b, sc):
        def body(c, _):
            x, acc = c
            f, gr = jax.value_and_grad(
                lambda x_: alm.inner_cost(x_, b, shape, g, cfg.alm,
                                          duals, sc, False))(x)
            return (x + 1e-6 * gr, acc + f), None
        (xo, acc), _ = jax.lax.scan(body, (x, 0.0), None, length=N_EVALS)
        return acc
    return jax.jit(lambda xs, bs, scs: jax.vmap(one)(xs, bs, scs).sum())


W = 2048
xs, bs = make_batch(W)
for name, g in grids.items():
    scs = jax.jit(lambda xs_, bs_, g_: jax.vmap(
        lambda x, b: alm._make_scaling(x, b, shape, g_, cfg.alm))(
        xs_, bs_))(xs, bs, g)
    c = chain_cost(g)
    float(c(xs, bs, scs))
    t0 = time.time()
    for _ in range(3):
        float(c(xs, bs, scs))
    dt = (time.time() - t0) / 3 / N_EVALS
    print(f"evalcost {name:9s} W={W} eval={dt*1e3:7.2f}ms "
          f"({dt/W*1e6:6.3f} us/lane)", flush=True)

# -------- full cold solves at w512: evals + convergence + exact recheck
B = 1024
for name, g in grids.items():
    xs2, bs2 = make_batch(B)
    res = alm.solve_flat_compacted(
        xs2, bs2, shape, g, cfg.alm,
        lbfgs_overrides={"mem_size": 16, "max_iterations": 30},
        chunk_steps=128, buckets=(1, 4, 16), max_dispatch=512,
        return_duals=True)
    conv = np.asarray(res.converged)
    ev = np.asarray(res.evals)
    # exact residual recheck on the f32 pair table
    sc = jax.jit(lambda xs_, bs_, g_: jax.vmap(
        lambda x, b: alm._make_scaling(x, b, shape, g_, cfg.alm))(
        xs_, bs_))(xs2, bs2, g)
    rh, rg = jax.jit(lambda xr, bsr, dl, scr, g_: jax.vmap(
        lambda x, b, d_, s_: alm.exact_residuals(
            x, d_, b, shape, g_, cfg.alm, s_))(xr, bsr, dl, scr))(
        res.x, bs2, res.duals, sc, g)
    exact_ok = np.maximum(np.asarray(rh), np.asarray(rg)) \
        < cfg.alm.epsilon_con
    false_pos = (conv & ~exact_ok).mean()
    print(f"solve {name:9s} B={B} w512 conv={conv.mean()*100:5.1f}% "
          f"evals mean={ev.mean():6.1f} p95={np.percentile(ev, 95):5.0f} "
          f"exact_ok={exact_ok.mean()*100:5.1f}% "
          f"false_conv={false_pos*100:4.2f}%", flush=True)
