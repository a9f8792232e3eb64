"""Bisect the width-dependent numeric divergence.

Same 4096 lanes, compare at widths 512 (sliced) vs 4096:
  1. init_scaling outputs
  2. one value_and_grad(inner_cost_aux) eval (f, grad, h, g)
  3. flat_run 8 steps from identical states (x, f, evals)
"""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses
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
from bench import make_batch

cfg = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
B = 4096
rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg, shape, rng)
p = alm.lbfgs_params_from(cfg.alm)
p = dataclasses.replace(p, mem_size=16, max_iterations=30)


def sliced(fn, width, *args):
    outs = []
    for lo in range(0, B, width):
        sl = slice(lo, lo + width)
        outs.append(fn(*jax.tree.map(lambda a: a[sl], args)))
    return jax.tree.map(lambda *a: jnp.concatenate(a), *outs)


def cmp(name, a, b):
    for f in a._fields if hasattr(a, "_fields") else []:
        pass
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    worst = 0.0
    for x, y in zip(la, lb):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        if x.dtype == bool or not np.issubdtype(x.dtype, np.floating):
            d = float((x != y).mean())
        else:
            with np.errstate(invalid="ignore"):
                d = float(np.nanmax(np.abs(x - y) /
                                    (np.maximum(np.abs(x), 1.0))))
        worst = max(worst, d)
    print(f"{name}: worst rel diff {worst:.3e}", flush=True)
    return worst


# --- 1. scaling
mk_scal = jax.jit(lambda xs, bs, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs, bs))
sc_w = mk_scal(x0s, bounds, grid)
sc_n = sliced(lambda xs, bs: mk_scal(xs, bs, grid), 512, x0s, bounds)
cmp("init_scaling", jax.tree.map(np.asarray, sc_w),
    jax.tree.map(np.asarray, sc_n))

# --- 2. one eval (use the narrow scaling for both so only the eval varies)
duals0 = alm.DualState(
    lam=jnp.zeros((B, shape.equal_num), jnp.float32),
    mu=jnp.zeros((B, shape.non_equal_num), jnp.float32),
    rho=jnp.full((B,), cfg.alm.rho, jnp.float32))
ev = jax.jit(lambda xs, bs, ds, ss, g: jax.vmap(
    lambda x, b, d, s: jax.value_and_grad(alm.inner_cost_aux, has_aux=True)(
        x, b, shape, g, cfg.alm, d, s, False))(xs, bs, ds, ss))
e_w = ev(x0s, bounds, duals0, sc_n, grid)
e_n = sliced(lambda xs, bs, ds, ss: ev(xs, bs, ds, ss, grid), 512,
             x0s, bounds, duals0, sc_n)
cmp("eval f/aux/grad", jax.tree.map(np.asarray, e_w),
    jax.tree.map(np.asarray, e_n))

# --- 3. 8 flat steps
init = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))(x0s)
run8 = jax.jit(lambda st, bd, sc, g: jax.vmap(
    lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm, p, 8))(
    st, bd, sc))
s_w = run8(init, bounds, sc_n, grid)
s_n = sliced(lambda st, bd, sc: run8(st, bd, sc, grid), 512,
             init, bounds, sc_n)
for field in ("x", "f", "g", "stp", "evals", "k", "lb_status"):
    cmp(f"flat8.{field}", np.asarray(getattr(s_w, field)),
        np.asarray(getattr(s_n, field)))

# --- 3b. 64 flat steps
run64 = jax.jit(lambda st, bd, sc, g: jax.vmap(
    lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm, p, 64))(
    st, bd, sc))
s_w = run64(init, bounds, sc_n, grid)
s_n = sliced(lambda st, bd, sc: run64(st, bd, sc, grid), 512,
             init, bounds, sc_n)
for field in ("x", "f", "evals", "lb_status"):
    cmp(f"flat64.{field}", np.asarray(getattr(s_w, field)),
        np.asarray(getattr(s_n, field)))
