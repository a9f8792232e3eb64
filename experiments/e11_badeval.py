"""Evaluate the failing lanes' exact line-search points at widths 4096 vs 64.

If f(x + stp*d) is inf/NaN at width 4096 but finite at width 64 for the SAME
inputs, the fused eval itself is width-dependent on extreme inputs (e8 only
checked benign x0-neighborhood inputs).  Then bisect the sub-op.
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

cfg = scene_config("hill").alm
cfg0 = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg0.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
B = 4096
rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg0, shape, rng)
p = dataclasses.replace(alm.lbfgs_params_from(cfg),
                        mem_size=16, max_iterations=30)

sc = jax.jit(lambda xs, bs, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg))(xs, bs))(
    x0s, bounds, grid)
st = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg, p)))(x0s)
runf = jax.jit(lambda st, bd, sc, g: jax.vmap(
    lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg, p, 128))(
    st, bd, sc))
for r in range(24):
    st = runf(st, bounds, sc, grid)
    if np.asarray(st.done).all():
        break
stn = jax.tree.map(np.asarray, st)
conv = np.maximum(stn.res_h, stn.res_g) < cfg.epsilon_con
bad = np.nonzero(~conv)[0]
print(f"solve done: conv={conv.mean()*100:.2f}%  bad={bad.size}", flush=True)
assert bad.size > 0

# Evaluate f at the reverted iterate x (accepted point!) and at x + stp*d
# for ALL lanes, at width 4096 and width 64, same inputs.
x_t = stn.x + stn.stp[:, None] * stn.d

ev = jax.jit(lambda xs, bs, ds, ss, g: jax.vmap(
    lambda x, b, d, s: alm.inner_cost(x, b, shape, g, cfg, d, s, False))(
    xs, bs, ds, ss))

duals = alm.DualState(lam=jnp.asarray(stn.duals.lam),
                      mu=jnp.asarray(stn.duals.mu),
                      rho=jnp.asarray(stn.duals.rho))
xs_t = jnp.asarray(x_t)

f_wide = np.asarray(ev(xs_t, bounds, duals, sc, grid))

f_narrow = np.empty(B, np.float32)
W = 64
evn = jax.jit(lambda xs, bs, ds, ss, g: jax.vmap(
    lambda x, b, d, s: alm.inner_cost(x, b, shape, g, cfg, d, s, False))(
    xs, bs, ds, ss))
for lo in range(0, B, W):
    sl = slice(lo, lo + W)
    f_narrow[sl] = np.asarray(evn(
        xs_t[sl], jax.tree.map(lambda a: a[sl], bounds),
        jax.tree.map(lambda a: a[sl], duals),
        jax.tree.map(lambda a: a[sl], sc), grid))

bw = ~np.isfinite(f_wide)
bn = ~np.isfinite(f_narrow)
print(f"nonfinite f at wide: {bw.sum()}  at narrow: {bn.sum()}  "
      f"wide-only: {(bw & ~bn).sum()}", flush=True)
diff = np.abs(f_wide - f_narrow)
fin = np.isfinite(f_wide) & np.isfinite(f_narrow)
print(f"finite-lane |f diff|: max={diff[fin].max():.3e}  "
      f"rel={np.max(diff[fin] / np.maximum(np.abs(f_wide[fin]), 1.0)):.3e}",
      flush=True)
print("bad-lane f wide  :", f_wide[bad[:8]], flush=True)
print("bad-lane f narrow:", f_narrow[bad[:8]], flush=True)
print("bad-lane stp:", stn.stp[bad[:8]], " |d|:",
      np.abs(stn.d[bad[:8]]).max(axis=1), " |x|:",
      np.abs(stn.x[bad[:8]]).max(axis=1), flush=True)
np.save("/tmp/bad_xt.npy", x_t[bad])
np.save("/tmp/bad_idx.npy", bad)
