"""Per-step trace of failing lanes at width 4096 vs width 64.

Solve at 4096, find failing lanes, restart them from their final state
(warm duals) and record (f_t, stp, |d|, lb_status, evals) per flat_step for
40 steps — at width 4096 (embedded in the full batch) and width 64 (bad
lanes only).  Print the traces of the first failing lane side by side.
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

cfg0 = scene_config("hill")
cfg = cfg0.alm
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
print(f"conv={conv.mean()*100:.2f}% bad={bad.size}", flush=True)

# fresh L-BFGS from final x with final duals
fresh = jax.jit(jax.vmap(lambda x, d: alm.flat_init(
    x, shape, cfg, p)._replace(duals=d)))(jnp.asarray(stn.x),
                                          jax.tree.map(jnp.asarray,
                                                       stn.duals))


def step_traced(width, states, bds, scs):
    one = jax.jit(lambda st, bd, sc, g: jax.vmap(
        lambda s_, b_, c_: alm.flat_step(s_, b_, c_, shape, g, cfg, p))(
        st, bd, sc))
    recs = []
    s = states
    for k in range(40):
        s = one(s, bds, scs, grid)
        recs.append((np.asarray(s.f), np.asarray(s.stp),
                     np.abs(np.asarray(s.d)).max(axis=1),
                     np.asarray(s.lb_status), np.asarray(s.evals),
                     np.asarray(s.o_it)))
    return recs


trace_w = step_traced(4096, fresh, bounds, sc)
sel = bad[:64]
ii = jnp.asarray(sel.astype(np.int32))
trace_n = step_traced(
    64, jax.tree.map(lambda a: a[ii], fresh),
    jax.tree.map(lambda a: a[ii], bounds),
    jax.tree.map(lambda a: a[ii], sc))

lane = bad[0]
print(f"lane {lane}: |x|={np.abs(stn.x[lane]).max():.3f} "
      f"rho={stn.duals.rho[lane]:.1f}", flush=True)
print(" k |     f_wide     stp_w   |d|_w  st_w |     f_nar      stp_n  "
      " |d|_n  st_n", flush=True)
for k in range(40):
    fw, sw, dw, lw, _, _ = trace_w[k]
    fn, sn, dn, ln, _, _ = trace_n[k]
    print(f"{k:2d} | {fw[lane]:12.5e} {sw[lane]:9.3e} {dw[lane]:8.2e} "
          f"{lw[lane]:3d} | {fn[0]:12.5e} {sn[0]:9.3e} {dn[0]:8.2e} "
          f"{ln[0]:3d}", flush=True)

# how many of the bad lanes converge in the narrow restart?
last_n = trace_n[-1]
last_w = trace_w[-1]
print("bad-lane status after 40 narrow steps:",
      np.unique(last_n[3][:len(sel)], return_counts=True), flush=True)
print("bad-lane status after 40 wide steps:",
      np.unique(last_w[3][sel], return_counts=True), flush=True)
