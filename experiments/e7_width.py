"""Isolate width-dependent solver failures on current code.

B=4096 scenarios solved via bounded flat_run chunks (no compaction):
  1. at width 4096            -> conv%
  2. at width 512 (8 slices)  -> conv%
  3. failing lanes from (1) re-solved at width 64
  4. a few failing lanes vs the nested reference solver (alm.solve)
"""
import sys
import time

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
CHUNK = 128
ROUNDS = 12

run_fns = {}


def solve_width(idx_sel, width):
    """Solve the selected lanes in slices of `width` (pad by repeat)."""
    n = len(idx_sel)
    outs = []
    for lo in range(0, n, width):
        sel = idx_sel[lo:lo + width]
        pad = np.concatenate([sel, np.full(width - len(sel), sel[0])])[:width]
        ii = jnp.asarray(pad.astype(np.int32))
        xs = x0s[ii]
        bs = jax.tree.map(lambda a: a[ii], bounds)
        if width not in run_fns:
            def make(width):
                def fn(xs, bs, g):
                    sc = jax.vmap(lambda x, b: alm._make_scaling(
                        x, b, shape, g, cfg.alm))(xs, bs)
                    st = jax.vmap(lambda x: alm.flat_init(
                        x, shape, cfg.alm, p))(xs)
                    return st, sc
                init = jax.jit(fn)
                run = jax.jit(lambda st, bd, sc, g: jax.vmap(
                    lambda s_, b_, c_: alm.flat_run(
                        s_, b_, c_, shape, g, cfg.alm, p, CHUNK))(st, bd, sc))
                return init, run
            run_fns[width] = make(width)
        init, run = run_fns[width]
        st, sc = init(xs, bs, grid)
        for r in range(ROUNDS):
            st = run(st, bs, sc, grid)
            if np.asarray(st.done).all():
                break
        outs.append(jax.tree.map(np.asarray, st)._replace())
    cat = jax.tree.map(lambda *a: np.concatenate(a), *outs)
    return jax.tree.map(lambda a: a[:n] if a.ndim else a, cat)


t0 = time.time()
idx_all = np.arange(B)
st4k = solve_width(idx_all, 4096)
conv4k = np.maximum(st4k.res_h, st4k.res_g) < cfg.alm.epsilon_con
print(f"w4096: conv={conv4k.mean()*100:.2f}% evals={st4k.evals.mean():.0f} "
      f"({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
st512 = solve_width(idx_all, 512)
conv512 = np.maximum(st512.res_h, st512.res_g) < cfg.alm.epsilon_con
print(f"w512 : conv={conv512.mean()*100:.2f}% evals={st512.evals.mean():.0f} "
      f"({time.time()-t0:.0f}s)", flush=True)
print(f"conv@512 & ~conv@4096: {(conv512 & ~conv4k).sum()}  "
      f"conv@4096 & ~conv@512: {(conv4k & ~conv512).sum()}", flush=True)

bad = np.nonzero(~conv4k)[0]
if bad.size:
    st64 = solve_width(bad, 64)
    conv64 = np.maximum(st64.res_h, st64.res_g) < cfg.alm.epsilon_con
    print(f"failing@4096 re-solved @64: conv={conv64.mean()*100:.2f}% "
          f"of {bad.size}", flush=True)

    # ground truth on 4 failing lanes via the nested solver
    take = bad[:4]
    ii = jnp.asarray(take.astype(np.int32))
    ref = jax.jit(jax.vmap(lambda x, b: alm.solve(
        x, b, shape, grid, cfg.alm,
        lbfgs_overrides={"mem_size": 16, "max_iterations": 30})))(
        x0s[ii], jax.tree.map(lambda a: a[ii], bounds))
    print("nested solve on 4 failing lanes: conv=",
          np.asarray(ref.converged), "res_h=", np.asarray(ref.res_h),
          "res_g=", np.asarray(ref.res_g), flush=True)
