"""Does outer-round headroom fix wide-width convergence?

Width 4096, no compaction, generous eval budget (20x128):
  (a) ALM max_iter=10 (reference cap)   -> conv%, failing-lane stats
  (b) ALM max_iter=16                   -> conv%
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
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg0.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
B = 4096
rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg0, shape, rng)


def run(max_outer):
    cfg = dataclasses.replace(cfg0.alm, max_iter=max_outer)
    p = dataclasses.replace(alm.lbfgs_params_from(cfg),
                            mem_size=16, max_iterations=30)
    sc = jax.jit(lambda xs, bs, g: jax.vmap(
        lambda x, b: alm._make_scaling(x, b, shape, g, cfg))(xs, bs))(
        x0s, bounds, grid)
    st = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg, p)))(x0s)
    runf = jax.jit(lambda st, bd, sc, g: jax.vmap(
        lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg, p,
                                        128))(st, bd, sc))
    import time
    t0 = time.time()
    for r in range(24):
        st = runf(st, bounds, sc, grid)
        if np.asarray(st.done).all():
            break
    st = jax.tree.map(np.asarray, st)
    conv = np.maximum(st.res_h, st.res_g) < cfg.epsilon_con
    bad = ~conv
    print(f"max_outer={max_outer}: conv={conv.mean()*100:.2f}% "
          f"({time.time()-t0:.0f}s, rounds used {r+1})", flush=True)
    if bad.any():
        import collections
        print("  failing:", bad.sum(),
              " o_it:", collections.Counter(st.o_it[bad].tolist()),
              flush=True)
        print("  lb_status:", collections.Counter(
            st.lb_status[bad].tolist()), flush=True)
        rh, rg = st.res_h[bad], st.res_g[bad]
        print(f"  res max of (h,g): p50={np.percentile(np.maximum(rh,rg),50):.2e} "
              f"p90={np.percentile(np.maximum(rh,rg),90):.2e} "
              f"max={np.maximum(rh,rg).max():.2e}", flush=True)
    return conv


c10 = run(10)
c16 = run(16)
print("fixed by headroom:", int((~c10).sum() - (~c16).sum()), flush=True)
