"""e18: noise-tolerant Armijo slack vs eval inflation at wide width.

e17 quantifies wide-batch eval inflation (PLATFORM_NOTES §7: compile-
variant numerics at width>=4096 churn the Lewis-Overton bracketing).
This sweeps LBFGSParams.f_noise_rel at width 4096 on the same workload,
recording evals/lane, convergence, wall, and solution quality (residual
distribution must stay below epsilon_con and match slack=0 within the
ALM tolerance — the slack must only absorb eval noise, not degrade
optima).
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
grid = jax.device_put(tgrid.with_pair_table(
    make_synthetic_grid(cfg.map, dtype=np.float32)))
rng = np.random.default_rng(0)
B = 4096
WIDTH = int(os.environ.get("E18_WIDTH", "4096"))

def make_batch():
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
        xi, bi = manager.init_guess_fixed(path, cfg.manager,
                                          piece_xy=shape.piece_xy,
                                          piece_yaw=shape.piece_yaw)
        x0s.append(xi); bounds.append(bi)
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))

slacks = [float(s) for s in os.environ.get(
    "E18_SLACKS", "0,1e-7,1e-6,1e-5").split(",")]

for slack in slacks:
    overrides = {"mem_size": 16, "max_iterations": 30, "f_noise_rel": slack}
    wb = make_batch()
    alm.solve_flat_compacted(wb[0], wb[1], shape, grid, cfg.alm,
                             lbfgs_overrides=overrides, chunk_steps=128,
                             buckets=(1, 4, 16), max_dispatch=WIDTH)
    tb = make_batch()
    t0 = time.time()
    res = alm.solve_flat_compacted(tb[0], tb[1], shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides,
                                   chunk_steps=128, buckets=(1, 4, 16),
                                   max_dispatch=WIDTH)
    conv = np.asarray(res.converged)
    dt = time.time() - t0
    ev = np.asarray(res.evals)
    rh = np.asarray(res.res_h); rg = np.asarray(res.res_g)
    print(f"slack={slack:7.0e} wall={dt:6.1f}s solves/s={B/dt:7.1f} "
          f"conv={conv.mean()*100:5.1f}% evals mean={ev.mean():6.1f} "
          f"p95={np.percentile(ev, 95):6.0f} "
          f"res_h p99={np.percentile(rh, 99):.2e} "
          f"res_g p99={np.percentile(rg, 99):.2e}", flush=True)
