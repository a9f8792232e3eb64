"""e20 (round 4): compose the round-3 perf levers into one config.

Round 3 measured each lever in isolation (PLATFORM_NOTES §12): int_K=8
halves the dominant gather count (quality-gated), dispatch width <=1024
has zero line-search eval inflation (1.3x at 2048, 2.9x at 4096), the
split hi+lo packed table halves gather items again and is faster at
width <=1024, and warm dual starts cut outer rounds.  VERDICT r3 ordered
the composition.  This sweep runs the SAME 4096-lane hill workload through
the candidate compositions in one session (PLATFORM_NOTES §11: cross-day
numbers on this tunnel are incomparable), including the r03 production
config as the control.

Also probes the short-chunk hypothesis: §7's wide-batch eval inflation is
a LONG-LOOP compile-variant effect (8-step chunks are bitwise identical
across widths), so width 4096 with chunk_steps 8-16 may keep the wide
dispatch's launch-overhead amortization without the eval inflation.
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
grid_pair = jax.device_put(tgrid.with_pair_table(base))
grid_packed = jax.device_put(tgrid.with_packed_table(
    tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
B = int(os.environ.get("E20_B", "4096"))
overrides = {"mem_size": 16, "max_iterations": 30}


def make_batch(shape):
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
                                          piece_xy=10, piece_yaw=20)
        x0s.append(xi); bounds.append(bi)
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))


def harvest_warm(shape, grid, width, chunk):
    """Population-prior duals from a 512-lane pilot (one-time, off the
    timed path in production: the prior is a constant of the scene)."""
    global B
    keep = B; B = 512
    pb = make_batch(shape)
    B = keep
    res = alm.solve_flat_compacted(pb[0], pb[1], shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides,
                                   chunk_steps=chunk, buckets=(1, 4, 16),
                                   max_dispatch=width, return_duals=True)
    conv = np.asarray(res.converged)
    lam = np.asarray(res.duals.lam)[conv].mean(0)
    mu = np.asarray(res.duals.mu)[conv].mean(0)
    rho = float(np.median(np.asarray(res.duals.rho)[conv]))
    return alm.DualState(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
                         rho=jnp.asarray(rho, jnp.float32)), conv.mean()


CONFIGS = [
    # name, int_K, grid, width, chunk_steps, warm
    ("r03-control(K16,pair,w2048,c128)", 16, grid_pair, 2048, 128, False),
    ("K8,pair,w2048,c128", 8, grid_pair, 2048, 128, False),
    ("K8,packed,w1024,c128", 8, grid_packed, 1024, 128, False),
    ("K8,packed,w2048,c128", 8, grid_packed, 2048, 128, False),
    ("K8,packed,w4096,c16", 8, grid_packed, 4096, 16, False),
    ("K8,pair,w4096,c16", 8, grid_pair, 4096, 16, False),
    ("K8,packed,w1024,c128,warm", 8, grid_packed, 1024, 128, True),
    ("K8,packed,w2048,c128,warm", 8, grid_packed, 2048, 128, True),
    # K16-based compositions (the first clean pass showed K16 leading)
    ("K16,packed,w2048,c128", 16, grid_packed, 2048, 128, False),
    ("K16,packed,w1024,c128", 16, grid_packed, 1024, 128, False),
    ("K16,pair,w1024,c128", 16, grid_pair, 1024, 128, False),
    ("K16,pair,w4096,c16", 16, grid_pair, 4096, 16, False),
    ("K16,pair,w2048,c128,warm", 16, grid_pair, 2048, 128, True),
    ("K16,packed,w2048,c128,warm", 16, grid_packed, 2048, 128, True),
]
only = os.environ.get("E20_ONLY")
if only:
    sel = [int(i) for i in only.split(",")]
    CONFIGS = [CONFIGS[i] for i in sel]

for name, K, grid, width, chunk, warm in CONFIGS:
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=K)
    wd = None
    if warm:
        wd, pconv = harvest_warm(shape, grid, width, chunk)
        print(f"  [{name}] pilot converged {pconv*100:.1f}%", flush=True)
    wb = make_batch(shape)
    alm.solve_flat_compacted(wb[0], wb[1], shape, grid, cfg.alm,
                             lbfgs_overrides=overrides, chunk_steps=chunk,
                             buckets=(1, 4, 16), max_dispatch=width,
                             warm_duals=wd)
    tb = make_batch(shape)
    t0 = time.time()
    res = alm.solve_flat_compacted(tb[0], tb[1], shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides,
                                   chunk_steps=chunk, buckets=(1, 4, 16),
                                   max_dispatch=width, warm_duals=wd)
    conv = np.asarray(res.converged)
    dt = time.time() - t0
    ev = np.asarray(res.evals)
    print(f"{name:34s} wall={dt:6.1f}s solves/s={B/dt:7.1f} "
          f"conv={conv.mean()*100:5.1f}% evals mean={ev.mean():6.1f} "
          f"p95={np.percentile(ev, 95):6.0f} max={ev.max():5d}", flush=True)
