"""e25 (round 4): eval-tail shaping — difficulty-sorted dispatch + batch.

After e23/e24 the warm solver wall is ~(p95 evals) x per-step cost per
slice: the lockstep while_loop runs each 2048-lane slice to its SLOWEST
lane.  If scenario difficulty is predictable, sorting lanes by it makes
slices homogeneous: easy slices exit their chunk early.  This (1)
measures which cheap host-side features actually predict evals/lane from
a solved batch, (2) times sorted vs unsorted dispatch on fresh batches,
(3) times B=8192 (more slices amortize per-call fixed costs).
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
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid, \
    hill_height
from uneven_planner_tpu import manager

cfg = scene_config("hill")
base = make_synthetic_grid(cfg.map, dtype=np.float32)
grid = jax.device_put(tgrid.with_packed_table(tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
W, CH = 2048, 192
overrides = {"mem_size": 16, "max_iterations": 30}


def make_batch(n):
    feats, x0s, bounds = [], [], []
    for _ in range(n):
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
        # cheap host features: route length, terrain slope proxy along the
        # straight line (hill_height differences), |lateral| of goal
        zs = hill_height(path[:, 0], path[:, 1])
        feats.append([np.linalg.norm(goal - start),
                      np.abs(np.diff(zs)).sum(),
                      np.abs(zs).max()])
    return (np.asarray(feats),
            jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))


def harvest(wd_batch=512):
    f, xs, bs = make_batch(wd_batch)
    res = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                                   lbfgs_overrides=overrides,
                                   chunk_steps=CH, buckets=(1, 4, 16),
                                   max_dispatch=W, return_duals=True)
    conv = np.asarray(res.converged)
    return alm.DualState(
        lam=jnp.asarray(np.asarray(res.duals.lam)[conv].mean(0)),
        mu=jnp.asarray(np.asarray(res.duals.mu)[conv].mean(0)),
        rho=jnp.asarray(float(np.median(np.asarray(res.duals.rho)[conv])),
                        jnp.float32))


wd = harvest()

# --- 1) do the features predict evals? ----------------------------------
f, xs, bs = make_batch(4096)
res = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                               lbfgs_overrides=overrides, chunk_steps=CH,
                               buckets=(1, 4, 16), max_dispatch=W,
                               warm_duals=wd)
ev = np.asarray(res.evals).astype(np.float64)
names = ["dist", "slope_sum", "max_z"]
for i, nm in enumerate(names):
    r = np.corrcoef(f[:, i], ev)[0, 1]
    print(f"corr(evals, {nm}) = {r:+.3f}", flush=True)
# combined rank proxy: slope_sum (usually the strongest)
proxy = f[:, 1]
rank_r = np.corrcoef(np.argsort(np.argsort(proxy)),
                     np.argsort(np.argsort(ev)))[0, 1]
print(f"rank-corr(evals, slope_sum) = {rank_r:+.3f}", flush=True)

# --- 2) sorted vs unsorted dispatch, fresh batches ----------------------
def run(order, f, xs, bs):
    if order is not None:
        xs = xs[order]
        bs = jax.tree.map(lambda a: a[jnp.asarray(order)], bs)
    t0 = time.time()
    r = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                                 lbfgs_overrides=overrides, chunk_steps=CH,
                                 buckets=(1, 4, 16), max_dispatch=W,
                                 warm_duals=wd)
    conv = np.asarray(r.converged)
    return time.time() - t0, conv.mean()

B = 4096
for label in ("unsorted", "sorted", "unsorted", "sorted"):
    f, xs, bs = make_batch(B)
    order = np.argsort(f[:, 1]).astype(np.int32) if label == "sorted" \
        else None
    dt, conv = run(order if order is None else jnp.asarray(order), f, xs, bs)
    print(f"{label:9s} wall={dt:5.1f}s solves/s={B/dt:7.1f} "
          f"conv={conv*100:5.1f}%", flush=True)

# --- 3) B=8192 ----------------------------------------------------------
B = 8192
f, xs, bs = make_batch(B)
dt, conv = run(None, f, xs, bs)
print(f"B=8192    wall={dt:5.1f}s solves/s={B/dt:7.1f} "
      f"conv={conv*100:5.1f}%", flush=True)
