"""e30 (round 5): chunk_steps / dispatch-width sweep under knn-warm + mem8.

The eval distribution collapsed (p50 65, p95 138 vs round-4's 109/200),
so chunk_steps=192 now wastes ~(192 - 74) evals on most lanes (done lanes
in a slice still execute until the slice's while_loop exits or the chunk
ends).  Sweeps {64, 96, 128, 192} x dispatch {2048, 1024}, INTERLEAVED
x2 (PLATFORM_NOTES §14: wall noise between identical configs reached
1.9x, so each config is measured twice in round-robin and the best wall
is reported alongside both).
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
grid = jax.device_put(tgrid.with_packed_f16(tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
OVR = {"mem_size": 8, "max_iterations": 30}
B = 4096


def make_batch(Bn, sort=True):
    x0s, bounds, feats = [], [], []
    for _ in range(Bn):
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
        zs = hill_height(path[:, 0], path[:, 1])
        feats.append(np.concatenate([zs - zs.mean(),
                                     [np.linalg.norm(goal-start), yaw]]))
    feats = np.asarray(feats)
    order = np.argsort(np.abs(np.diff(feats[:, :16], axis=1)).sum(1)) \
        if sort else np.arange(Bn)
    return (jnp.asarray(np.stack(x0s)[order], jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *[bounds[i] for i in order]),
            feats[order])


# pilot for knn duals
px, pb, pf = make_batch(512, sort=False)
pres = alm.solve_flat_compacted(px, pb, shape, grid, cfg.alm,
                                lbfgs_overrides=OVR, chunk_steps=128,
                                buckets=(1, 4, 16), max_dispatch=2048,
                                return_duals=True)
pc = np.asarray(pres.converged)
plam, pmu, prho = (np.asarray(pres.duals.lam)[pc],
                   np.asarray(pres.duals.mu)[pc],
                   np.asarray(pres.duals.rho)[pc])
pfeat = pf[pc]
sc = np.concatenate([np.ones(16), [0.5, 0.2]])


def knn(feats):
    d = np.linalg.norm((feats[:, None, :] - pfeat[None, :, :]) * sc, axis=-1)
    nn = np.argmin(d, axis=1)
    return alm.DualState(lam=jnp.asarray(plam[nn]), mu=jnp.asarray(pmu[nn]),
                         rho=jnp.asarray(prho[nn]))


CONFIGS = [(cs, w) for cs in (64, 96, 128, 192) for w in (2048, 1024)]
walls = {c: [] for c in CONFIGS}

# compile warmups (small batch per config)
for cs, w in CONFIGS:
    xs, bs, fs = make_batch(256, sort=False)
    alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                             lbfgs_overrides=OVR, chunk_steps=cs,
                             buckets=(1, 4, 16), max_dispatch=w,
                             warm_duals=knn(fs))
print("warmup done", flush=True)

for rep in range(2):
    for cs, w in CONFIGS:
        xs, bs, fs = make_batch(B)
        warm = knn(fs)
        t0 = time.time()
        res = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                                       lbfgs_overrides=OVR, chunk_steps=cs,
                                       buckets=(1, 4, 16), max_dispatch=w,
                                       warm_duals=warm)
        conv = np.asarray(res.converged)
        dt = time.time() - t0
        walls[(cs, w)].append(dt)
        ev = np.asarray(res.evals)
        print(f"rep{rep} c{cs:3d} w{w:4d} wall={dt:6.2f}s "
              f"solves/s={B/dt:7.1f} conv={conv.mean()*100:5.1f}% "
              f"evals={ev.mean():6.1f}", flush=True)

print("--- summary (best wall):", flush=True)
for c, ws in walls.items():
    print(f"c{c[0]:3d} w{c[1]:4d} best={min(ws):6.2f}s "
          f"({B/min(ws):7.1f} solves/s) both={[round(x,2) for x in ws]}",
          flush=True)
