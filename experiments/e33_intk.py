"""e33 (round 5): constraint-sample density K below 8.

K is a reference tunable (int_K, run_hill.yaml:53).  K=8 halved the
round-3 gather count and passes the dense K=16 recheck; with the f16
table the lookup is still ~75% of the eval, so K=6 (S=70) and K=5 (S=60)
are worth testing.  Gates: convergence parity, evals/lane, and the dense
K=16 exact-constraint recheck on the solutions (the same acceptance the
K=8 adoption used, tests/test_alm.py).
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
OVR = {"mem_size": 8, "max_iterations": 30}
B = 2048
W = 2048


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


def dense_recheck(shapeK, xs_sol, bs):
    """max exact K=16 raw-constraint violation per lane at the solution."""
    dense = alm.ProblemShape(10, 20, 16)

    def one(x, b):
        h, g = alm.raw_constraints(x, b, dense, grid, cfg.alm)
        return jnp.max(jnp.abs(h)), jnp.max(g)

    f = jax.jit(lambda xs_, bs_: jax.vmap(one)(xs_, bs_))
    rh, rg = f(xs_sol, bs)
    return np.asarray(rh), np.asarray(rg)


for K in (8, 6, 5):
    shape = alm.ProblemShape(10, 20, K)
    # pilot + knn warm per K (duals are sample-indexed: E = 10*(K+1))
    px, pb, pf = make_batch(512, sort=False)
    pres = alm.solve_flat_compacted(px, pb, shape, grid, cfg.alm,
                                    lbfgs_overrides=OVR, chunk_steps=128,
                                    buckets=(1, 4, 16), max_dispatch=W,
                                    return_duals=True)
    pc = np.asarray(pres.converged)
    plam = np.asarray(pres.duals.lam)[pc]
    pmu = np.asarray(pres.duals.mu)[pc]
    prho = np.asarray(pres.duals.rho)[pc]
    pfeat = pf[pc]
    sc = np.concatenate([np.ones(16), [0.5, 0.2]])

    xs, bs, fs = make_batch(B)
    d = np.linalg.norm((fs[:, None, :] - pfeat[None, :, :]) * sc, axis=-1)
    nn = np.argmin(d, axis=1)
    warm = alm.DualState(lam=jnp.asarray(plam[nn]),
                         mu=jnp.asarray(pmu[nn]),
                         rho=jnp.asarray(prho[nn]))
    # timed (warmup on a small batch first)
    wx, wb, wf = make_batch(256, sort=False)
    alm.solve_flat_compacted(wx, wb, shape, grid, cfg.alm,
                             lbfgs_overrides=OVR, chunk_steps=128,
                             buckets=(1, 4, 16), max_dispatch=W)
    t0 = time.time()
    res = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                                   lbfgs_overrides=OVR, chunk_steps=128,
                                   buckets=(1, 4, 16), max_dispatch=W,
                                   warm_duals=warm)
    dt = time.time() - t0
    conv = np.asarray(res.converged)
    ev = np.asarray(res.evals)
    rh, rg = dense_recheck(shape, res.x, bs)
    # dense residuals are RAW (unscaled); compare against the same windows
    # the K-grid residuals use after default scaling (sig/cur scales ~1)
    pass16 = ((rh < 5e-3) & (rg < 0.05))[conv]
    print(f"K={K} wall={dt:6.2f}s solves/s={B/dt:7.1f} "
          f"conv={conv.mean()*100:5.1f}% evals={ev.mean():6.1f} "
          f"dense16 pass={pass16.mean()*100:5.1f}% "
          f"rh16 p95={np.percentile(rh[conv],95):.4f} "
          f"rg16 p95={np.percentile(rg[conv],95):.4f}", flush=True)

# Result (round 5, cached-program rerun): K8 307.3 / K6 293.1 / K5 258.7
# solves/s same-session, evals 72.8 / 76.9 / 78.8, dense16 pass 100%
# everywhere.  NEGATIVE: the per-eval sample saving is eaten by the extra
# line-search evals at lower K — K=8 stays the production density.
