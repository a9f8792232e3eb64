"""e24 (round 4): host-I/O share of the solve + final width/chunk tune.

After the retrace fix (e23: 570 solves/s), ~4.4 s of a 7.2 s solve was
still host-side.  Suspect: per-round result pulls (~0.3 KB/lane over a
~MB/s tunnel).  The driver now compacts finished lanes on device before
pulling.  This measures (1) raw tunnel RTT + bandwidth, (2) the warm
production solve after the pull fix, (3) chunk_steps {96, 192} and a
single-slice W=4096 variant (warm starts shorten the loop, which may
damp the wide-batch eval inflation that killed W=4096 cold).
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

# --- tunnel probes -------------------------------------------------------
dev_scalar = jnp.ones(())
dev_big = jnp.ones((2048, 80), jnp.float32)  # ~0.65 MB
np.asarray(dev_scalar); np.asarray(dev_big)
t0 = time.time()
for _ in range(10):
    np.asarray(dev_scalar)
rtt = (time.time() - t0) / 10
t0 = time.time()
for _ in range(5):
    np.asarray(dev_big + 0.0)
big = (time.time() - t0) / 5
print(f"tunnel: scalar pull RTT={rtt*1e3:.1f}ms  0.65MB pull={big*1e3:.1f}ms"
      f"  ({0.65/max(big,1e-9):.2f} MB/s)", flush=True)

cfg = scene_config("hill")
base = make_synthetic_grid(cfg.map, dtype=np.float32)
grid = jax.device_put(tgrid.with_packed_table(tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
B = 4096
overrides = {"mem_size": 16, "max_iterations": 30}


def make_batch(n):
    x0s, bounds = [], []
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
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))


pb = make_batch(512)
res = alm.solve_flat_compacted(pb[0], pb[1], shape, grid, cfg.alm,
                               lbfgs_overrides=overrides, chunk_steps=128,
                               buckets=(1, 4, 16), max_dispatch=2048,
                               return_duals=True)
conv = np.asarray(res.converged)
wd = alm.DualState(
    lam=jnp.asarray(np.asarray(res.duals.lam)[conv].mean(0)),
    mu=jnp.asarray(np.asarray(res.duals.mu)[conv].mean(0)),
    rho=jnp.asarray(float(np.median(np.asarray(res.duals.rho)[conv])),
                    jnp.float32))

VARIANTS = [("w2048,c128", 2048, 128), ("w2048,c96", 2048, 96),
            ("w2048,c192", 2048, 192), ("w4096,c128", 4096, 128)]
only = os.environ.get("E24_ONLY")
if only:
    VARIANTS = [VARIANTS[int(i)] for i in only.split(",")]

for name, W, chunk in VARIANTS:
    batches = [make_batch(B) for _ in range(3)]
    alm.solve_flat_compacted(batches[0][0], batches[0][1], shape, grid,
                             cfg.alm, lbfgs_overrides=overrides,
                             chunk_steps=chunk, buckets=(1, 4, 16),
                             max_dispatch=W, warm_duals=wd)
    ts = []
    for i in (1, 2):
        t0 = time.time()
        r = alm.solve_flat_compacted(batches[i][0], batches[i][1], shape,
                                     grid, cfg.alm,
                                     lbfgs_overrides=overrides,
                                     chunk_steps=chunk, buckets=(1, 4, 16),
                                     max_dispatch=W, warm_duals=wd)
        conv = np.asarray(r.converged)
        ts.append(time.time() - t0)
    dt = min(ts)
    ev = np.asarray(r.evals)
    print(f"{name:12s} wall={dt:6.1f}s solves/s={B/dt:7.1f} "
          f"conv={conv.mean()*100:5.1f}% evals mean={ev.mean():6.1f} "
          f"p95={np.percentile(ev, 95):5.0f}", flush=True)
