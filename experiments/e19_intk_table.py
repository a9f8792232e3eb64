"""e19: int_K (constraint sample density) x terrain-table variant, width 2048.

Terrain gather is ~90% of a fused eval and items/eval scales linearly in
(int_K+1) (VERDICT round-2 roofline).  The reference exposes int_K as a
tunable (run_hill.yaml:53, =16); this measures int_K=8 against 16 at the
e17-optimal dispatch width 2048, for both the f32 yaw-pair table (4
gather items/lookup) and the split hi+lo bf16 table (2 items of 12-wide
rows, e13: slower at 4096, faster at 1024 — 2048 untested).

Quality gate for int_K=8: re-evaluate every solution's constraints on
the K=16 sample grid (raw units) — inter-sample violations must stay
within the reference bounds at epsilon_con-level tolerance or K=8 is a
false economy.
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
B = 4096
WIDTH = int(os.environ.get("E19_WIDTH", "2048"))

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
        xi, bi = manager.init_guess_fixed(path, cfg.manager, piece_xy=10,
                                          piece_yaw=20)
        x0s.append(xi); bounds.append(bi)
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))

shape16 = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)

@jax.jit
def recheck16(xs, bounds):
    """Raw K=16 violation metrics per lane (reference post-solve report
    semantics, alm_traj_opt.h:170-229): max |nonh| and per-class maxima."""
    def one(x, b):
        h, g = alm.raw_constraints(x, b, shape16, grid_pair, cfg.alm)
        return jnp.max(jnp.abs(h)), jnp.max(g, axis=1)
    return jax.vmap(one)(xs, bounds)

overrides = {"mem_size": 16, "max_iterations": 30}
combos = [tuple(c.split("/")) for c in os.environ.get(
    "E19_COMBOS", "pair/16,pair/8,packed/16,packed/8").split(",")]
combos = [(t, int(k)) for t, k in combos]

for tname, K in combos:
    g = grid_pair if tname == "pair" else grid_packed
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=K)
    wb = make_batch()
    alm.solve_flat_compacted(wb[0], wb[1], shape, g, cfg.alm,
                             lbfgs_overrides=overrides, chunk_steps=128,
                             buckets=(1, 4, 16), max_dispatch=WIDTH)
    tb = make_batch()
    t0 = time.time()
    res = alm.solve_flat_compacted(tb[0], tb[1], shape, g, cfg.alm,
                                   lbfgs_overrides=overrides,
                                   chunk_steps=128, buckets=(1, 4, 16),
                                   max_dispatch=WIDTH)
    conv = np.asarray(res.converged)
    dt = time.time() - t0
    ev = np.asarray(res.evals)
    print(f"{tname:>6} K={K:>2} wall={dt:6.1f}s solves/s={B/dt:7.1f} "
          f"conv={conv.mean()*100:5.1f}% evals mean={ev.mean():6.1f} "
          f"p95={np.percentile(ev, 95):6.0f}", flush=True)
    nh, gmax = recheck16(res.x, tb[1])
    nh = np.asarray(nh); gmax = np.asarray(gmax)
    # normalized violation: positive g row value / bound scale
    names = ["vel2", "alon2", "alat2", "kap2", "att", "sig"]
    viol = ", ".join(f"{n}={np.percentile(gmax[:, i], 99):+.1e}"
                     for i, n in enumerate(names))
    print(f"        K16-recheck: nonh p99={np.percentile(nh, 99):.2e} "
          f"{viol}", flush=True)
