"""e16: where do the ~500 evals/lane go?

e15 found mean lane need ~450-550 EVALS while inner_iters (accepted
steps) averages ~100 — ~5 evals per accepted L-BFGS step, vs the 1-2 a
Lewis-Overton search should take with a decent initial step.  This pulls
per-eval (outer, inner) traces from `alm.debug_iterates` over a lane
population and breaks the eval budget into: line-search rejects per
accepted step (by inner-counter plateaus), dual-round restart reevals,
and the tail past convergence.
"""
import os, sys
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
grid = jax.device_put(tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
rng = np.random.default_rng(7)

B = 64
x0s, bounds = [], []
for _ in range(B):
    ang = rng.uniform(-np.pi, np.pi)
    start = rng.uniform(-3.5, -1.5, size=2)
    goal = np.clip(start + 2.5*np.array([np.cos(ang), np.sin(ang)]), -4.0, 4.0)
    yaw = np.arctan2(goal[1]-start[1], goal[0]-start[0])
    t = np.linspace(0, 1, 16)[:, None]
    path = np.concatenate([(1-t)*start + t*goal, np.full((16,1), yaw)], axis=1)
    xi, bi = manager.init_guess_fixed(path, cfg.manager, piece_xy=shape.piece_xy,
                                      piece_yaw=shape.piece_yaw)
    x0s.append(xi); bounds.append(bi)
x0s = jnp.asarray(np.stack(x0s), jnp.float32)
bounds = jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32), *bounds)

ov = {"mem_size": 16, "max_iterations": 30}
out = jax.jit(jax.vmap(lambda x, b: alm.debug_iterates(
    x, b, shape, grid, cfg.alm, max_evals=768, lbfgs_overrides=ov)))(x0s, bounds)
outer = np.asarray(out["outer"]).T if np.asarray(out["outer"]).shape[0] != B else np.asarray(out["outer"])
inner = np.asarray(out["inner"])
valid = np.asarray(out["valid"])
outer = np.asarray(out["outer"])
# shapes [B, max_evals]
total_evals = valid.sum(1)
total_inner = inner[np.arange(B), np.maximum(total_evals - 1, 0)]
total_outer = outer[np.arange(B), np.maximum(total_evals - 1, 0)]
fin = total_evals < 768
print(f"lanes finished within 768 evals: {fin.sum()}/{B}")
print(f"evals/lane: mean={total_evals[fin].mean():.0f} p50={np.percentile(total_evals[fin],50):.0f} "
      f"p90={np.percentile(total_evals[fin],90):.0f} max={total_evals.max()}")
print(f"accepted steps/lane: mean={total_inner[fin].mean():.0f}")
print(f"outer rounds/lane:   mean={total_outer[fin].mean():.1f} max={total_outer.max()}")
print(f"evals per accepted step: {(total_evals[fin]/np.maximum(total_inner[fin],1)).mean():.2f}")

# per-outer-round breakdown for a few lanes: evals in each round
r_evals, r_accept = [], []
for b in range(B):
    if not fin[b]:
        continue
    T = int(total_evals[b])
    o = outer[b, :T]; i = inner[b, :T]
    for r in range(int(o.max()) + 1):
        m = o == r
        if m.sum():
            r_evals.append(m.sum())
            r_accept.append(i[m].max() - (i[m].min() - 1))
r_evals = np.asarray(r_evals); r_accept = np.asarray(r_accept)
print(f"per-outer-round: mean evals={r_evals.mean():.1f}, mean accepts={r_accept.mean():.1f}, "
      f"ratio={(r_evals/np.maximum(r_accept,1)).mean():.2f}")
