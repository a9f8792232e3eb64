"""e32 (round 5): minimal repro of the width-4096 eval inflation
(VERDICT r4 #9; PLATFORM_NOTES §7/§12-13).

Known: per-step math is bitwise width-independent for a single eval, yet
solves dispatched at width 4096 take ~2.3x more line-search evals than
the SAME lanes at width <=1024, even with short chunks.  This pins the
first divergence:

  1. identical 4096-lane workload solved at max_dispatch {512, 2048,
     4096} — evals/lane distribution + convergence per width;
  2. bitwise state comparison: lanes 0..511 advanced by flat_run in
     16-step chunks at width 512 vs embedded in a width-4096 dispatch —
     reports the first chunk and state field where the iterates diverge.
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
grid = jax.device_put(tgrid.with_packed_f16(tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
OVR = {"mem_size": 8, "max_iterations": 30}
B = 4096


def make_batch(Bn):
    x0s, bounds = [], []
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
    return (jnp.asarray(np.stack(x0s), jnp.float32),
            jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                         *bounds))


xs, bs = make_batch(B)

# ---- part 1: eval counts per dispatch width, identical lanes
for W in (512, 2048, 4096):
    t0 = time.time()
    res = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                                   lbfgs_overrides=OVR, chunk_steps=128,
                                   buckets=(1, 4, 16), max_dispatch=W,
                                   retry_width=None)
    dt = time.time() - t0
    ev = np.asarray(res.evals)
    conv = np.asarray(res.converged)
    print(f"W={W:4d} wall={dt:6.1f}s conv={conv.mean()*100:5.1f}% "
          f"evals mean={ev.mean():6.1f} p50={np.percentile(ev,50):5.0f} "
          f"p95={np.percentile(ev,95):5.0f} max={ev.max():5d}", flush=True)

# ---- part 2: bitwise divergence trace, lanes 0..511 at w512 vs w4096
p = alm.lbfgs_params_from(cfg.alm)
import dataclasses
p = dataclasses.replace(p, **OVR)

scal = jax.jit(lambda xs_, bs_, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs_, bs_))
init = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))
runf = jax.jit(lambda st, bd, sc, g: jax.vmap(
    lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm, p,
                                    16))(st, bd, sc))

sc_all = scal(xs, bs, grid)
sub = lambda t: jax.tree.map(lambda a: a[:512], t)
st_w = init(xs)                       # width-4096 dispatch
st_n = init(xs[:512])                 # width-512 dispatch (same lanes)
bs_n, sc_n = sub(bs), sub(sc_all)

fields = alm._FlatState._fields
for chunk in range(12):
    st_w = runf(st_w, bs, sc_all, grid)
    st_n = runf(st_n, bs_n, sc_n, grid)
    diffs = []
    for f in fields:
        a = np.asarray(getattr(sub(st_w), f) if f != "duals"
                       else sub(st_w).duals.lam)
        b = np.asarray(getattr(st_n, f) if f != "duals"
                       else st_n.duals.lam)
        if a.dtype.kind == "f":
            neq = ~(np.isclose(a, b, rtol=0, atol=0) | (np.isnan(a)
                                                        & np.isnan(b)))
        else:
            neq = a != b
        n_lanes = int(np.any(neq.reshape(512, -1), axis=1).sum())
        if n_lanes:
            diffs.append((f, n_lanes))
    tag = " ".join(f"{f}:{n}" for f, n in diffs[:6]) if diffs else "bitwise-identical"
    print(f"after chunk {chunk:2d} (steps {(chunk+1)*16:3d}): {tag}",
          flush=True)
    if diffs and chunk >= 2:
        # enough signal: report magnitude on the worst field
        f0 = diffs[0][0]
        a = np.asarray(getattr(sub(st_w), f0) if f0 != "duals"
                       else sub(st_w).duals.lam)
        b = np.asarray(getattr(st_n, f0) if f0 != "duals"
                       else st_n.duals.lam)
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        print(f"  field {f0}: max|d|={np.nanmax(d):.3e}", flush=True)
        break
