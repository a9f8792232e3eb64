"""Headline benchmark: batched MINCO PHR-ALM solves/s on one chip (hill).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BASELINE.json publishes no reference numbers (the reference repo has none);
the north-star target is >=10,000 MINCO solves/s per chip on the hill scene,
so vs_baseline reports value / 10000 (fraction of the target).

Measurement rules (hard-won on the tunneled TPU platform):
- every timed repetition solves a FRESH batch of scenarios (the platform can
  serve repeated identical dispatches from cache, inflating rates ~1000x);
- the timed section ends by materializing the converged flags to host
  (block_until_ready alone under-reports on this platform);
- host-side scenario generation must stay pure numpy (eager jnp scalar ops
  degrade subsequent device launches ~300x).

Solver: `alm.solve_flat_compacted` — ALM outer loop + L-BFGS + Lewis-Overton
line search flattened into one while_loop (one cost+grad eval per iteration)
with converged lanes retired every `chunk_steps` evaluations.  Reference
solver settings except the L-BFGS memory (8) and a per-outer-round inner cap
of 30 (the ALM outer loop absorbs the cap; measured to keep ~100%
convergence while bounding the batch's lockstep tail).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_batch(B, cfg, shape, rng):
    from uneven_planner_tpu import manager
    import jax
    import jax.numpy as jnp

    x0s, bounds = [], []
    for _ in range(B):
        ang = rng.uniform(-np.pi, np.pi)
        start = rng.uniform(-3.5, -1.5, size=2)
        goal = np.clip(start + 2.5 * np.array([np.cos(ang), np.sin(ang)]),
                       -4.0, 4.0)
        yaw = np.arctan2(goal[1] - start[1], goal[0] - start[0])
        t = np.linspace(0, 1, 16)[:, None]
        path = np.concatenate([(1 - t) * start + t * goal,
                               np.full((16, 1), yaw)], axis=1)
        xi, bi = manager.init_guess_fixed(path, cfg.manager,
                                          piece_xy=shape.piece_xy,
                                          piece_yaw=shape.piece_yaw)
        x0s.append(xi)
        bounds.append(bi)
    x0s = jnp.asarray(np.stack(x0s), jnp.float32)
    bounds = jax.tree.map(lambda *a: jnp.asarray(np.stack(a), jnp.float32),
                          *bounds)
    return x0s, bounds


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu.solver import alm
    from uneven_planner_tpu.terrain import grid as tgrid
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

    B = int(os.environ.get("BENCH_BATCH", "4096"))
    chunk_steps = int(os.environ.get("BENCH_CHUNK_STEPS", "128"))
    n_rep = int(os.environ.get("BENCH_REPS", "2"))
    max_dispatch = int(os.environ.get("BENCH_DISPATCH", "4096"))
    cfg = scene_config("hill")
    # NOTE: the bf16-packed 2-item lookup (with_packed_table) halves gather
    # items but its ~0.2% field quantization noise breaks the Lewis-Overton
    # line search (measured 4x MORE evals/solve) — net loss; the bench
    # stays on the exact f32 yaw-pair table.
    grid = jax.device_put(
        tgrid.with_pair_table(make_synthetic_grid(cfg.map,
                                                  dtype=np.float32)))

    rng = np.random.default_rng(0)
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
    # mem_size 16 measured ~20% fewer inner iterations than 8 at equal
    # convergence; per-outer-round inner cap 30
    overrides = {"mem_size": 16, "max_iterations": 30}

    def run(batch):
        res = alm.solve_flat_compacted(batch[0], batch[1], shape, grid,
                                       cfg.alm, lbfgs_overrides=overrides,
                                       chunk_steps=chunk_steps,
                                       buckets=(1, 4, 16),
                                       max_dispatch=max_dispatch)
        return np.asarray(res.converged)

    batches = [make_batch(B, cfg, shape, rng) for _ in range(n_rep + 1)]
    conv = run(batches[0])  # warmup: compiles every bucket size

    times = []
    for i in range(1, n_rep + 1):
        t0 = time.time()
        conv = run(batches[i])
        times.append(time.time() - t0)
    dt = float(np.median(times))

    solves_per_sec = B / dt
    sys.stderr.write(f"batch={B} time={dt*1e3:.1f}ms "
                     f"converged={conv.mean()*100:.1f}%\n")
    print(json.dumps({
        "metric": "minco_alm_solves_per_sec_per_chip_hill",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
