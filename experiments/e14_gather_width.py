"""e14: raw XLA gather throughput vs item row width, measured today.

e13 showed the 12-f32-wide split-table items gather 2x SLOWER than 4x
8-wide pair items at B=4096 (38.6 vs 19.1 ms/eval) while WINNING at
B=1024 — so item width (or its tiling) matters at scale, contradicting
the round-2 "item count only" model (PLATFORM_NOTES §4b).  This measures
take() on [W, N] f32 tables for W in {4, 6, 8, 12, 16} at gather counts
matching the solver (B*170 items and 2x that), fresh indices per rep.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

N = 200 * 200 * 63
rng = np.random.default_rng(0)

def bench(W, M, reps=3):
    table = jnp.asarray(rng.normal(size=(W, N)).astype(np.float32))
    fn = jax.jit(lambda t, i: jnp.take(t, i, axis=1, mode="clip").sum(0))
    idxs = [jnp.asarray(rng.integers(0, N, size=M).astype(np.int32))
            for _ in range(reps + 1)]
    np.asarray(fn(table, idxs[0]))
    ts = []
    for i in range(1, reps + 1):
        t0 = time.time()
        np.asarray(fn(table, idxs[i]))
        ts.append(time.time() - t0)
    dt = np.median(ts)
    return dt, M / dt / 1e6

for M in (696_320, 2_785_280):          # B=4096 x 170 samples; x4
    for W in (4, 6, 8, 12, 16):
        dt, rate = bench(W, M)
        print(f"M={M/1e6:.2f}M W={W:>2}: {dt*1e3:7.2f} ms  {rate:7.1f} M items/s")
