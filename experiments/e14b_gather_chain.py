"""e14b: gather throughput vs row width, CHAINED inside one scan dispatch
(e14's standalone calls were swamped by ~90 ms per-dispatch overhead,
which is itself a new datum for today's platform).  Also measures the
bare dispatch floor with a trivial kernel."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

N = 200 * 200 * 63
rng = np.random.default_rng(0)

# bare dispatch floor
tiny = jax.jit(lambda x: x * 1.000001)
xb = jnp.ones((8, 128), jnp.float32)
np.asarray(tiny(xb))
ts = []
for _ in range(5):
    t0 = time.time(); np.asarray(tiny(xb)); ts.append(time.time() - t0)
print(f"dispatch floor (tiny kernel): {np.median(ts)*1e3:.1f} ms")

def bench(W, M, chain=32, reps=2):
    table = jnp.asarray(rng.normal(size=(W, N)).astype(np.float32))
    def body(c, _):
        idx = (c * 1103515245 + 12345) % N       # cheap LCG fresh indices
        v = jnp.take(table, idx, axis=1, mode="clip").sum(0)
        return (c + v.astype(jnp.int32)) % N, ()
    fn = jax.jit(lambda i0: jax.lax.scan(body, i0, None, length=chain)[0])
    i0s = [jnp.asarray(rng.integers(0, N, size=M).astype(np.int32))
           for _ in range(reps + 1)]
    np.asarray(fn(i0s[0]))
    ts = []
    for i in range(1, reps + 1):
        t0 = time.time(); np.asarray(fn(i0s[i])); ts.append(time.time() - t0)
    dt = np.median(ts) / chain
    return dt, M / dt / 1e6

for M in (696_320, 2_785_280):
    for W in (4, 6, 8, 12, 16):
        dt, rate = bench(W, M)
        print(f"M={M/1e6:.2f}M W={W:>2}: {dt*1e3:7.2f} ms/gather  {rate:7.1f} M items/s")
