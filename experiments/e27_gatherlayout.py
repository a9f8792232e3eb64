"""e27 (round 5): gather layout shootout for the packed terrain table.

e26 pinned the raw eval: the packed-table lookup forward is 7.8 ms of the
9.1 ms eval at w2048 (184k lookups -> 368k gathered items), i.e. ~21 ns
per 12-word item — 3x the ~7 ns flat rate of <=8-word items (§5).  The
current table is [12, Ncells] gathered along axis=1, so each item is a
STRIDED column (12 reads 10 MB apart).  Candidates:

  col12   [12, N] take axis=1   (current packed layout)
  row12   [N, 12] take axis=0   (contiguous 48 B rows; output pays
                                 (8,128) minor padding + a transpose)
  row16   [N, 16] take axis=0   (64 B-aligned rows)
  row128  [N, 128] take axis=0  (native lane-width rows as the unit)
  col8    [8, N]  take axis=1   (pair-table control, 4 items/lookup)
  flat1   [N]     take          (scalar items control)

Each timed as a chained scan (fresh indices derived from the running
accumulator so nothing is cacheable), reporting ns/item and the implied
per-lookup cost.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

NCELLS = 200 * 200 * 63
M = int(os.environ.get("E27_M", str(368_640)))  # items per gather
N_REPS = 16

rng = np.random.default_rng(0)
base_idx = jnp.asarray(rng.integers(0, NCELLS, size=M), jnp.int32)

tables = {
    "col12": jnp.asarray(rng.standard_normal((12, NCELLS)), jnp.float32),
    "row12": jnp.asarray(rng.standard_normal((NCELLS, 12)), jnp.float32),
    "row16": jnp.asarray(rng.standard_normal((NCELLS, 16)), jnp.float32),
    "row128": jnp.asarray(rng.standard_normal((NCELLS, 128)), jnp.float32),
    "col8": jnp.asarray(rng.standard_normal((8, NCELLS)), jnp.float32),
    "flat1": jnp.asarray(rng.standard_normal((NCELLS,)), jnp.float32),
}


def bench(name, tab):
    if name.startswith("col"):
        g = lambda idx: jnp.take(tab, idx, axis=1, mode="clip").sum(0)
    elif name.startswith("row"):
        g = lambda idx: jnp.take(tab, idx, axis=0, mode="clip").sum(1)
    else:
        g = lambda idx: jnp.take(tab, idx, mode="clip")

    def chain(idx0):
        def body(c, _):
            idx, acc = c
            v = g(idx)                       # [M]
            acc = acc + v
            # new indices depend on v -> no caching, chain serialized
            idx = jnp.asarray(jnp.abs(acc) * 9973.0, jnp.int32) % NCELLS
            return (idx, acc), None
        (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.zeros((M,),
                                                            jnp.float32)),
                                     None, length=N_REPS)
        return acc.sum()

    fn = jax.jit(chain)
    float(fn(base_idx))  # compile+warm
    t0 = time.time()
    for _ in range(3):
        float(fn(base_idx))
    dt = (time.time() - t0) / 3 / N_REPS
    ns_item = dt / M * 1e9
    print(f"{name:7s} {dt*1e3:7.2f}ms/gather  {ns_item:6.2f} ns/item "
          f"(2 items/lookup -> {2*ns_item:6.1f} ns/lookup; "
          f"x184k lookups = {2*ns_item*184320/1e6:5.2f} ms)", flush=True)


for name, tab in tables.items():
    bench(name, tab)
