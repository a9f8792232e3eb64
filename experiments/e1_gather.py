"""Gather strategy experiments on the real TPU (round 2 perf work).

Measures, with fresh inputs per rep and host materialization:
  A. XLA gather baseline at the solver's hot shape (4-item yaw-pair lookup).
  B. XLA gather vs item width (8/16/32/64/128/256 floats per row).
  C. Pallas kernel with table in VMEM doing jnp.take — supported? fast?
  D. Full fused eval (value_and_grad inner_cost) vs the same with terrain
     stubbed analytic (no gather) — isolates gather share.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def timed(fn, args_list, reps=3):
    """fn jitted; args_list = fresh inputs per rep (list len >= reps+1)."""
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    ts = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(*args_list[i])
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def exp_A_xla_gather():
    print("=== A: XLA gather baseline (hot shape) ===")
    rng = np.random.default_rng(0)
    Ncells = 200 * 200 * 63
    table = jnp.asarray(rng.normal(size=(8, Ncells)).astype(np.float32))
    M = 4096 * 170 * 4  # items per batched eval

    def f(idx):
        return jnp.take(table, idx, axis=1, mode="clip").sum(axis=1)

    jf = jax.jit(f)
    idxs = [jnp.asarray(rng.integers(0, Ncells, size=(M,)).astype(np.int32))
            for _ in range(4)]
    dt = timed(jf, [(i,) for i in idxs])
    print(f"M={M} items x 8f32: {dt*1e3:.2f} ms -> {M/dt/1e6:.0f} M items/s, "
          f"{M*32/dt/1e9:.1f} GB/s")


def exp_B_width():
    print("=== B: gather vs row width ===")
    rng = np.random.default_rng(1)
    bytes_target = 4096 * 170 * 4 * 32  # same total bytes as hot shape
    for w in [4, 8, 16, 32, 64, 128, 256, 512]:
        Nrows = max(1024, (200 * 200 * 63 * 8) // w)
        table = jnp.asarray(rng.normal(size=(Nrows, w)).astype(np.float32))
        M = max(1024, bytes_target // (w * 4))

        def f(idx, table=table):
            return jnp.take(table, idx, axis=0, mode="clip").sum(axis=0)

        jf = jax.jit(f)
        idxs = [jnp.asarray(rng.integers(0, Nrows, size=(M,)).astype(np.int32))
                for _ in range(4)]
        dt = timed(jf, [(i,) for i in idxs])
        print(f"w={w:4d} f32  M={M:9d}: {dt*1e3:8.2f} ms  "
              f"{M/dt/1e6:8.0f} M items/s  {M*w*4/dt/1e9:7.1f} GB/s  "
              f"{dt/M*1e9:6.1f} ns/item")


def exp_C_pallas_gather():
    print("=== C: Pallas VMEM gather ===")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    Nrows, w = 32768, 8   # 1 MB table -> VMEM resident
    table = jnp.asarray(rng.normal(size=(Nrows, w)).astype(np.float32))
    M = 4096 * 170 * 4

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    TILE = 8192

    def f(idx):
        return pl.pallas_call(
            kernel,
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Nrows, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, w), jnp.float32),
        )(idx, table)

    jf = jax.jit(f)
    idxs = [jnp.asarray(rng.integers(0, Nrows, size=(M,)).astype(np.int32))
            for _ in range(4)]
    try:
        dt = timed(jf, [(i,) for i in idxs])
        print(f"pallas take rows(8f32) M={M}: {dt*1e3:.2f} ms  "
              f"{M/dt/1e6:.0f} M items/s")
    except Exception as e:
        print(f"pallas take FAILED: {type(e).__name__}: {str(e)[:500]}")


def exp_C2_pallas_gather_1d():
    print("=== C2: Pallas VMEM gather, 1-col table (pure element gather) ===")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    N = 131072
    table = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    M = 4096 * 170 * 4

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    TILE = 32768

    def f(idx):
        return pl.pallas_call(
            kernel,
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
        )(idx, table)

    jf = jax.jit(f)
    idxs = [jnp.asarray(rng.integers(0, N, size=(M,)).astype(np.int32))
            for _ in range(4)]
    try:
        dt = timed(jf, [(i,) for i in idxs])
        print(f"pallas take 1d M={M}: {dt*1e3:.2f} ms  "
              f"{M/dt/1e6:.0f} M items/s")
    except Exception as e:
        print(f"pallas take 1d FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "A"):
        exp_A_xla_gather()
    if which in ("all", "B"):
        exp_B_width()
    if which in ("all", "C"):
        exp_C_pallas_gather()
    if which in ("all", "C2"):
        exp_C2_pallas_gather_1d()
