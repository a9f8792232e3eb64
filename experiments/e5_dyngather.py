"""Measure Mosaic tpu.dynamic_gather via jnp.take_along_axis in Pallas.

Supported lowering (jax/_src/pallas/mosaic/lowering.py:2465): take_along_axis
with operand/idx/out all the same 2D shape, axis 0 (sublane) or 1 (lane).

Cases (run one per subprocess arg to survive hangs):
  lane N      — x (N, 128), gather along lanes
  sub N       — x (N, 128), gather along sublanes (the table-lookup motif)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def bench(mode: str, N: int, reps=16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    hi = N if mode == "sub" else 128
    axis = 0 if mode == "sub" else 1

    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    def f(x, idx):
        # chain reps gathers so launch overhead amortizes; feed output back
        # as int indices to prevent DCE
        def step(c, _):
            v = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            )(x, c)
            c2 = jnp.abs(v.astype(jnp.int32)) % hi
            return c2, jnp.float32(0)

        out, _ = jax.lax.scan(step, idx, None, length=reps)
        return jnp.sum(out)

    jf = jax.jit(f)
    idxs = [jnp.asarray(rng.integers(0, hi, size=(N, 128)).astype(np.int32))
            for _ in range(3)]
    out = jf(x, idxs[0])
    jax.block_until_ready(out)
    ts = []
    for i in range(1, 3):
        t0 = time.perf_counter()
        out = jf(x, idxs[i])
        float(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / reps
    M = N * 128
    print(f"{mode} N={N:6d}: {dt*1e3:9.4f} ms/op  {M/dt/1e6:9.0f} M items/s",
          flush=True)


if __name__ == "__main__":
    mode, N = sys.argv[1], int(sys.argv[2])
    try:
        bench(mode, N)
    except Exception as e:
        print(f"{mode} N={N}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
