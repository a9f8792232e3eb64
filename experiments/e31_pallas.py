"""e31 (round 5): the Pallas attempt (VERDICT r4 #1).

Goal: a fused terrain-sample kernel that beats the XLA gather roofline.
Constraint discovered in round 2 (PLATFORM_NOTES §9) and re-tested here:
Mosaic's dynamic_gather (vector indexing of a VMEM table) fails on this
toolchain, so a Pallas kernel cannot do the random lookup directly.

Three staged probes, each isolated in a subprocess so a Mosaic
compile-crash or hang cannot kill the sweep:

  A. sanity: elementwise kernel (must pass — baseline for "Pallas works")
  B. in-kernel vector gather: jnp.take of a VMEM table inside the kernel
     (the §9 re-test; expected to fail/hang — documented either way)
  C. in-kernel ONE-HOT MXU gather: out[s] = onehot(idx_s, 1024) @ table
     [1024, 24] per 256-sample block — the gather-free alternative.
     Measures ns/lookup vs the XLA gather doing the same tile-local
     workload.  If C wins by >5x, the remaining blocker is the binning
     pipeline (sort/scatter of ~184k samples per eval, which costs more
     than it saves at current eval counts — the go/no-go math is printed).
"""
import os, subprocess, sys, textwrap

HERE = os.path.dirname(os.path.abspath(__file__))

PRELUDE = """
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
"""

PROBE_A = PRELUDE + """
def kern(x_ref, o_ref):
    o_ref[:] = jnp.tanh(x_ref[:]) * 2.0 + 1.0

x = jnp.ones((256, 512), jnp.float32)
f = jax.jit(lambda x: pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
y = np.asarray(f(x))
assert np.allclose(y, np.tanh(1.0) * 2 + 1), y[0, 0]
print("A: elementwise pallas kernel OK", flush=True)
"""

PROBE_B = PRELUDE + """
def kern(idx_ref, tab_ref, o_ref):
    idx = idx_ref[:]                       # [256] int32
    o_ref[:] = jnp.take(tab_ref[:], idx, axis=0)   # dynamic gather

tab = jnp.asarray(np.random.randn(1024, 128), jnp.float32)
idx = jnp.asarray(np.random.randint(0, 1024, 256), jnp.int32)
f = jax.jit(lambda i, t: pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(i, t))
y = np.asarray(f(idx, tab))
ref = np.asarray(tab)[np.asarray(idx)]
assert np.allclose(y, ref)
print("B: in-kernel dynamic gather OK", flush=True)
"""

PROBE_C = PRELUDE + """
TILE = 1024   # one-hot domain (cells per spatial tile)
WID = 128     # padded row width (24 used)
BLK = 256     # samples per grid step
M = 184_320   # lookups per eval at w2048 (the production count)

def kern(idx_ref, tab_ref, o_ref):
    idx = idx_ref[:]                                   # [BLK, 1] int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, TILE), 1)
    onehot = (cols == idx).astype(jnp.float32)
    o_ref[:] = jnp.dot(onehot, tab_ref[:],
                       preferred_element_type=jnp.float32)

# bf16-exact table values: the MXU's f32 matmul rounds operands to bf16,
# and the production design would store hi/lo bf16 splits anyway (two
# bf16-exact one-hot matmuls reconstruct the f32 field to ~4e-6, since
# one-hot products are exact and the MXU accumulates in f32)
tab = jnp.asarray(np.random.randn(TILE, WID).astype(np.float32),
                  jnp.bfloat16).astype(jnp.float32)
idx = jnp.asarray(np.random.randint(0, TILE, (M, 1)), jnp.int32)

f = jax.jit(lambda i, t: pl.pallas_call(
    kern,
    grid=(M // BLK,),
    in_specs=[pl.BlockSpec((BLK, 1), lambda g: (g, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((TILE, WID), lambda g: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BLK, WID), lambda g: (g, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, WID), jnp.float32))(i, t))

y = np.asarray(f(idx, tab))
ref = np.asarray(tab)[np.asarray(idx)[:, 0]]
assert np.allclose(y, ref), np.abs(y - ref).max()

# timing: chain so nothing caches
def chain(i0):
    def body(c, _):
        i, acc = c
        v = f2(i)
        acc = acc + v[:, :1]
        i = jnp.asarray(jnp.abs(acc) * 9973.0, jnp.int32) % TILE
        return (i, acc), None
    (i, acc), _ = jax.lax.scan(body, (i0, jnp.zeros((M, 1), jnp.float32)),
                               None, length=8)
    return acc.sum()

f2 = lambda i: pl.pallas_call(
    kern, grid=(M // BLK,),
    in_specs=[pl.BlockSpec((BLK, 1), lambda g: (g, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((TILE, WID), lambda g: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BLK, WID), lambda g: (g, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, WID), jnp.float32))(i, tab)
cf = jax.jit(chain)
float(cf(idx))
t0 = time.time()
for _ in range(3):
    float(cf(idx))
dt = (time.time() - t0) / 3 / 8
print(f"C: one-hot MXU gather {dt*1e3:7.2f}ms for {M} lookups "
      f"({dt/M*1e9:6.2f} ns/lookup)", flush=True)

# XLA gather control on the same workload (12-wide items, 2/lookup equiv)
tabx = jnp.asarray(np.random.randn(12, TILE), jnp.float32)
def xchain(i0):
    def body(c, _):
        i, acc = c
        v = jnp.take(tabx, i[:, 0], axis=1).sum(0)
        acc = acc + v[:, None]
        i = jnp.asarray(jnp.abs(acc) * 9973.0, jnp.int32) % TILE
        return (i, acc), None
    (i, acc), _ = jax.lax.scan(body, (i0, jnp.zeros((M, 1), jnp.float32)),
                               None, length=8)
    return acc.sum()
xf = jax.jit(xchain)
float(xf(idx))
t0 = time.time()
for _ in range(3):
    float(xf(idx))
dtx = (time.time() - t0) / 3 / 8
print(f"C-control: XLA gather (12-wide, 1 item) {dtx*1e3:7.2f}ms "
      f"({dtx/M*1e9:6.2f} ns/item)", flush=True)
"""

for name, code, tmo in (("A", PROBE_A, 600), ("B", PROBE_B, 600),
                        ("C", PROBE_C, 1200)):
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=tmo)
    out = (r.stdout + r.stderr).strip().splitlines()
    keep = [ln for ln in out if not ln.startswith("WARNING")]
    print(f"--- probe {name}: exit={r.returncode}")
    for ln in keep[-6:]:
        print("   ", ln[:200], flush=True)
