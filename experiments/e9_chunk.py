"""Find the chunk-length boundary of width-dependent divergence.

For chunk in {8, 16, 32, 64, 128}: advance the same 4096 lanes by 128 total
evals as sequential flat_run(chunk) calls, at widths 4096 vs 512.  Compare
final states bitwise.  If small-chunk programs are width-stable, the
compacted driver can pick a chunk size that makes any dispatch width safe.
"""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from bench import make_batch

cfg = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
B = 4096
rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg, shape, rng)
p = alm.lbfgs_params_from(cfg.alm)
p = dataclasses.replace(p, mem_size=16, max_iterations=30)

mk_scal = jax.jit(lambda xs, bs, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs, bs))
sc = mk_scal(x0s, bounds, grid)
init = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))(x0s)

TOTAL = 128
runs = {}


def get_run(chunk):
    if chunk not in runs:
        runs[chunk] = jax.jit(lambda st, bd, sc, g: jax.vmap(
            lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm,
                                            p, chunk))(st, bd, sc))
    return runs[chunk]


def advance(width, chunk):
    outs = []
    for lo in range(0, B, width):
        sl = slice(lo, lo + width)
        st = jax.tree.map(lambda a: a[sl], init)
        bd = jax.tree.map(lambda a: a[sl], bounds)
        sc_ = jax.tree.map(lambda a: a[sl], sc)
        for _ in range(TOTAL // chunk):
            st = get_run(chunk)(st, bd, sc_, grid)
        outs.append(st)
    return jax.tree.map(lambda *a: np.concatenate([np.asarray(v)
                                                   for v in a]), *outs)


for chunk in [8, 16, 32, 64, 128]:
    a = advance(4096, chunk)
    b = advance(512, chunk)
    dx = np.nanmax(np.abs(a.x - b.x))
    df = np.nanmax(np.abs(a.f - b.f))
    dev = np.abs(a.evals - b.evals).max()
    print(f"chunk={chunk:4d}: max|dx|={dx:.3e} max|df|={df:.3e} "
          f"max|devals|={dev}", flush=True)
