"""Reproduce the >4k-lane while_loop NaN corruption (PLATFORM_NOTES #7).

Same 8192 scenarios solved three ways:
  a) flat_run chunks at width 2048 (4 slices)  [known good]
  b) flat_run chunks at width 8192 (while_loop body)
  c) same as (b) but the chunk loop is lax.scan (fixed trip count)
Compare per-lane done/NaN/converged.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.solver import lbfgs as lb
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from bench import make_batch
import dataclasses

cfg = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
B = 8192
rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg, shape, rng)

p = alm.lbfgs_params_from(cfg.alm)
p = dataclasses.replace(p, mem_size=16, max_iterations=30)

CHUNK = 128
ROUNDS = 10  # 1280 evals max


def run_width(width, use_scan):
    def solve_slice(x0s_s, bounds_s):
        scalings = jax.jit(lambda xs, bs, g: jax.vmap(
            lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs, bs))(
            x0s_s, bounds_s, grid)
        states = jax.jit(jax.vmap(
            lambda x: alm.flat_init(x, shape, cfg.alm, p)))(x0s_s)

        if use_scan:
            def chunk_batched(st, bd, sc, g):
                def one(s, b, c):
                    def body(s, _):
                        s2 = alm.flat_step(s, b, c, shape, g, cfg.alm, p)
                        s3 = jax.tree.map(
                            lambda new, old: jnp.where(s.done, old, new),
                            s2, s)
                        return s3, jnp.float32(0)
                    s, _ = jax.lax.scan(body, s, None, length=CHUNK)
                    return s
                return jax.vmap(one)(st, bd, sc)
            jrun = jax.jit(chunk_batched)
        else:
            jrun = jax.jit(lambda st, bd, sc, g: jax.vmap(
                lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g,
                                                cfg.alm, p, CHUNK))(
                st, bd, sc))

        for r in range(ROUNDS):
            states = jrun(states, bounds_s, scalings, grid)
            done = np.asarray(states.done)
            if done.all():
                break
        return states

    t0 = time.time()
    outs = []
    for lo in range(0, B, width):
        sl = slice(lo, lo + width)
        st = solve_slice(x0s[sl], jax.tree.map(lambda a: a[sl], bounds))
        outs.append(st)
    st = jax.tree.map(lambda *a: np.concatenate([np.asarray(x) for x in a]),
                      *outs)
    dt = time.time() - t0
    f = st.f
    nan = ~np.isfinite(f)
    conv = (np.maximum(st.res_h, st.res_g) < cfg.alm.epsilon_con)
    lsfail = st.lb_status < 0
    print(f"width={width} scan={use_scan}: {dt:.1f}s done={st.done.mean()*100:.1f}% "
          f"conv={conv.mean()*100:.2f}% nan_f={nan.mean()*100:.2f}% "
          f"ls_err={lsfail.mean()*100:.2f}% evals_mean={st.evals.mean():.0f}",
          flush=True)
    return conv, nan


import sys as _sys
which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
if which in ("all", "4096"):
    conv4, _ = run_width(4096, False)
    np.save("/tmp/conv4.npy", conv4)
if which in ("all", "8192"):
    conv8, _ = run_width(8192, False)
    conv4 = np.load("/tmp/conv4.npy")
    both = conv4 & ~conv8
    print(f"lanes conv@4k but not @8k: {both.sum()} "
          f"({both.mean()*100:.2f}%)", flush=True)
if which in ("all", "scan"):
    conv8s, _ = run_width(8192, True)
    conv4 = np.load("/tmp/conv4.npy")
    both2 = conv4 & ~conv8s
    print(f"lanes conv@4k but not @8k-scan: {both2.sum()} "
          f"({both2.mean()*100:.2f}%)", flush=True)
