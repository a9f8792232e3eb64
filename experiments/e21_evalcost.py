"""e21 (round 4): where does a solver evaluation's wall time go TODAY?

e20's surprise: int_K=8 (half the gather items) ran SLOWER than K=16 at
width 2048, contradicting the round-3 roofline (gather items ~90% of the
eval).  Either the platform drifted mid-sweep (PLATFORM_NOTES §11) or the
cost structure changed.  This measures, in one session:

  1. per-eval wall via chained value_and_grad chains (e14b method:
     x_{i+1} = x_i + eps*g_i forces sequential evals, no caching), for
     {K16, K8} x {pair, packed} x widths {512, 2048};
  2. the compiled HLO op census of one fused eval (fusion count ~ kernel
     launches ~ the fixed per-eval floor).
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
grid_pair = jax.device_put(tgrid.with_pair_table(base))
grid_packed = jax.device_put(tgrid.with_packed_table(
    tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)


def make_x0(B, shape):
    x0s, bounds = [], []
    for _ in range(B):
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


def chain_fn(shape, exact, n_evals):
    duals = alm.DualState(lam=jnp.zeros((shape.equal_num,), jnp.float32),
                          mu=jnp.zeros((shape.non_equal_num,), jnp.float32),
                          rho=jnp.asarray(1.0, jnp.float32))

    def one(x, b, sc, g):
        def body(c, _):
            x, acc = c
            f, gr = jax.value_and_grad(alm.inner_cost)(
                x, b, shape, g, cfg.alm, duals, sc, exact)
            return (x + 1e-6 * gr, acc + f), None
        (xo, acc), _ = jax.lax.scan(body, (x, 0.0), None, length=n_evals)
        return acc

    return jax.jit(lambda xs, bs, scs, g: jax.vmap(
        lambda x, b, sc: one(x, b, sc, g))(xs, bs, scs).sum())


N_EVALS = 32
for K in (16, 8):
    shape = alm.ProblemShape(10, 20, K)
    for tname, g, exact in (("pair", grid_pair, True),
                            ("packed", grid_packed, False)):
        for W in (512, 2048):
            xs, bs = make_x0(W, shape)
            scs = jax.jit(lambda xs_, bs_, g_: jax.vmap(
                lambda x, b: alm._make_scaling(x, b, shape, g_, cfg.alm))(
                xs_, bs_))(xs, bs, g)
            fn = chain_fn(shape, exact, N_EVALS)
            float(fn(xs, bs, scs, g))  # compile+warm
            t0 = time.time()
            for _ in range(3):
                float(fn(xs, bs, scs, g))
            dt = (time.time() - t0) / 3
            per_eval = dt / N_EVALS
            print(f"K={K:2d} {tname:6s} W={W:5d} "
                  f"eval={per_eval*1e3:7.2f}ms "
                  f"({per_eval/W*1e6:6.3f} us/lane)", flush=True)

# HLO fusion census of one eval body (what sets the per-iteration floor)
shape = alm.ProblemShape(10, 20, 16)
xs, bs = make_x0(512, shape)
scs = jax.jit(lambda xs_, bs_, g_: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g_, cfg.alm))(
    xs_, bs_))(xs, bs, grid_pair)
f = jax.jit(lambda x, b, sc, g: jax.vmap(lambda xi, bi, sci:
    jax.value_and_grad(alm.inner_cost)(
        xi, bi, shape, g, cfg.alm,
        alm.DualState(lam=jnp.zeros((shape.equal_num,), jnp.float32),
                      mu=jnp.zeros((shape.non_equal_num,), jnp.float32),
                      rho=jnp.asarray(1.0, jnp.float32)), sci,
        True))(x, b, sc)[0].sum())
txt = f.lower(xs, bs, scs, grid_pair).compile().as_text()
import collections
ops = collections.Counter()
for ln in txt.splitlines():
    ln = ln.strip()
    for kind in ("fusion", "custom-call", "gather", "scatter", "dot(",
                 "while", "copy("):
        if ln.startswith("%") or " = " in ln:
            if f" {kind}" in ln or ln.split("=")[-1].strip().startswith(kind):
                ops[kind] += 1
print("HLO census (one fused eval, W=512, K16/pair):", dict(ops),
      flush=True)
print(f"HLO total lines: {len(txt.splitlines())}", flush=True)
