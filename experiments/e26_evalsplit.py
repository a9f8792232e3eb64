"""e26 (round 5): decompose the raw fused eval at K8/packed/w2048.

e21 (re-run round 5, same session): raw value_and_grad(inner_cost) is
4.44 us/lane (9.08 ms at w2048).  The packed-table gather accounts for
only ~2 ms of that (pair->packed delta = 5.3 ns/item, matching the
measured gather-unit rate), so ~7 ms sits in non-gather math that a
flop count says should cost well under 1 ms.  This measures, chained
(e14b method, no caching), each stage of the eval pipeline:

  matmul   — coeffs + sample matmuls only (pos/vel/acc/yaw fields)
  lookup   — + packed terrain gather + 7-tuple (forward)
  fwd      — full inner_cost forward
  grad     — full value_and_grad (the e21 number)
  lookgrad — value_and_grad of sum(7-tuple) (autodiff through lookup)

Differences isolate: the VJP cost, the constraint/PHR tail, and the
lookup forward itself.
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
from uneven_planner_tpu.minco import uniform
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from uneven_planner_tpu import manager

cfg = scene_config("hill")
base = make_synthetic_grid(cfg.map, dtype=np.float32)
grid = jax.device_put(tgrid.with_packed_table(tgrid.with_pair_table(base)))
rng = np.random.default_rng(0)
shape = alm.ProblemShape(10, 20, 8)
W = int(os.environ.get("E26_W", "2048"))
N_EVALS = 32
_P = jax.lax.Precision.HIGHEST


def make_batch(B):
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


duals = alm.DualState(lam=jnp.zeros((shape.equal_num,), jnp.float32),
                      mu=jnp.zeros((shape.non_equal_num,), jnp.float32),
                      rho=jnp.asarray(1.0, jnp.float32))


def fields(x, b):
    """coeffs + sample matmuls -> (pos[2,S], yaw[S])"""
    N, K = shape.piece_xy, shape.int_K
    S = N * (K + 1)
    cT_xy, Tp_xy, cT_yaw, Tp_yaw, T = alm._coeffs_norm_cm(x, b, shape)
    SXY, SYAW = uniform.sample_matrices(N, shape.piece_yaw, K)
    sxy = jnp.matmul(cT_xy, jnp.asarray(SXY.T, x.dtype), precision=_P)
    syaw2 = jnp.matmul(cT_yaw, jnp.asarray(SYAW.T, x.dtype), precision=_P)[0]
    return sxy[:, :S], syaw2[:S]


def f_matmul(x, b, sc):
    pos, yaw = fields(x, b)
    return jnp.sum(pos) + jnp.sum(yaw)


def f_lookup(x, b, sc):
    pos, yaw = fields(x, b)
    tv = tgrid.get_terrain_variables_cm(grid, pos[0], pos[1],
                                        tgrid.normalize_so2(yaw),
                                        exact=False)
    return jnp.sum(tv)


def f_fwd(x, b, sc):
    return alm.inner_cost(x, b, shape, grid, cfg.alm, duals, sc, False)


def chain(fn, use_grad):
    def one(x, b, sc):
        def body(c, _):
            x, acc = c
            if use_grad:
                f, gr = jax.value_and_grad(fn)(x, b, sc)
                return (x + 1e-6 * gr, acc + f), None
            f = fn(x, b, sc)
            return (x + 1e-9 * f * jnp.ones_like(x), acc + f), None
        (xo, acc), _ = jax.lax.scan(body, (x, 0.0), None, length=N_EVALS)
        return acc
    return jax.jit(lambda xs, bs, scs: jax.vmap(one)(xs, bs, scs).sum())


xs, bs = make_batch(W)
scs = jax.jit(lambda xs_, bs_: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, grid, cfg.alm))(
    xs_, bs_))(xs, bs)

for name, fn, g in (("matmul_fwd", f_matmul, False),
                    ("matmul_grad", f_matmul, True),
                    ("lookup_fwd", f_lookup, False),
                    ("lookup_grad", f_lookup, True),
                    ("cost_fwd", f_fwd, False),
                    ("cost_grad", f_fwd, True)):
    c = chain(fn, g)
    float(c(xs, bs, scs))  # compile+warm
    t0 = time.time()
    for _ in range(3):
        float(c(xs, bs, scs))
    dt = (time.time() - t0) / 3 / N_EVALS
    print(f"{name:12s} W={W:5d} eval={dt*1e3:7.2f}ms "
          f"({dt/W*1e6:6.3f} us/lane)", flush=True)
