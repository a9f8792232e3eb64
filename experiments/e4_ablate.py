"""Ablate the fused eval at B=8192 (chained) to locate the 4.7 us/lane."""
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
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from uneven_planner_tpu.minco import uniform
from bench import make_batch

cfg = scene_config("hill")
grid = jax.device_put(
    tgrid.with_pair_table(make_synthetic_grid(cfg.map, dtype=np.float32)))
shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
B = 8192
CHAIN = 16
rng = np.random.default_rng(0)
x0s, bounds, _ = make_batch(B, cfg, shape, rng)
duals = alm.DualState(
    lam=jnp.zeros((B, shape.equal_num), jnp.float32),
    mu=jnp.zeros((B, shape.non_equal_num), jnp.float32),
    rho=jnp.full((B,), cfg.alm.rho, jnp.float32))
scaling = alm.Scaling(
    scale_fx=jnp.ones((B,), jnp.float32),
    scale_cx=jnp.broadcast_to(
        alm.default_scale_cx(shape, cfg.alm, jnp.float32),
        (B, 7, shape.equal_num)))


def fake_tv(grid_, px, py, yaw):
    sig = 0.01 * (jnp.sin(3 * px) * jnp.cos(2 * py) + 1.0)
    zb0 = 0.05 * jnp.sin(px + yaw)
    zb1 = 0.05 * jnp.cos(py)
    c = jnp.sqrt(jnp.maximum(1.0 - zb0 ** 2 - zb1 ** 2, 1e-12))
    inv_c = 1.0 / c
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    t = cy * zb0 + sy * zb1
    s = sy * zb0 - cy * zb1
    sq = jnp.sqrt(jnp.maximum(1.0 - t * t, 1e-12))
    return jnp.stack([1.0 / sq, -c * t / sq, sq * inv_c, s / sq, c, inv_c,
                      sig])


def run_case(name, per_lane_fn, grad=True):
    def step(xs, _):
        if grad:
            f, g = jax.vmap(jax.value_and_grad(per_lane_fn))(xs)
            xs = xs - 1e-6 * g
        else:
            f = jax.vmap(per_lane_fn)(xs)
            xs = xs + 1e-6 * jnp.mean(f)
        return xs, jnp.sum(f)

    def chained(xs):
        xs, fs = jax.lax.scan(step, xs, None, length=CHAIN)
        return jnp.sum(fs)

    jf = jax.jit(chained)
    seeds = [x0s + 1e-3 * i for i in range(4)]
    out = jf(seeds[0])
    jax.block_until_ready(out)
    ts = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        out = jf(seeds[i])
        float(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / CHAIN
    print(f"{name:40s}: {dt*1e3:8.3f} ms/eval  {dt/B*1e6:7.3f} us/lane",
          flush=True)


bb = jax.tree.map(lambda a: a[0], bounds)  # captured; vmap over x only


def mk(idx):
    b = jax.tree.map(lambda a: a[idx], bounds)
    d = jax.tree.map(lambda a: a[idx], duals)
    s = jax.tree.map(lambda a: a[idx], scaling)
    return b, d, s


# per-lane closures capturing the batch via explicit indexing is awkward;
# simplest: close over single-lane params shared by all lanes (fine for
# timing).
b0 = jax.tree.map(lambda a: a[0], bounds)
d0 = jax.tree.map(lambda a: a[0], duals)
s0 = jax.tree.map(lambda a: a[0], scaling)

full = lambda x: alm.inner_cost(x, b0, shape, grid, cfg.alm, d0, s0)
run_case("full fwd+grad", full)
run_case("full fwd only", full, grad=False)

orig = tgrid.get_terrain_variables_cm
tgrid.get_terrain_variables_cm = fake_tv
run_case("stub-terrain fwd+grad",
         lambda x: alm.inner_cost(x, b0, shape, grid, cfg.alm, d0, s0))
tgrid.get_terrain_variables_cm = orig


def coeffs_only(x):
    cT_xy, Tp_xy, cT_yaw, Tp_yaw, T = alm._coeffs_norm_cm(x, b0, shape)
    return jnp.sum(cT_xy) + jnp.sum(cT_yaw) + T


run_case("coeffs only fwd+grad", coeffs_only)


def sample_only(x):
    sv, _ = alm._sample_kernel(x, b0, shape, grid, cfg.alm)
    return jnp.sum(sv.vx) + jnp.sum(sv.sigma) + jnp.sum(sv.nonh)


run_case("coeffs+sample+terrain fwd+grad", sample_only)

tgrid.get_terrain_variables_cm = fake_tv
run_case("coeffs+sample stub-terrain fwd+grad", sample_only)
tgrid.get_terrain_variables_cm = orig


def jerk_only(x):
    cT_xy, Tp_xy, cT_yaw, Tp_yaw, T = alm._coeffs_norm_cm(x, b0, shape)
    return (uniform.jerk_cost_norm_cm(cT_xy, Tp_xy, shape.piece_xy)
            + uniform.jerk_cost_norm_cm(cT_yaw, Tp_yaw, shape.piece_yaw))


run_case("coeffs+jerk fwd+grad", jerk_only)
