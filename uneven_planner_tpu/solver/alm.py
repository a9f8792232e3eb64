"""PHR Augmented-Lagrangian MINCO trajectory optimizer.

TPU-native re-design of the reference ALMTrajOpt (reference:
src/uneven_planner/back_end/src/alm_traj_opt.cpp and
back_end/include/back_end/alm_traj_opt.h).  One trajectory optimization is a
pure function of (terrain grid, boundary states, init guess); thousands run
in parallel under `vmap`/`shard_map`.

Decision vector x = [tau, inner_xy (Nxy-1 x 2 flattened), inner_yaw
(Nyaw-1)], with a single log-time tau giving uniform piece times
T_piece = expC2(tau)/N (alm_traj_opt.h:232-261).

The inner objective (alm_traj_opt.cpp:280-347 innerCallback +
:663-991 calConstrainCostGrad) is written as a single differentiable
sampling kernel: per xy piece, int_K+1 samples evaluate the polynomial
bases (MXU matmuls), gather terrain variables, and accumulate

  scale_trick * scale_fx * jerk  +  sum omega * sigma^2
  + PHR(nonholonomic equality)   +  PHR(6 inequalities, active-set form)
  + rho_T * expC2(tau) * scale_fx

JAX autodiff through this kernel and through the MINCO block solve
reproduces the reference's ~700 lines of hand-written chain rule
(innerCallback's gdC/gdT accumulation + calGradCTtoQT adjoint) exactly —
the hand gradients ARE the derivative of this computation.

The PHR outer loop (dual updates alm_traj_opt.h:132-138, convergence
:140-151) runs under `lax.while_loop` around the batched L-BFGS.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from uneven_planner_tpu.config import ALMConfig
from uneven_planner_tpu.minco import minco, uniform
from uneven_planner_tpu.minco.traj import SE2Traj
from uneven_planner_tpu.solver import lbfgs
from uneven_planner_tpu.terrain import grid as tgrid

_P = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_P)


# ---------------------------------------------------------------------------
# tau <-> T maps (alm_traj_opt.h:232-261)
# ---------------------------------------------------------------------------

def expC2(tau):
    """T = e^tau via the C2 rational surrogate."""
    pos = (0.5 * tau + 1.0) * tau + 1.0
    neg = 1.0 / ((0.5 * tau - 1.0) * tau + 1.0)
    return jnp.where(tau > 0.0, pos, neg)


def logC2(T):
    """tau = ln(T) inverse of expC2."""
    big = jnp.sqrt(jnp.maximum(2.0 * T - 1.0, 0.0)) - 1.0
    small = 1.0 - jnp.sqrt(jnp.maximum(2.0 / jnp.maximum(T, 1e-12) - 1.0, 0.0))
    return jnp.where(T > 1.0, big, small)


# ---------------------------------------------------------------------------
# Problem spec
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ProblemShape:
    piece_xy: int
    piece_yaw: int
    int_K: int

    @property
    def num_vars(self):
        return 1 + 2 * (self.piece_xy - 1) + (self.piece_yaw - 1)

    @property
    def equal_num(self):
        return self.piece_xy * (self.int_K + 1)

    @property
    def non_equal_num(self):
        return 6 * self.equal_num


class Boundary(NamedTuple):
    """Boundary PVA states: rows (pos; vel; acc)."""
    head_xy: jax.Array   # [3, 2]
    tail_xy: jax.Array   # [3, 2]
    head_yaw: jax.Array  # [3, 1]
    tail_yaw: jax.Array  # [3, 1]


class DualState(NamedTuple):
    lam: jax.Array       # [E] equality multipliers
    mu: jax.Array        # [I] inequality multipliers
    rho: jax.Array       # scalar penalty


class Scaling(NamedTuple):
    scale_fx: jax.Array  # scalar
    scale_cx: jax.Array  # [7, S] channel-major per-constraint scale


def unpack(x, shape: ProblemShape):
    nxy = shape.piece_xy
    nyaw = shape.piece_yaw
    tau = x[0]
    pxy = x[1:1 + 2 * (nxy - 1)].reshape(nxy - 1, 2)
    pyaw = x[1 + 2 * (nxy - 1):].reshape(nyaw - 1, 1)
    return tau, pxy, pyaw


def pack(tau, pxy, pyaw):
    return jnp.concatenate([jnp.atleast_1d(tau), pxy.reshape(-1),
                            pyaw.reshape(-1)])


def _coeffs_norm(x, bound: Boundary, shape: ProblemShape):
    """Normalized MINCO coefficients via the constant-inverse fast path
    (uniform piece times — see minco/uniform.py)."""
    tau, pxy, pyaw = unpack(x, shape)
    T = expC2(tau)
    Tp_xy = T / shape.piece_xy
    Tp_yaw = T / shape.piece_yaw
    cn_xy = uniform.generate_norm(pxy, Tp_xy, bound.head_xy, bound.tail_xy,
                                  shape.piece_xy)
    cn_yaw = uniform.generate_norm(pyaw, Tp_yaw, bound.head_yaw,
                                   bound.tail_yaw, shape.piece_yaw)
    return cn_xy, Tp_xy, cn_yaw, Tp_yaw, T


def _coeffs_norm_cm(x, bound: Boundary, shape: ProblemShape):
    """Channel-major normalized coefficients ([Dim, 6N] transposed layout —
    the solver-internal convention that keeps the sample minor dim large)."""
    tau, pxy, pyaw = unpack(x, shape)
    T = expC2(tau)
    Tp_xy = T / shape.piece_xy
    Tp_yaw = T / shape.piece_yaw
    cT_xy = uniform.generate_norm_cm(pxy, Tp_xy, bound.head_xy,
                                     bound.tail_xy, shape.piece_xy)
    cT_yaw = uniform.generate_norm_cm(pyaw, Tp_yaw, bound.head_yaw,
                                      bound.tail_yaw, shape.piece_yaw)
    return cT_xy, Tp_xy, cT_yaw, Tp_yaw, T


def _coeffs(x, bound: Boundary, shape: ProblemShape):
    """Physical coefficients + piece-time vectors (for trajectory output)."""
    cn_xy, Tp_xy, cn_yaw, Tp_yaw, T = _coeffs_norm(x, bound, shape)
    c_xy = uniform.denormalize(cn_xy, Tp_xy)
    c_yaw = uniform.denormalize(cn_yaw, Tp_yaw)
    ts_xy = jnp.full((shape.piece_xy,), Tp_xy, x.dtype)
    ts_yaw = jnp.full((shape.piece_yaw,), Tp_yaw, x.dtype)
    return c_xy, ts_xy, c_yaw, ts_yaw, T


class SampleValues(NamedTuple):
    """Per-sample physical quantities, flat over the S = Nxy*(K+1) sampling
    grid (sample s = i*(K+1)+j is piece i, fraction j/K).  All channel-major
    ([2, S] / [S]) so the TPU lane padding stays ~1x instead of the 16-64x a
    small trailing channel dim would pay under (8, 128) tiling."""
    pos: jax.Array       # [2, S]
    vel: jax.Array       # [2, S]
    acc: jax.Array       # [2, S]
    yaw: jax.Array       # [S]
    dyaw: jax.Array      # [S]
    vx: jax.Array        # body-frame forward speed (terrain-corrected)
    ax: jax.Array        # longitudinal acceleration incl. gravity
    ay: jax.Array        # lateral acceleration incl. gravity
    curv_snorm: jax.Array
    cos_xi: jax.Array
    sigma: jax.Array
    nonh: jax.Array      # v . (sin yaw, -cos yaw)


def _sample_kernel(x, bound: Boundary, shape: ProblemShape,
                   grid: tgrid.TerrainGrid, cfg: ALMConfig,
                   exact: bool = True):
    """Evaluate all constraint sample quantities (the fused hot kernel;
    mirrors alm_traj_opt.cpp:710-817).

    exact=False uses the bf16-packed 2-item terrain lookup when the grid
    carries one (solver iteration evals); exact=True is the f32 reference
    path (final residuals, parity oracles)."""
    N, K = shape.piece_xy, shape.int_K
    K1 = K + 1
    S = N * K1
    cT_xy, Tp_xy, cT_yaw, Tp_yaw, T = _coeffs_norm_cm(x, bound, shape)

    # All sampling operators are compile-time constants (uniform times):
    # one dense matmul maps coefficients to every sample's value/du/d2u2,
    # with the reference's locate-yaw-piece-by-global-time
    # (alm_traj_opt.cpp:747-764) folded in statically.
    SXY, SYAW = uniform.sample_matrices(N, shape.piece_yaw, K)
    sxy = jnp.matmul(cT_xy, jnp.asarray(SXY.T, x.dtype),
                     precision=_P)                           # [2, 3S]
    pos = sxy[:, :S]
    vel = sxy[:, S:2 * S] / Tp_xy
    acc = sxy[:, 2 * S:] / (Tp_xy * Tp_xy)
    syaw2 = jnp.matmul(cT_yaw, jnp.asarray(SYAW.T, x.dtype),
                       precision=_P)[0]                      # [2S]
    yaw = syaw2[:S]
    dyaw = syaw2[S:] / Tp_yaw

    # terrain 7-tuple at every sample, channel-major [7, S]
    tv = tgrid.get_terrain_variables_cm(grid, pos[0], pos[1],
                                        tgrid.normalize_so2(yaw),
                                        exact=exact)
    inv_cos_vphix, sin_phix = tv[0], tv[1]
    inv_cos_vphiy, sin_phiy = tv[2], tv[3]
    cos_xi, inv_cos_xi, sigma = tv[4], tv[5], tv[6]

    cyaw_, syaw_ = jnp.cos(yaw), jnp.sin(yaw)
    # floor under the norm: d(sqrt)/dx at exactly 0 is NaN, and a single
    # zero-velocity sample would poison the whole gradient (measured: wide
    # TPU tilings flush denormal vel^2 to zero and a NaN gradient then gets
    # ACCEPTED by the Wolfe test — NaN comparisons are False — killing the
    # lane; root cause of the round-1 ">4k-lane NaN corruption")
    v_norm = jnp.sqrt(jnp.maximum(vel[0] * vel[0] + vel[1] * vel[1],
                                  1e-24))
    lon_acc = acc[0] * cyaw_ + acc[1] * syaw_
    lat_acc = -acc[0] * syaw_ + acc[1] * cyaw_
    g = grid.gravity

    vx = v_norm * inv_cos_vphix
    wz = dyaw * inv_cos_xi
    ax = lon_acc * inv_cos_vphix + g * sin_phix
    ay = lat_acc * inv_cos_vphiy + g * sin_phiy
    curv_snorm = wz * wz / (vx * vx + cfg.delta_sigl)
    nonh = vel[0] * syaw_ - vel[1] * cyaw_

    return SampleValues(pos=pos, vel=vel, acc=acc, yaw=yaw, dyaw=dyaw,
                        vx=vx, ax=ax, ay=ay, curv_snorm=curv_snorm,
                        cos_xi=cos_xi, sigma=sigma, nonh=nonh), \
        (cT_xy, Tp_xy, cT_yaw, Tp_yaw, T)


import functools as _functools
import numpy as _np


@_functools.lru_cache(maxsize=None)
def _trapz_weights(N: int, K: int):
    """Flat [S] trapezoid weights: 0.5 at each piece's first/last sample
    (alm_traj_opt.cpp:819-827)."""
    w = _np.ones((K + 1,), _np.float64)
    w[0] = w[-1] = 0.5
    return _np.tile(w, N)


def raw_constraints(x, bound, shape, grid, cfg):
    """Unscaled constraint values h [S] and g [6, S] (channel-major) over
    the flat sample grid, in the reference ordering {vel, acc_lon, acc_lat,
    curv, att, sigma} (alm_traj_opt.cpp:829-946)."""
    sv, _ = _sample_kernel(x, bound, shape, grid, cfg)
    h = sv.nonh
    g = jnp.stack([
        sv.vx ** 2 - cfg.max_vel ** 2,
        sv.ax ** 2 - cfg.max_acc_lon ** 2,
        sv.ay ** 2 - cfg.max_acc_lat ** 2,
        sv.curv_snorm - cfg.max_kap ** 2,
        cfg.min_cxi - sv.cos_xi,
        sv.sigma - cfg.max_sig,
    ])
    return h, g


def default_scale_cx(shape: ProblemShape, cfg: ALMConfig, dtype):
    """Constraint scaling when use_scaling is off: 1 except the fixed
    cur_scale / sig_scale factors (alm_traj_opt.cpp:891-893,929-932).
    Channel-major [7, S]: row 0 the non-holonomic equality, rows 1-6 the
    inequalities in reference order."""
    sc = jnp.ones((7, shape.equal_num), dtype)
    sc = sc.at[4].set(cfg.cur_scale)
    sc = sc.at[6].set(cfg.sig_scale)
    return sc


def smooth_cost(x, bound, shape, grid, cfg, scale_fx):
    """scale-fx-weighted smooth part: jerk energy + sigma^2 running cost +
    rho_T * total time (the 'fx' of initScaling, alm_traj_opt.cpp:365-370,
    507-519,633-636; trick factor applied by the caller)."""
    sv, (cT_xy, Tp_xy, cT_yaw, Tp_yaw, T) = _sample_kernel(
        x, bound, shape, grid, cfg)
    jerk = uniform.jerk_cost_norm_cm(cT_xy, Tp_xy, shape.piece_xy) \
        + uniform.jerk_cost_norm_cm(cT_yaw, Tp_yaw, shape.piece_yaw)
    step = Tp_xy / shape.int_K
    w = jnp.asarray(_trapz_weights(shape.piece_xy, shape.int_K), x.dtype)
    user = cfg.rho_ter * step * jnp.sum(w * sv.sigma ** 2)
    time_cost = cfg.rho_T * T
    return jerk, (user + time_cost) * scale_fx


def inner_cost_aux(x, bound, shape, grid, cfg, duals: DualState,
                   scaling: Scaling, exact: bool = True):
    """`inner_cost` returning (cost, (h_scaled [E], g_scaled [I])) — the
    scaled constraint values fall out of the same forward pass, so the ALM
    dual update costs no extra kernel evaluation (cf. the reference's
    separate post-solve constraint pass, alm_traj_opt.cpp:234-271)."""
    return _inner_cost_impl(x, bound, shape, grid, cfg, duals, scaling,
                            exact)


def inner_cost(x, bound, shape, grid, cfg, duals: DualState,
               scaling: Scaling, exact: bool = True):
    """The L-BFGS objective (innerCallback, alm_traj_opt.cpp:280-347)."""
    return _inner_cost_impl(x, bound, shape, grid, cfg, duals, scaling,
                            exact)[0]


def _inner_cost_impl(x, bound, shape, grid, cfg, duals: DualState,
                     scaling: Scaling, exact: bool = True):
    sv, (cT_xy, Tp_xy, cT_yaw, Tp_yaw, T) = _sample_kernel(
        x, bound, shape, grid, cfg, exact)
    trick = cfg.scale_trick_jerk if cfg.use_scaling else 1.0
    jerk = (uniform.jerk_cost_norm_cm(cT_xy, Tp_xy, shape.piece_xy)
            + uniform.jerk_cost_norm_cm(cT_yaw, Tp_yaw, shape.piece_yaw)) \
        * scaling.scale_fx * trick

    step = Tp_xy / shape.int_K
    w = jnp.asarray(_trapz_weights(shape.piece_xy, shape.int_K), x.dtype)
    user = cfg.rho_ter * step * scaling.scale_fx * \
        jnp.sum(w * sv.sigma ** 2)

    rho = duals.rho
    sc = scaling.scale_cx  # [7, S] channel-major

    # equality (non-holonomic): PHR term h(lam + 0.5 rho h)
    h = sv.nonh * sc[0]
    cost_h = jnp.sum(h * (duals.lam + 0.5 * rho * h))

    # inequalities with active-set branch (alm_traj_opt.cpp:840-946)
    g_raw = jnp.stack([
        sv.vx ** 2 - cfg.max_vel ** 2,
        sv.ax ** 2 - cfg.max_acc_lon ** 2,
        sv.ay ** 2 - cfg.max_acc_lat ** 2,
        sv.curv_snorm - cfg.max_kap ** 2,
        cfg.min_cxi - sv.cos_xi,
        sv.sigma - cfg.max_sig,
    ])
    g = (g_raw * sc[1:7]).reshape(-1)
    mu = duals.mu
    active = rho * g + mu > 0
    cost_g = jnp.sum(jnp.where(active,
                               g * (mu + 0.5 * rho * g),
                               -0.5 * mu * mu / rho))

    time_cost = cfg.rho_T * T * scaling.scale_fx
    return jerk + user + cost_h + cost_g + time_cost, (h, g)


# ---------------------------------------------------------------------------
# initScaling (alm_traj_opt.cpp:349-661)
# ---------------------------------------------------------------------------

def init_scaling(x0, bound, shape, grid, cfg) -> Scaling:
    """scale_fx = 1/max(1, ||grad fx(x0)||_inf); per-constraint
    scale_cx[k] = 1/max(1, ||grad c_k(x0)||_inf)."""
    def fx(x):
        jerk, rest = smooth_cost(x, bound, shape, grid, cfg,
                                 jnp.asarray(1.0, x.dtype))
        return jerk + rest

    gfx = jax.grad(fx)(x0)
    scale_fx = 1.0 / jnp.maximum(1.0, jnp.max(jnp.abs(gfx)))

    def cons(x):
        h, g = raw_constraints(x, bound, shape, grid, cfg)
        return jnp.concatenate([h[None, :], g]).reshape(-1)  # [7S] ch-major

    # jacfwd: n_vars (~40) JVP columns instead of n_constraints (~1200) VJP
    # rows — an order of magnitude cheaper for this Jacobian shape
    J = jax.jacfwd(cons)(x0)  # [7S, n]
    norms = jnp.max(jnp.abs(J), axis=-1)
    scale_cx = (1.0 / jnp.maximum(1.0, norms)).reshape(7, shape.equal_num)
    return Scaling(scale_fx=scale_fx, scale_cx=scale_cx)


# ---------------------------------------------------------------------------
# PHR-ALM outer loop (alm_traj_opt.cpp:168-278)
# ---------------------------------------------------------------------------

class ALMResult(NamedTuple):
    x: jax.Array
    traj: SE2Traj
    converged: jax.Array
    outer_iters: jax.Array
    inner_iters: jax.Array
    res_h: jax.Array
    res_g: jax.Array
    lbfgs_status: jax.Array
    # total cost+gradient evaluations per lane (the flat solver's unit of
    # work; the wall-time roofline is evals x per-eval gather cost).  The
    # nested `solve` path reports -1 (it does not count line-search evals).
    evals: jax.Array | None = None
    # final multipliers/penalty per lane (only populated by
    # solve_flat_compacted(return_duals=True); the warm-start harvest).
    duals: DualState | None = None


def lbfgs_params_from(cfg: ALMConfig) -> lbfgs.LBFGSParams:
    return lbfgs.LBFGSParams(
        mem_size=cfg.mem_size, g_epsilon=cfg.g_epsilon, past=cfg.past,
        delta=cfg.delta, max_iterations=int(cfg.inner_max_iter),
        max_linesearch=cfg.max_linesearch, min_step=cfg.min_step,
        f_dec_coeff=cfg.f_dec_coeff, s_curv_coeff=cfg.s_curv_coeff,
        cautious_factor=cfg.cautious_factor, machine_prec=cfg.machine_prec,
        f_noise_rel=cfg.f_noise_rel)


def solve(x0, bound: Boundary, shape: ProblemShape,
          grid: tgrid.TerrainGrid, cfg: ALMConfig,
          lbfgs_overrides: dict | None = None,
          warm_duals: DualState | None = None) -> ALMResult:
    """One full ALM solve (vmap over leading axes of x0/bound to batch).

    `warm_duals` warm-starts the multipliers/penalty — the replanning analog
    of the reference's carried MPC warm-start state (SURVEY.md §5
    checkpoint/resume)."""
    dtype = x0.dtype
    E, I = shape.equal_num, shape.non_equal_num

    if cfg.use_scaling:
        scaling = init_scaling(x0, bound, shape, grid, cfg)
    else:
        scaling = Scaling(scale_fx=jnp.asarray(1.0, dtype),
                          scale_cx=default_scale_cx(shape, cfg, dtype))

    lb_params = lbfgs_params_from(cfg)
    if lbfgs_overrides:
        lb_params = dataclasses.replace(lb_params, **lbfgs_overrides)

    def scaled_constraints(x):
        h_raw, g_raw = raw_constraints(x, bound, shape, grid, cfg)
        h = h_raw * scaling.scale_cx[0]
        g = (g_raw * scaling.scale_cx[1:7]).reshape(-1)
        return h, g

    class Carry(NamedTuple):
        x: jax.Array
        duals: DualState
        it: jax.Array
        done: jax.Array
        inner_iters: jax.Array
        res_h: jax.Array
        res_g: jax.Array
        lbfgs_status: jax.Array

    def cond(c: Carry):
        return ~c.done

    def body(c: Carry):
        fun = jax.value_and_grad(
            lambda x: inner_cost(x, bound, shape, grid, cfg, c.duals,
                                 scaling))
        res = lbfgs.minimize(fun, c.x, lb_params)
        h, g = scaled_constraints(res.x)
        rho = c.duals.rho
        lam = c.duals.lam + rho * h
        mu = jnp.maximum(c.duals.mu + rho * g, 0.0)
        rho_new = jnp.minimum((1.0 + cfg.gamma) * rho, cfg.beta)
        # judgeConvergence with updated duals (alm_traj_opt.cpp:257-259)
        res_h = jnp.max(jnp.abs(h))
        res_g = jnp.max(jnp.maximum(g, -mu / rho_new))
        converged = jnp.maximum(res_h, res_g) < cfg.epsilon_con
        it = c.it + 1
        done = converged | (it > cfg.max_iter)
        return Carry(x=res.x,
                     duals=DualState(lam=lam, mu=mu, rho=rho_new),
                     it=it, done=done,
                     inner_iters=c.inner_iters + res.iters,
                     res_h=res_h, res_g=res_g, lbfgs_status=res.status)

    duals0 = warm_duals if warm_duals is not None else DualState(
        lam=jnp.zeros((E,), dtype), mu=jnp.zeros((I,), dtype),
        rho=jnp.asarray(cfg.rho, dtype))
    init = Carry(
        x=x0,
        duals=duals0,
        it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        inner_iters=jnp.asarray(0, jnp.int32),
        res_h=jnp.asarray(jnp.inf, dtype), res_g=jnp.asarray(jnp.inf, dtype),
        lbfgs_status=jnp.asarray(0, jnp.int32))

    out = jax.lax.while_loop(cond, body, init)

    c_xy, ts_xy, c_yaw, ts_yaw, _ = _coeffs(out.x, bound, shape)
    traj = SE2Traj(c_xy=c_xy, ts_xy=ts_xy, c_yaw=c_yaw, ts_yaw=ts_yaw)
    converged = jnp.maximum(out.res_h, out.res_g) < cfg.epsilon_con
    return ALMResult(x=out.x, traj=traj, converged=converged,
                     outer_iters=out.it, inner_iters=out.inner_iters,
                     res_h=out.res_h, res_g=out.res_g,
                     lbfgs_status=out.lbfgs_status)


# ---------------------------------------------------------------------------
# Flattened single-loop solver (the TPU throughput path)
# ---------------------------------------------------------------------------

class _FlatState(NamedTuple):
    # current accepted iterate (+ its scaled constraints, cached for duals)
    x: jax.Array
    f: jax.Array
    g: jax.Array
    h: jax.Array          # [E] scaled equality at x
    gc: jax.Array         # [I] scaled inequality at x
    # L-BFGS memory
    S: jax.Array
    Y: jax.Array
    YS: jax.Array
    end: jax.Array
    bound: jax.Array
    k: jax.Array
    pf: jax.Array
    # line search (Lewis-Overton bracket)
    d: jax.Array
    stp: jax.Array
    ls_lo: jax.Array
    ls_hi: jax.Array
    brackt: jax.Array
    touched: jax.Array
    ls_count: jax.Array
    dgtest: jax.Array
    dstest: jax.Array
    # ALM outer
    duals: DualState
    o_it: jax.Array
    res_h: jax.Array
    res_g: jax.Array
    lb_status: jax.Array
    # control
    reeval: jax.Array     # next eval (re)starts L-BFGS under current duals
    done: jax.Array
    evals: jax.Array
    inner_iters: jax.Array


def solve_flat(x0, bound: Boundary, shape: ProblemShape,
               grid: tgrid.TerrainGrid, cfg: ALMConfig,
               lbfgs_overrides: dict | None = None,
               warm_duals: DualState | None = None) -> ALMResult:
    """`solve` with ALM outer loop, L-BFGS iteration, and Lewis-Overton line
    search flattened into ONE `lax.while_loop` whose body performs exactly
    one cost+gradient evaluation.

    Per lane this follows the same evaluation sequence as the nested
    `solve` (same line-search bracketing, cautious memory updates, PHR dual
    updates).  The point is batching: under `vmap` the nested loops run in
    lockstep per nesting level, so a batch pays
    max_outer x max_inner x max_linesearch iterations — the flat loop pays
    only max over lanes of TOTAL evaluations (~5-8x fewer on the hill
    benchmark).  The dual update consumes the constraint values that the
    accepted evaluation already produced (inner_cost_aux), so outer rounds
    cost no extra kernel pass."""
    scaling = _make_scaling(x0, bound, shape, grid, cfg)
    p = lbfgs_params_from(cfg)
    if lbfgs_overrides:
        p = dataclasses.replace(p, **lbfgs_overrides)
    init = flat_init(x0, shape, cfg, p, warm_duals)

    def cond(s: _FlatState):
        return ~s.done

    def body(s: _FlatState):
        return flat_step(s, bound, scaling, shape, grid, cfg, p)

    out = jax.lax.while_loop(cond, body, init)
    return flat_result(out, bound, shape, cfg, grid, scaling)


def _make_scaling(x0, bound, shape, grid, cfg) -> Scaling:
    if cfg.use_scaling:
        return init_scaling(x0, bound, shape, grid, cfg)
    return Scaling(scale_fx=jnp.asarray(1.0, x0.dtype),
                   scale_cx=default_scale_cx(shape, cfg, x0.dtype))


def flat_init(x0, shape: ProblemShape, cfg: ALMConfig,
              p: lbfgs.LBFGSParams,
              warm_duals: DualState | None = None) -> _FlatState:
    dtype = x0.dtype
    E, I = shape.equal_num, shape.non_equal_num
    n = x0.shape[0]
    m = p.mem_size
    npast = max(p.past, 1)
    duals0 = warm_duals if warm_duals is not None else DualState(
        lam=jnp.zeros((E,), dtype), mu=jnp.zeros((I,), dtype),
        rho=jnp.asarray(cfg.rho, dtype))
    return _FlatState(
        x=x0, f=jnp.asarray(jnp.inf, dtype), g=jnp.zeros((n,), dtype),
        h=jnp.zeros((E,), dtype), gc=jnp.zeros((I,), dtype),
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        YS=jnp.zeros((m,), dtype),
        end=jnp.asarray(0, jnp.int32), bound=jnp.asarray(0, jnp.int32),
        k=jnp.asarray(1, jnp.int32),
        pf=jnp.full((npast,), jnp.inf, dtype),
        d=jnp.zeros((n,), dtype), stp=jnp.zeros((), dtype),
        ls_lo=jnp.zeros((), dtype), ls_hi=jnp.asarray(p.max_step, dtype),
        brackt=jnp.asarray(False), touched=jnp.asarray(False),
        ls_count=jnp.asarray(0, jnp.int32),
        dgtest=jnp.zeros((), dtype), dstest=jnp.zeros((), dtype),
        duals=duals0,
        o_it=jnp.asarray(0, jnp.int32),
        res_h=jnp.asarray(jnp.inf, dtype), res_g=jnp.asarray(jnp.inf, dtype),
        lb_status=jnp.asarray(0, jnp.int32),
        reeval=jnp.asarray(True), done=jnp.asarray(False),
        evals=jnp.asarray(0, jnp.int32),
        inner_iters=jnp.asarray(0, jnp.int32))


def flat_step(s: _FlatState, bound: Boundary, scaling: Scaling,
              shape: ProblemShape, grid, cfg: ALMConfig,
              p: lbfgs.LBFGSParams) -> _FlatState:
    """One flat-solver step: exactly one cost+grad evaluation plus masked
    line-search / L-BFGS / ALM bookkeeping."""
    dtype = s.x.dtype
    m = p.mem_size
    npast = max(p.past, 1)

    x_t = s.x + s.stp * s.d
    (f_t, (h_t, g_t)), grad_t = jax.value_and_grad(
        inner_cost_aux, has_aux=True)(x_t, bound, shape, grid, cfg,
                                      s.duals, scaling, False)
    if True:  # keep the original body indentation below
        rv = s.reeval

        # ---- line-search decision (lbfgs.hpp:276-389), masked by ~reeval
        # a nonfinite GRADIENT must also reject the step: NaN wolfe/armijo
        # comparisons are False, so without this check a NaN-grad step is
        # silently accepted and the NaN rides the L-BFGS memory forever
        bad = ~jnp.isfinite(f_t) | ~jnp.all(jnp.isfinite(grad_t))
        early = (p.past > 0) & (jnp.abs(s.f - f_t) / (jnp.abs(s.f) + 1.0)
                                < p.delta / npast)
        armijo_fail = f_t > s.f + s.stp * s.dgtest \
            + p.f_noise_rel * (jnp.abs(s.f) + 1.0)
        dg = _dot(grad_t, s.d)
        wolfe_fail = dg < s.dstest
        accepted = ~rv & ~bad & (early | (~armijo_fail & ~wolfe_fail))

        ls_hi_n = jnp.where(armijo_fail, s.stp, s.ls_hi)
        brackt_n = s.brackt | armijo_fail
        ls_lo_n = jnp.where(~armijo_fail & wolfe_fail, s.stp, s.ls_lo)
        width_small = brackt_n & ((ls_hi_n - ls_lo_n)
                                  < p.machine_prec * ls_hi_n)
        count = s.ls_count + 1
        max_ls = count >= p.max_linesearch
        stp_new = jnp.where(brackt_n, 0.5 * (ls_lo_n + ls_hi_n), s.stp * 2.0)
        below_min = stp_new < p.min_step
        above_max = stp_new > p.max_step
        stp_cont = jnp.where(above_max & ~s.touched, p.max_step, stp_new)
        touched_n = s.touched | above_max

        ls_err = jnp.where(bad, lbfgs.ERR_INVALIDFUNCVAL, 0)
        ls_err = jnp.where((ls_err == 0) & max_ls,
                           lbfgs.ERR_MAXLINESEARCH, ls_err)
        ls_err = jnp.where((ls_err == 0) & width_small,
                           lbfgs.ERR_WIDTHTOOSMALL, ls_err)
        ls_err = jnp.where((ls_err == 0) & below_min,
                           lbfgs.ERR_MINSTEP, ls_err)
        ls_err = jnp.where((ls_err == 0) & above_max & s.touched,
                           lbfgs.ERR_MAXSTEP, ls_err)
        ls_fail = ~rv & ~accepted & (ls_err < 0)
        step_done = accepted | ls_fail          # one L-BFGS iteration ends

        # ---- iterate update (accept / revert / fresh-start)
        take_new = accepted | rv
        x_n = jnp.where(take_new, x_t, s.x)
        f_n = jnp.where(take_new, f_t, s.f)
        g_n = jnp.where(take_new, grad_t, s.g)
        h_n = jnp.where(take_new, h_t, s.h)
        gc_n = jnp.where(take_new, g_t, s.gc)

        # ---- L-BFGS iteration bookkeeping (lbfgs.hpp:585-677)
        gnorm = jnp.max(jnp.abs(g_n))
        xnorm = jnp.max(jnp.abs(x_n))
        conv = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
        rate = jnp.abs(s.pf[jnp.mod(s.k, npast)] - f_n) \
            / jnp.maximum(1.0, jnp.abs(f_n))
        stop = (p.past > 0) & (s.k >= p.past) & (rate < p.delta) & ~rv
        maxit = (p.max_iterations > 0) & (s.k >= p.max_iterations) & ~rv

        status = jnp.where(ls_fail, ls_err, lbfgs.RUNNING)
        status = jnp.where((status == 0) & conv, lbfgs.CONVERGENCE, status)
        status = jnp.where((status == 0) & stop, lbfgs.STOP, status)
        status = jnp.where((status == 0) & maxit, lbfgs.MAXITER, status)
        # fresh start: only immediate-convergence terminates (lbfgs.hpp:497)
        status = jnp.where(rv, jnp.where(conv, lbfgs.CONVERGENCE,
                                         lbfgs.RUNNING), status)
        lb_done = (step_done | rv) & (status != lbfgs.RUNNING)

        pf_n = jnp.where(rv, jnp.full((npast,), jnp.inf, dtype).at[0]
                         .set(f_t),
                         jnp.where(step_done,
                                   s.pf.at[jnp.mod(s.k, npast)].set(f_n),
                                   s.pf))
        # cautious memory update (only on a real accepted step)
        s_vec = x_t - s.x
        y_vec = grad_t - s.g
        ys_new = _dot(y_vec, s_vec)
        cau = _dot(s_vec, s_vec) * jnp.linalg.norm(s.g) * p.cautious_factor
        # relative curvature floor: near convergence `cau` underflows to 0
        # (denormal; wide-batch tilings flush it), letting a ~0 ys into the
        # memory whose 1/ys then produces an inf/NaN two-loop direction
        # (root cause of the round-1 "wide-batch corruption", e12 trace)
        ys_floor = 1e-10 * jnp.sqrt(_dot(s_vec, s_vec)
                                    * _dot(y_vec, y_vec))
        acc_mem = accepted & (ys_new > jnp.maximum(cau, ys_floor))
        S_n = jnp.where(rv, jnp.zeros_like(s.S),
                        jnp.where(acc_mem, s.S.at[s.end].set(s_vec), s.S))
        Y_n = jnp.where(rv, jnp.zeros_like(s.Y),
                        jnp.where(acc_mem, s.Y.at[s.end].set(y_vec), s.Y))
        YS_n = jnp.where(rv, jnp.zeros_like(s.YS),
                         jnp.where(acc_mem, s.YS.at[s.end].set(ys_new),
                                   s.YS))
        end_n = jnp.where(rv, 0, jnp.where(acc_mem,
                                           jnp.mod(s.end + 1, m), s.end))
        bound_n = jnp.where(rv, 0, jnp.where(acc_mem,
                                             jnp.minimum(s.bound + 1, m),
                                             s.bound))
        k_n = jnp.where(rv, 1, jnp.where(step_done, s.k + 1, s.k))
        inner_n = s.inner_iters + jnp.where(step_done, 1, 0)

        # ---- new search direction when an iteration (or fresh start) ends
        newest = jnp.mod(end_n - 1, m)
        use_mem = bound_n > 0
        ys0 = jnp.where(use_mem, YS_n[newest], 1.0)
        yy0 = jnp.where(use_mem, _dot(Y_n[newest], Y_n[newest]), 1.0)
        d_mem = lbfgs._two_loop(g_n, S_n, Y_n, YS_n, end_n, bound_n,
                                ys0, yy0, m, unroll=p.two_loop_unroll)
        # nonfinite two-loop output (pathological memory) -> steepest descent
        d_new = jnp.where(use_mem & jnp.all(jnp.isfinite(d_mem)), d_mem,
                          -g_n)
        dginit = _dot(g_n, d_new)
        # non-descent direction is an immediate L-BFGS error
        bad_dir = (step_done | rv) & ~lb_done & (dginit > 0.0)
        status = jnp.where(bad_dir, lbfgs.ERR_INCREASEGRADIENT, status)
        lb_done = lb_done | bad_dir

        # ---- ALM outer round completion (dual update, alm_traj_opt.h:132-151)
        rho = s.duals.rho
        lam_u = s.duals.lam + rho * h_n
        mu_u = jnp.maximum(s.duals.mu + rho * gc_n, 0.0)
        rho_u = jnp.minimum((1.0 + cfg.gamma) * rho, cfg.beta)
        res_h_u = jnp.max(jnp.abs(h_n))
        res_g_u = jnp.max(jnp.maximum(gc_n, -mu_u / rho_u))
        conv_outer = jnp.maximum(res_h_u, res_g_u) < cfg.epsilon_con
        o_it_u = s.o_it + 1
        done_u = conv_outer | (o_it_u > cfg.max_iter)

        sel = lambda new, old: jnp.where(lb_done, new, old)
        duals_n = DualState(lam=sel(lam_u, s.duals.lam),
                            mu=sel(mu_u, s.duals.mu),
                            rho=sel(rho_u, s.duals.rho))
        o_it_n = sel(o_it_u, s.o_it)
        done_n = lb_done & done_u
        reeval_n = lb_done & ~done_u

        # ---- next line-search state
        fresh = (step_done | rv) & ~lb_done
        stp_fresh = jnp.where(rv, 1.0 / jnp.maximum(
            jnp.linalg.norm(d_new), p.machine_prec), jnp.ones((), dtype))
        d_n = jnp.where(fresh, d_new, s.d)
        stp_n = jnp.where(reeval_n, 0.0,
                          jnp.where(fresh, stp_fresh, stp_cont))
        dg_n = jnp.where(fresh, dginit, 0.0)
        dgtest_n = jnp.where(fresh, p.f_dec_coeff * dg_n, s.dgtest)
        dstest_n = jnp.where(fresh, p.s_curv_coeff * dg_n, s.dstest)
        ls_lo_f = jnp.where(fresh, 0.0, ls_lo_n)
        ls_hi_f = jnp.where(fresh, p.max_step, ls_hi_n)
        brackt_f = jnp.where(fresh, False, brackt_n)
        touched_f = jnp.where(fresh, False, touched_n)
        count_f = jnp.where(fresh | rv, 0, count)
        d_n = jnp.where(reeval_n, jnp.zeros_like(d_n), d_n)

        return _FlatState(
            x=x_n, f=f_n, g=g_n, h=h_n, gc=gc_n,
            S=S_n, Y=Y_n, YS=YS_n, end=end_n, bound=bound_n, k=k_n,
            pf=pf_n, d=d_n, stp=stp_n,
            ls_lo=ls_lo_f, ls_hi=ls_hi_f, brackt=brackt_f,
            touched=touched_f, ls_count=count_f,
            dgtest=dgtest_n, dstest=dstest_n,
            duals=duals_n, o_it=o_it_n,
            res_h=sel(res_h_u, s.res_h), res_g=sel(res_g_u, s.res_g),
            lb_status=jnp.where(step_done | rv, status, s.lb_status)
            .astype(jnp.int32),
            reeval=reeval_n, done=done_n,
            evals=s.evals + 1, inner_iters=inner_n)


def flat_run(state: _FlatState, bound: Boundary, scaling: Scaling,
             shape: ProblemShape, grid, cfg: ALMConfig,
             p: lbfgs.LBFGSParams, max_steps: int) -> _FlatState:
    """Advance the flat solver by at most `max_steps` evaluations (or until
    done) — the jitted unit of the compacted batch driver."""
    def cond(c):
        s, i = c
        return (~s.done) & (i < max_steps)

    def body(c):
        s, i = c
        return flat_step(s, bound, scaling, shape, grid, cfg, p), i + 1

    out, _ = jax.lax.while_loop(cond, body,
                                (state, jnp.asarray(0, jnp.int32)))
    return out


def exact_residuals(x, duals: DualState, bound: Boundary,
                    shape: ProblemShape, grid, cfg: ALMConfig,
                    scaling: Scaling):
    """(res_h, res_g) on the exact f32 terrain path (judgeConvergence
    semantics, alm_traj_opt.h:140-151).

    Validation utility: with the split hi+lo packed table the iteration
    path's field error is <= ~4e-6 — three orders below epsilon_con=1e-3 —
    so the solver terminates AND reports on its own residuals; tests use
    this to confirm the two agree (round-2's flat-bf16 table at ~4e-3
    needed an exact re-check per retiring lane, which cost a full
    constraint pass per compaction round for every live lane)."""
    h_raw, g_raw = raw_constraints(x, bound, shape, grid, cfg)
    h = h_raw * scaling.scale_cx[0]
    g = (g_raw * scaling.scale_cx[1:7]).reshape(-1)
    res_h = jnp.max(jnp.abs(h))
    res_g = jnp.max(jnp.maximum(g, -duals.mu / duals.rho))
    return res_h, res_g


def flat_result(out: _FlatState, bound: Boundary, shape: ProblemShape,
                cfg: ALMConfig, grid=None,
                scaling: Scaling | None = None) -> ALMResult:
    c_xy, ts_xy, c_yaw, ts_yaw, _ = _coeffs(out.x, bound, shape)
    traj = SE2Traj(c_xy=c_xy, ts_xy=ts_xy, c_yaw=c_yaw, ts_yaw=ts_yaw)
    converged = jnp.maximum(out.res_h, out.res_g) < cfg.epsilon_con
    return ALMResult(x=out.x, traj=traj, converged=converged,
                     outer_iters=out.o_it, inner_iters=out.inner_iters,
                     res_h=out.res_h, res_g=out.res_g,
                     lbfgs_status=out.lb_status, evals=out.evals)


def debug_iterates(x0, bound: Boundary, shape: ProblemShape, grid,
                   cfg: ALMConfig, max_evals: int = 256,
                   lbfgs_overrides: dict | None = None):
    """Optimization stepper: the reference's `in_debug` mode publishes the
    intermediate trajectory after every L-BFGS iteration
    (alm_traj_opt.cpp:993-1017 earlyExit + debug_pub).  This returns the
    same information as arrays: one flat-solver evaluation per row.

    Returns dict with
      x      [max_evals, n]  iterate after each evaluation
      f      [max_evals]     objective value
      outer  [max_evals]     ALM outer-round index
      inner  [max_evals]     L-BFGS iteration counter
      valid  [max_evals]     False once the solve finished (rows frozen)
    Downstream, `minco.traj`/`api` can evaluate any row's trajectory for
    visualization (see examples/debug_stepper.py).
    """
    scaling = _make_scaling(x0, bound, shape, grid, cfg)
    p = lbfgs_params_from(cfg)
    if lbfgs_overrides:
        p = dataclasses.replace(p, **lbfgs_overrides)
    s0 = flat_init(x0, shape, cfg, p)

    def step(s, _):
        s2 = flat_step(s, bound, scaling, shape, grid, cfg, p)
        s3 = jax.tree.map(lambda new, old: jnp.where(s.done, old, new),
                          s2, s)
        return s3, (s3.x, s3.f, s3.o_it, s3.inner_iters, ~s.done)

    _, (xs, fs, outer, inner, valid) = jax.lax.scan(
        step, s0, None, length=max_evals)
    return {"x": xs, "f": fs, "outer": outer, "inner": inner,
            "valid": valid}


class _SmallResult(NamedTuple):
    """Per-lane result core, cheap enough to pull through the device
    tunnel (~180 B/lane vs ~20 KB/lane for the full _FlatState)."""
    x: jax.Array
    o_it: jax.Array
    inner_iters: jax.Array
    res_h: jax.Array
    res_g: jax.Array
    lb_status: jax.Array
    evals: jax.Array


class _SmallResultD(NamedTuple):
    """_SmallResult plus the final duals (warm-start harvest: ~5 KB/lane
    at K=16, so only pulled when return_duals=True)."""
    x: jax.Array
    o_it: jax.Array
    inner_iters: jax.Array
    res_h: jax.Array
    res_g: jax.Array
    lb_status: jax.Array
    evals: jax.Array
    lam: jax.Array
    mu: jax.Array
    rho: jax.Array


def _broadcast_warm_duals(warm_duals: DualState, B: int) -> DualState:
    """Accept a single prior DualState ([E]/[I]/scalar) or a per-lane batch
    ([B,E]/[B,I]/[B]) and return the batched form."""
    if warm_duals.lam.ndim == 1:
        return DualState(
            lam=jnp.broadcast_to(warm_duals.lam, (B,) + warm_duals.lam.shape),
            mu=jnp.broadcast_to(warm_duals.mu, (B,) + warm_duals.mu.shape),
            rho=jnp.broadcast_to(warm_duals.rho, (B,)))
    return warm_duals


def solve_flat_compacted(x0s, bounds, shape: ProblemShape, grid,
                         cfg: ALMConfig, lbfgs_overrides: dict | None = None,
                         chunk_steps: int = 96, buckets=(1, 4, 16),
                         max_dispatch: int = 4096,
                         retry_width: int | None = 1024,
                         warm_duals: DualState | None = None,
                         return_duals: bool = False):
    """See _solve_flat_compacted; batches wider than `max_dispatch` are
    processed in sequential slices, and unconverged lanes get one narrow
    retry pass.

    Both knobs exist because this TPU platform's wide programs are not
    slot-invariant past lane 2048: identical lanes compute different
    results when placed in slots >= 2048 of a 4096-wide dispatch
    (root-caused round 5, PLATFORM_NOTES.md §16 — the mechanism behind
    the earlier "wide-batch NaN corruption" readings of §7).  Widths 512
    and 2048 are bit-identical per lane, so max_dispatch 2048 is the
    verified numerics boundary; the narrow retry pass re-solves rare
    casualties (marginal lanes hit by line-search noise), and genuinely
    unconvergeable lanes re-fail deterministically and keep their honest
    converged=False flag."""
    import numpy as np

    B = x0s.shape[0]
    if warm_duals is not None:
        warm_duals = _broadcast_warm_duals(warm_duals, B)
    wslice = lambda sl: (None if warm_duals is None
                         else jax.tree.map(lambda a: a[sl], warm_duals))
    if B <= max_dispatch:
        res = _solve_flat_compacted(x0s, bounds, shape, grid, cfg,
                                    lbfgs_overrides, chunk_steps, buckets,
                                    warm_duals, return_duals)
    else:
        parts = []
        for lo in range(0, B, max_dispatch):
            sl = slice(lo, min(lo + max_dispatch, B))
            parts.append(_solve_flat_compacted(
                x0s[sl], jax.tree.map(lambda a: a[sl], bounds), shape, grid,
                cfg, lbfgs_overrides, chunk_steps, buckets,
                wslice(sl), return_duals))
        res = jax.tree.map(lambda *a: jnp.concatenate(a), *parts)

    if retry_width is None or max_dispatch <= retry_width:
        return res
    bad = np.nonzero(~np.asarray(res.converged))[0]
    if bad.size == 0 or bad.size > B // 4:
        return res
    # pad the retry batch to a power-of-two width so the retry programs have
    # stable shapes across calls (the number of casualties varies per batch;
    # unpadded it would force a fresh compile every time)
    width = 64
    while width < bad.size:
        width *= 2
    width = min(width, retry_width, B)
    pad_idx = np.concatenate([bad, np.full(max(0, width - bad.size),
                                           bad[0])])[:width]
    ip = jnp.asarray(pad_idx.astype(np.int32))
    redo = solve_flat_compacted(
        x0s[ip], jax.tree.map(lambda a: a[ip], bounds), shape, grid, cfg,
        lbfgs_overrides, chunk_steps, buckets,
        max_dispatch=retry_width, retry_width=None,
        warm_duals=wslice(ip), return_duals=return_duals)
    nb = min(bad.size, width)
    ii = jnp.asarray(bad[:nb].astype(np.int32))
    redo_trim = jax.tree.map(lambda a: a[:nb], redo)
    return jax.tree.map(lambda full, part: full.at[ii].set(part), res,
                        redo_trim)


@_functools.lru_cache(maxsize=None)
def _compacted_fns(shape: ProblemShape, cfg: ALMConfig,
                   p: "lbfgs.LBFGSParams", chunk_steps: int,
                   return_duals: bool):
    """Process-lifetime jitted programs for the compacted driver, keyed by
    the static solver configuration.  jax.jit caches one trace/compile per
    input SHAPE internally, so every bucket width shares these callables.

    Round-3 design bug (found via e22, round 4): the driver re-created its
    jit wrappers per solve call, so every invocation re-TRACED the
    chunk_steps-step while-loop body at every bucket size — several
    seconds of pure host work per call that dwarfed the device time
    (measured 14.7 s wall for a solve whose device work is ~2.8 s)."""
    run = jax.jit(lambda st, bd, sc, g: jax.vmap(
        lambda s_, b_, c_: flat_run(s_, b_, c_, shape, g, cfg, p,
                                    chunk_steps))(st, bd, sc))
    take = jax.jit(lambda tree, ii: jax.tree.map(lambda a: a[ii], tree))

    # in-loop residuals are authoritative: the split hi+lo packed table's
    # <=4e-6 field error is three orders below epsilon_con, so no exact
    # re-evaluation pass is needed at chunk boundaries (the round-2
    # flat-bf16 table paid one full constraint pass per round)
    def small(st):
        core = dict(x=st.x, o_it=st.o_it, inner_iters=st.inner_iters,
                    res_h=st.res_h, res_g=st.res_g,
                    lb_status=st.lb_status, evals=st.evals)
        if return_duals:
            return _SmallResultD(**core, lam=st.duals.lam, mu=st.duals.mu,
                                 rho=st.duals.rho)
        return _SmallResult(**core)

    scal = jax.jit(lambda xs, bs, g: jax.vmap(
        lambda x, b: _make_scaling(x, b, shape, g, cfg))(xs, bs))
    init_cold = jax.jit(jax.vmap(lambda x: flat_init(x, shape, cfg, p)))
    init_warm = jax.jit(jax.vmap(
        lambda x, wd: flat_init(x, shape, cfg, p, wd)))

    def fin_one(x, b):
        c_xy, ts_xy, c_yaw, ts_yaw, _ = _coeffs(x, b, shape)
        return SE2Traj(c_xy=c_xy, ts_xy=ts_xy, c_yaw=c_yaw, ts_yaw=ts_yaw)

    finalize = jax.jit(lambda xs_, bs: jax.vmap(fin_one)(xs_, bs))
    return run, take, jax.jit(small), scal, init_cold, init_warm, finalize


def _solve_flat_compacted(x0s, bounds, shape: ProblemShape, grid,
                          cfg: ALMConfig, lbfgs_overrides: dict | None = None,
                          chunk_steps: int = 96, buckets=(1, 4, 16),
                          warm_duals: DualState | None = None,
                          return_duals: bool = False):
    """Batched flat solve that compacts surviving lanes every `chunk_steps`
    evaluations.

    The flat loop already reduced lockstep waste to max-lane TOTAL evals;
    this driver attacks the residual tail (max ~4x mean on the hill
    benchmark) by retiring finished lanes between bounded-step rounds, so
    late rounds run at a fraction of the batch width.  Per-lane results are
    identical to `solve_flat` (no cross-lane coupling).

    All compaction happens ON DEVICE (jitted gathers at bucketed sizes);
    only the [nlive] done mask and the finished lanes' ~180-byte result
    cores cross the host boundary — pulling the full solver state per round
    costs minutes over a tunneled device (measured).
    """
    import numpy as np

    B = x0s.shape[0]
    p = lbfgs_params_from(cfg)
    if lbfgs_overrides:
        p = dataclasses.replace(p, **lbfgs_overrides)
    (run_fn, take_fn, small_fn, scal_fn, init_cold, init_warm,
     finalize) = _compacted_fns(shape, cfg, p, chunk_steps, return_duals)

    scalings = scal_fn(x0s, bounds, grid)
    if warm_duals is None:
        states = init_cold(x0s)
    else:
        states = init_warm(x0s, warm_duals)

    sizes = sorted({max(1, B // b) for b in buckets} | {B}, reverse=True)

    # host-side accumulators for the small result
    acc = None
    idx = np.arange(B)
    cur = (states, bounds, scalings)
    cur_size = B

    while True:
        nlive = len(idx)
        out = run_fn(cur[0], cur[1], cur[2], grid)
        done = np.asarray(out.done)[:nlive]
        fin = np.nonzero(done)[0]
        if fin.size or done.all():
            # gather ONLY the finished lanes on device before pulling: the
            # full small result is ~0.3 KB/lane and this tunnel moves ~MB/s,
            # so pulling all live lanes every round cost seconds per solve
            # (e23); padded to power-of-two widths for stable jit shapes
            fw = 64
            while fw < fin.size:
                fw *= 2
            fin_pad = np.concatenate(
                [fin, np.zeros(fw - fin.size, np.int64)])[:fw]
            small_fin = take_fn(small_fn(out), jnp.asarray(
                fin_pad.astype(np.int32)))
            host_small = jax.tree.map(lambda a: np.asarray(a), small_fin)
            if acc is None:
                acc = jax.tree.map(
                    lambda a: np.zeros((B,) + a.shape[1:], a.dtype),
                    host_small)
            for f, hs in zip(acc, host_small):
                f[idx[fin]] = hs[:fin.size]
        still = np.nonzero(~done)[0]
        if still.size == 0:
            break
        to_size = min([s for s in sizes if s >= still.size],
                      default=sizes[0])
        pad = np.zeros(to_size - still.size, np.int32)
        ii = jnp.asarray(np.concatenate([still.astype(np.int32), pad]))
        cur = take_fn((out, cur[1], cur[2]), ii)
        idx = idx[still]
        cur_size = to_size

    small_t = _SmallResultD if return_duals else _SmallResult
    small_all = small_t(*[jnp.asarray(a) for a in acc])
    xs = small_all.x
    traj = finalize(xs, bounds)
    converged = jnp.maximum(small_all.res_h, small_all.res_g) \
        < cfg.epsilon_con
    duals = (DualState(lam=small_all.lam, mu=small_all.mu,
                       rho=small_all.rho) if return_duals else None)
    return ALMResult(x=xs, traj=traj, converged=converged,
                     outer_iters=small_all.o_it,
                     inner_iters=small_all.inner_iters,
                     res_h=small_all.res_h, res_g=small_all.res_g,
                     lbfgs_status=small_all.lb_status,
                     evals=small_all.evals, duals=duals)


# ---------------------------------------------------------------------------
# Compacted batch driver: retire converged lanes between outer rounds
# ---------------------------------------------------------------------------

class SolveState(NamedTuple):
    """Resumable per-lane ALM state (one outer round at a time)."""
    x: jax.Array
    duals: DualState
    it: jax.Array
    done: jax.Array
    inner_iters: jax.Array
    res_h: jax.Array
    res_g: jax.Array
    lbfgs_status: jax.Array


def init_state(x0, shape: ProblemShape, cfg: ALMConfig) -> SolveState:
    dtype = x0.dtype
    E, I = shape.equal_num, shape.non_equal_num
    return SolveState(
        x=x0,
        duals=DualState(lam=jnp.zeros((E,), dtype), mu=jnp.zeros((I,), dtype),
                        rho=jnp.asarray(cfg.rho, dtype)),
        it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        inner_iters=jnp.asarray(0, jnp.int32),
        res_h=jnp.asarray(jnp.inf, dtype), res_g=jnp.asarray(jnp.inf, dtype),
        lbfgs_status=jnp.asarray(0, jnp.int32))


def outer_round(state: SolveState, bound: Boundary, scaling: Scaling,
                shape: ProblemShape, grid, cfg: ALMConfig,
                lb_params: lbfgs.LBFGSParams) -> SolveState:
    """One PHR-ALM outer round (L-BFGS inner solve + dual update +
    convergence test); no-op on lanes already done."""
    fun = jax.value_and_grad(
        lambda x: inner_cost(x, bound, shape, grid, cfg, state.duals,
                             scaling))
    res = lbfgs.minimize(fun, state.x, lb_params)

    h_raw, g_raw = raw_constraints(res.x, bound, shape, grid, cfg)
    h = h_raw * scaling.scale_cx[0]
    g = (g_raw * scaling.scale_cx[1:7]).reshape(-1)
    rho = state.duals.rho
    lam = state.duals.lam + rho * h
    mu = jnp.maximum(state.duals.mu + rho * g, 0.0)
    rho_new = jnp.minimum((1.0 + cfg.gamma) * rho, cfg.beta)
    res_h = jnp.max(jnp.abs(h))
    res_g = jnp.max(jnp.maximum(g, -mu / rho_new))
    converged = jnp.maximum(res_h, res_g) < cfg.epsilon_con
    it = state.it + 1
    done_new = converged | (it > cfg.max_iter)

    keep = state.done
    sel = lambda new, old: jnp.where(keep, old, new)
    return SolveState(
        x=sel(res.x, state.x),
        duals=DualState(lam=sel(lam, state.duals.lam),
                        mu=sel(mu, state.duals.mu),
                        rho=sel(rho_new, state.duals.rho)),
        it=sel(it, state.it), done=sel(done_new, state.done),
        inner_iters=sel(state.inner_iters + res.iters, state.inner_iters),
        res_h=sel(res_h, state.res_h), res_g=sel(res_g, state.res_g),
        lbfgs_status=sel(res.status, state.lbfgs_status))


def result_from_state(state: SolveState, bound: Boundary,
                      shape: ProblemShape, cfg: ALMConfig) -> ALMResult:
    c_xy, ts_xy, c_yaw, ts_yaw, _ = _coeffs(state.x, bound, shape)
    traj = SE2Traj(c_xy=c_xy, ts_xy=ts_xy, c_yaw=c_yaw, ts_yaw=ts_yaw)
    converged = jnp.maximum(state.res_h, state.res_g) < cfg.epsilon_con
    return ALMResult(x=state.x, traj=traj, converged=converged,
                     outer_iters=state.it, inner_iters=state.inner_iters,
                     res_h=state.res_h, res_g=state.res_g,
                     lbfgs_status=state.lbfgs_status)


def solve_compacted(x0s, bounds, shape: ProblemShape, grid, cfg: ALMConfig,
                    lbfgs_overrides: dict | None = None,
                    buckets=(1, 4, 16)):
    """Batched solve that retires converged lanes between outer rounds.

    The vmapped while_loop in `solve` executes every round for every lane
    (done lanes are merely masked), so a batch pays ~max_outer x batch.
    Here a host loop runs one jitted outer round at a time and compacts the
    surviving lanes into smaller buckets (sizes B/b for b in `buckets`),
    saving the masked-lane compute.  Results are bitwise identical to
    `solve` per lane (same round sequence, no cross-lane coupling).
    """
    import numpy as np

    B = x0s.shape[0]
    lb_params = lbfgs_params_from(cfg)
    if lbfgs_overrides:
        lb_params = dataclasses.replace(lb_params, **lbfgs_overrides)

    if cfg.use_scaling:
        scalings = jax.jit(lambda xs, bs, g: jax.vmap(
            lambda x, b: init_scaling(x, b, shape, g, cfg))(xs, bs))(
            x0s, bounds, grid)
    else:
        one = default_scale_cx(shape, cfg, x0s.dtype)
        scalings = Scaling(
            scale_fx=jnp.ones((B,), x0s.dtype),
            scale_cx=jnp.broadcast_to(one, (B,) + one.shape))

    round_fns = {}

    def get_round_fn(n):
        if n not in round_fns:
            round_fns[n] = jax.jit(lambda st, bd, sc, g: jax.vmap(
                lambda s_, b_, c_: outer_round(s_, b_, c_, shape, g, cfg,
                                               lb_params))(st, bd, sc))
        return round_fns[n]

    states = jax.vmap(lambda x: init_state(x, shape, cfg))(x0s)
    final_states = jax.tree.map(lambda a: np.array(a), states)
    idx = np.arange(B)
    cur_states, cur_bounds, cur_scal = states, bounds, scalings

    sizes = sorted({max(1, B // b) for b in buckets}, reverse=True)
    while len(idx) > 0:
        n = len(idx)
        # pick the smallest bucket >= n
        size = min([s for s in sizes if s >= n], default=sizes[0])
        if n < size:  # pad by repeating lane 0
            pad = size - n
            padder = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            cur_states = jax.tree.map(padder, cur_states)
            cur_bounds = jax.tree.map(padder, cur_bounds)
            cur_scal = jax.tree.map(padder, cur_scal)
        out = get_round_fn(size)(cur_states, cur_bounds, cur_scal, grid)
        out_np_done = np.asarray(out.done[:n])
        out_trim = jax.tree.map(lambda a: a[:n], out)
        host = jax.tree.map(lambda a: np.asarray(a), out_trim)
        _scatter_state(final_states, host, idx)
        still = ~out_np_done
        idx = idx[still]
        if len(idx) == 0:
            break
        keepf = lambda a: a[:n][jnp.asarray(still)]
        cur_states = jax.tree.map(keepf, out_trim)
        cur_bounds = jax.tree.map(keepf, cur_bounds)
        cur_scal = jax.tree.map(keepf, cur_scal)

    states = jax.tree.map(jnp.asarray, final_states)
    return jax.jit(jax.vmap(
        lambda s_, b_: result_from_state(s_, b_, shape, cfg)))(
        states, bounds)


def _scatter_state(dst, src, idx):
    for field in src._fields:
        d, s = getattr(dst, field), getattr(src, field)
        if isinstance(s, DualState):
            for f2 in s._fields:
                getattr(d, f2)[idx] = getattr(s, f2)
        else:
            d[idx] = s
