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
                   grid: tgrid.TerrainGrid, cfg: ALMConfig):
    """Evaluate all constraint sample quantities (the fused hot kernel;
    mirrors alm_traj_opt.cpp:710-817)."""
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
                                        tgrid.normalize_so2(yaw))
    inv_cos_vphix, sin_phix = tv[0], tv[1]
    inv_cos_vphiy, sin_phiy = tv[2], tv[3]
    cos_xi, inv_cos_xi, sigma = tv[4], tv[5], tv[6]

    cyaw_, syaw_ = jnp.cos(yaw), jnp.sin(yaw)
    v_norm = jnp.sqrt(vel[0] * vel[0] + vel[1] * vel[1])
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


def inner_cost(x, bound, shape, grid, cfg, duals: DualState,
               scaling: Scaling):
    """The L-BFGS objective (innerCallback, alm_traj_opt.cpp:280-347)."""
    sv, (cT_xy, Tp_xy, cT_yaw, Tp_yaw, T) = _sample_kernel(
        x, bound, shape, grid, cfg)
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
    return jerk + user + cost_h + cost_g + time_cost


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


def lbfgs_params_from(cfg: ALMConfig) -> lbfgs.LBFGSParams:
    return lbfgs.LBFGSParams(
        mem_size=cfg.mem_size, g_epsilon=cfg.g_epsilon, past=cfg.past,
        delta=cfg.delta, max_iterations=int(cfg.inner_max_iter),
        max_linesearch=cfg.max_linesearch, min_step=cfg.min_step,
        f_dec_coeff=cfg.f_dec_coeff, s_curv_coeff=cfg.s_curv_coeff,
        cautious_factor=cfg.cautious_factor, machine_prec=cfg.machine_prec)


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
