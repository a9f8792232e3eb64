"""Limited-memory BFGS with Lewis–Overton line search, in pure JAX.

Functional re-design of the reference's header-only L-BFGS (reference:
src/uneven_planner/back_end/include/utils/lbfgs.hpp:439-723, line search
:276-389): fixed-size history arrays, `lax.while_loop` control flow, masked
two-loop recursion, cautious updates, and the same convergence semantics
(gradient test, past-delta test, the nonsmooth Armijo/weak-Wolfe line
search including its in-search past-delta early accept, lbfgs.hpp:327-329).

Everything is `vmap`-compatible: batch members that finish early freeze
their state while the rest keep iterating.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_P)

# Status codes (positive = terminated normally, negative = error), mirroring
# the reference's enum semantics (lbfgs.hpp:135-184).
RUNNING = 0
CONVERGENCE = 1
STOP = 2
MAXITER = 3
ERR_MAXLINESEARCH = -1
ERR_MINSTEP = -2
ERR_MAXSTEP = -3
ERR_WIDTHTOOSMALL = -4
ERR_INCREASEGRADIENT = -5
ERR_INVALIDFUNCVAL = -6


@dataclasses.dataclass(frozen=True)
class LBFGSParams:
    mem_size: int = 16
    g_epsilon: float = 1.0e-5
    past: int = 3
    delta: float = 1.0e-6
    max_iterations: int = 64
    max_linesearch: int = 64
    min_step: float = 1.0e-20
    max_step: float = 1.0e20
    f_dec_coeff: float = 1.0e-4
    s_curv_coeff: float = 0.9
    cautious_factor: float = 1.0e-6
    machine_prec: float = 1.0e-16
    # Noise-tolerant Armijo slack: accept f_t <= f + stp*dgtest +
    # f_noise_rel*(|f|+1).  0.0 = exact Lewis-Overton (reference
    # lbfgs.hpp:321 semantics).  Wide-batch compilations of the fused
    # cost kernel evaluate with slightly different numerics than narrow
    # ones (PLATFORM_NOTES §7); near convergence the sufficient-decrease
    # margin shrinks below that noise and the bracketing search churns
    # (~5 evals/accepted step at width 4096 vs 1.7 at width 64, e15/e16).
    # A slack of a few f32 ulps restores narrow-width eval counts without
    # touching the ALM convergence test (which stays exact).
    f_noise_rel: float = 0.0
    # Unroll the two-loop recursion at trace time (python loop) instead of
    # lax.fori_loop.  Same operation sequence, so numerics are unchanged;
    # the point is kernel count: under a vmapped while_loop body the 2*m
    # fori iterations each dispatch their own dynamic-slice + dot kernels
    # (~0.1-0.3 ms apiece on this tunneled TPU, e21/e22 round 4), which —
    # not the terrain gather — is what dominates a production solver step.
    # Unrolled, XLA fuses the chain into the step program.  Costs compile
    # time, so off by default; the bench and batch drivers enable it.
    two_loop_unroll: bool = False


class _LSState(NamedTuple):
    stp: jax.Array
    mu: jax.Array
    nu: jax.Array
    brackt: jax.Array
    touched: jax.Array
    count: jax.Array
    x: jax.Array
    f: jax.Array
    g: jax.Array
    status: jax.Array  # 0 running, 1 accepted, <0 error


def _line_search(fun, xp, fp, gp, d, stp0, p: LBFGSParams):
    """Lewis–Overton line search (lbfgs.hpp:276-389)."""
    dginit = _dot(gp, d)
    dgtest = p.f_dec_coeff * dginit
    dstest = p.s_curv_coeff * dginit

    def cond(s: _LSState):
        return s.status == 0

    def body(s: _LSState):
        x = xp + s.stp * d
        f, g = fun(x)
        count = s.count + 1

        # nonfinite gradient must reject too: NaN Wolfe/Armijo comparisons
        # are False, so a NaN-grad step would otherwise be accepted and
        # poison the L-BFGS memory (see alm.flat_step)
        bad_f = ~jnp.isfinite(f) | ~jnp.all(jnp.isfinite(g))
        # in-search past-delta accept (lbfgs.hpp:327-329)
        early = (p.past > 0) & (jnp.abs(fp - f) / (jnp.abs(fp) + 1.0)
                                < p.delta / max(p.past, 1))
        armijo_fail = f > fp + s.stp * dgtest \
            + p.f_noise_rel * (jnp.abs(fp) + 1.0)
        wolfe_fail = _dot(g, d) < dstest

        accepted = ~bad_f & (early | (~armijo_fail & ~wolfe_fail))

        nu = jnp.where(armijo_fail, s.stp, s.nu)
        brackt = s.brackt | armijo_fail
        mu = jnp.where(~armijo_fail & wolfe_fail, s.stp, s.mu)

        width_small = brackt & ((nu - mu) < p.machine_prec * nu)
        max_ls = count >= p.max_linesearch

        stp_new = jnp.where(brackt, 0.5 * (mu + nu), s.stp * 2.0)
        below_min = stp_new < p.min_step
        above_max = stp_new > p.max_step
        stp_next = jnp.where(above_max & ~s.touched, p.max_step, stp_new)
        touched = s.touched | above_max

        status = jnp.where(bad_f, ERR_INVALIDFUNCVAL, 0)
        status = jnp.where((status == 0) & accepted, 1, status)
        status = jnp.where((status == 0) & max_ls, ERR_MAXLINESEARCH, status)
        status = jnp.where((status == 0) & width_small, ERR_WIDTHTOOSMALL,
                           status)
        status = jnp.where((status == 0) & below_min, ERR_MINSTEP, status)
        status = jnp.where((status == 0) & above_max & s.touched,
                           ERR_MAXSTEP, status)

        return _LSState(stp=jnp.where(status == 0, stp_next, s.stp),
                        mu=mu, nu=nu, brackt=brackt, touched=touched,
                        count=count, x=x, f=f, g=g,
                        status=status.astype(jnp.int32))

    init = _LSState(stp=jnp.asarray(stp0, xp.dtype),
                    mu=jnp.zeros((), xp.dtype),
                    nu=jnp.asarray(p.max_step, xp.dtype),
                    brackt=jnp.asarray(False), touched=jnp.asarray(False),
                    count=jnp.asarray(0, jnp.int32),
                    x=xp, f=fp, g=gp, status=jnp.asarray(0, jnp.int32))
    # a non-descent direction is an immediate error (lbfgs.hpp:303-306)
    init = init._replace(status=jnp.where(dginit > 0.0,
                                          ERR_INCREASEGRADIENT, init.status))
    out = jax.lax.while_loop(cond, body, init)
    return out


class LBFGSResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    status: jax.Array
    iters: jax.Array
    evals: jax.Array


class _State(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    step0: jax.Array
    S: jax.Array
    Y: jax.Array
    YS: jax.Array
    end: jax.Array
    bound: jax.Array
    k: jax.Array
    pf: jax.Array
    evals: jax.Array
    status: jax.Array


def _two_loop(g, S, Y, YS, end, bound, ys, yy, m, unroll=False):
    """Masked two-loop recursion (lbfgs.hpp:687-710).

    unroll=True traces the 2*m iterations inline (identical op sequence,
    so identical numerics) — see LBFGSParams.two_loop_unroll."""
    d = -g
    alpha = jnp.zeros((m,), g.dtype)

    def bwd(i, carry):
        d, alpha = carry
        j = jnp.mod(end - 1 - i, m)
        valid = i < bound
        denom = jnp.where(valid, YS[j], 1.0)
        a = jnp.where(valid, _dot(S[j], d) / denom, 0.0)
        d = d - a * Y[j]
        return d, alpha.at[j].set(a)

    def fwd(i, d):
        j = jnp.mod(end - bound + i, m)
        valid = i < bound
        denom = jnp.where(valid, YS[j], 1.0)
        b = jnp.where(valid, _dot(Y[j], d) / denom, 0.0)
        return d + jnp.where(valid, alpha[j] - b, 0.0) * S[j]

    if unroll:
        carry = (d, alpha)
        for i in range(m):
            carry = bwd(i, carry)
        d, alpha = carry
        d = d * (ys / yy)
        for i in range(m):
            d = fwd(i, d)
        return d

    d, alpha = jax.lax.fori_loop(0, m, bwd, (d, alpha))
    d = d * (ys / yy)
    return jax.lax.fori_loop(0, m, fwd, d)


def minimize(fun: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
             x0: jax.Array, params: LBFGSParams) -> LBFGSResult:
    """Minimize fun (returning (f, grad)) from x0.

    Matches lbfgs_optimize (lbfgs.hpp:439-723): initial steepest-descent step
    1/||d||, per-iteration Lewis–Overton search, convergence when
    ||g||_inf / max(1, ||x||_inf) < g_epsilon or the past-delta test fires.
    """
    p = params
    m = p.mem_size
    n = x0.shape[0]
    dtype = x0.dtype

    f0, g0 = fun(x0)
    gnorm = jnp.max(jnp.abs(g0))
    xnorm = jnp.max(jnp.abs(x0))
    already = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon

    pf = jnp.full((max(p.past, 1),), jnp.inf, dtype).at[0].set(f0)

    init = _State(
        x=x0, f=f0, g=g0,
        step0=1.0 / jnp.linalg.norm(g0),
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        YS=jnp.zeros((m,), dtype),
        end=jnp.asarray(0, jnp.int32), bound=jnp.asarray(0, jnp.int32),
        k=jnp.asarray(1, jnp.int32), pf=pf,
        evals=jnp.asarray(1, jnp.int32),
        status=jnp.where(already, CONVERGENCE, RUNNING).astype(jnp.int32))

    def cond(s: _State):
        return s.status == RUNNING

    def body(s: _State):
        use_mem = s.bound > 0
        newest = jnp.mod(s.end - 1, m)
        ys = jnp.where(use_mem, s.YS[newest], 1.0)
        yy = jnp.where(use_mem,
                       _dot(s.Y[newest], s.Y[newest]), 1.0)
        d_mem = _two_loop(s.g, s.S, s.Y, s.YS, s.end, s.bound, ys, yy, m,
                          unroll=p.two_loop_unroll)
        # nonfinite two-loop output (pathological memory) -> steepest descent
        d = jnp.where(use_mem & jnp.all(jnp.isfinite(d_mem)), d_mem, -s.g)

        ls = _line_search(fun, s.x, s.f, s.g, d, s.step0, p)
        evals = s.evals + ls.count

        # on line-search error: revert and terminate (lbfgs.hpp:575-582)
        fail = ls.status < 0
        x = jnp.where(fail, s.x, ls.x)
        f = jnp.where(fail, s.f, ls.f)
        g = jnp.where(fail, s.g, ls.g)

        gnorm = jnp.max(jnp.abs(g))
        xnorm = jnp.max(jnp.abs(x))
        conv = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon

        # past-delta stopping (lbfgs.hpp:613-630)
        rate = jnp.abs(s.pf[jnp.mod(s.k, max(p.past, 1))] - f) \
            / jnp.maximum(1.0, jnp.abs(f))
        stop = (p.past > 0) & (s.k >= p.past) & (rate < p.delta)
        pf = s.pf.at[jnp.mod(s.k, max(p.past, 1))].set(f)

        maxit = (p.max_iterations > 0) & (s.k >= p.max_iterations)

        status = jnp.where(fail, ls.status, RUNNING)
        status = jnp.where((status == RUNNING) & conv, CONVERGENCE, status)
        status = jnp.where((status == RUNNING) & stop, STOP, status)
        status = jnp.where((status == RUNNING) & maxit, MAXITER, status)

        # memory update with cautious condition (lbfgs.hpp:647-677)
        s_vec = x - s.x
        y_vec = g - s.g
        ys_new = _dot(y_vec, s_vec)
        cau = _dot(s_vec, s_vec) * jnp.linalg.norm(s.g) * p.cautious_factor
        # relative curvature floor (see alm.flat_step): keeps a ~0 ys whose
        # reciprocal would blow up the two-loop out of the memory
        ys_floor = 1e-10 * jnp.sqrt(_dot(s_vec, s_vec)
                                    * _dot(y_vec, y_vec))
        accept = (ys_new > jnp.maximum(cau, ys_floor)) & ~fail
        S = jnp.where(accept, s.S.at[s.end].set(s_vec), s.S)
        Y = jnp.where(accept, s.Y.at[s.end].set(y_vec), s.Y)
        YS = jnp.where(accept, s.YS.at[s.end].set(ys_new), s.YS)
        end = jnp.where(accept, jnp.mod(s.end + 1, m), s.end)
        bound = jnp.where(accept, jnp.minimum(s.bound + 1, m), s.bound)

        return _State(x=x, f=f, g=g,
                      step0=jnp.ones((), dtype), S=S, Y=Y, YS=YS,
                      end=end, bound=bound, k=s.k + 1, pf=pf, evals=evals,
                      status=status.astype(jnp.int32))

    out = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(x=out.x, f=out.f, g=out.g, status=out.status,
                       iters=out.k - 1, evals=out.evals)
