"""Batched dense ADMM QP solver (OSQP-equivalent operator splitting).

The reference MPC solves its condensed QP with OSQP via osqp-eigen
(reference: src/uneven_planner/mpc_controller/src/mpc.cpp:513-542, abs/rel
tol 1e-6).  This is the same algorithm — ADMM with over-relaxation on

    min 1/2 z'Pz + q'z   s.t.  l <= Az <= u

— formulated densely for TPU batching: one Cholesky factorization of
M = P + sigma*I + rho*A'A per QP, then fixed-shape triangular solves per
iteration under `lax.while_loop` with OSQP's termination criteria.  The MPC
QP's P is strictly positive definite (state and input costs all positive),
so the minimizer is unique and matches OSQP's solution to solver tolerance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from functools import partial

_P = jax.lax.Precision.HIGHEST
_mm = partial(jnp.matmul, precision=_P)
from jax.scipy.linalg import cho_factor, cho_solve, lu_factor, lu_solve


def _chol_upper_jax(M):
    """Pure-JAX Cholesky (upper factor, drop-in for cho_factor(M)[0]).

    Right-looking column sweep lowered to plain XLA ops — deliberately NOT
    the CholeskyDecomposition custom-call: on this TPU platform the batched
    factorization custom-call crashes the TPU worker once a program
    executes it more than ~500 x batch times (round-4 isolation: B=256 x 3
    chained QP passes faults, x 2 does not; the ADMM adaptive-rho
    refactorization inside the while_loop multiplies executions far past
    that).  Plain fused elementwise/outer ops have no such failure mode.
    ~9 ms per [256, 150, 150] batch (bandwidth-bound), and factorizations
    are rare next to the in-loop triangular solves, which remain native.
    """
    n = M.shape[-1]
    idx = jnp.arange(n)

    def body(j, K):
        # No pivot clamp: a non-positive diagonal (numerically indefinite
        # KKT) must surface as NaN/inf in the factor so callers can detect
        # the failed factorization — a clamped pivot would yield a
        # finite-but-garbage inverse with no failure signal (LAPACK
        # cho_factor reports failure; this is the analog).  Consumers
        # recover explicitly: polish keeps the unpolished iterate on
        # non-finite output (solve_qp), and the MPC keeps the previous
        # tick's output on a non-finite QP solution (tracker.qp_pass —
        # the reference's OSQP-failure behavior, mpc.cpp:526-539).
        pivot = jnp.sqrt(K[j, j])
        col = K[:, j] / pivot
        below = idx > j
        col_m = jnp.where(below, col, 0.0)
        newcol = jnp.where(idx == j, pivot, jnp.where(below, col, K[:, j]))
        K = K.at[:, j].set(newcol)
        return K - jnp.outer(col_m, col_m)

    return jnp.tril(_fori_scan(n, body, M)).T


def _chol_upper(M):
    """Upper Cholesky factor of an SPD matrix: LAPACK on CPU, the pure-JAX
    sweep on TPU (see _chol_upper_jax for why)."""
    if jax.default_backend() == "cpu":
        return cho_factor(M)[0]
    return _chol_upper_jax(M)


def _tril_inv_jax(L):
    """Pure-JAX inverse of a lower-triangular matrix (row-wise forward
    substitution against I) — same custom-call-avoidance rationale as
    _chol_upper_jax."""
    n = L.shape[-1]
    idx = jnp.arange(n)
    eye = jnp.eye(n, dtype=L.dtype)

    def body(i, X):
        lrow = jnp.where(idx < i, L[i], 0.0)
        row = (eye[i] - _mm(lrow, X)) / L[i, i]
        return X.at[i].set(row)

    return _fori_scan(n, body, jnp.zeros_like(L))


def _spd_inverse(M):
    """Explicit inverse of an SPD matrix.

    The ADMM x-update then becomes ONE MXU matvec per iteration instead of
    two triangular solves.  That is the TPU-native choice on its own
    (substitution is sequential; the matvec rides the MXU), and it is also
    load-bearing on this platform: both the batched Cholesky AND the
    batched TriangularSolve custom-calls crash the TPU worker once a
    program executes them ~1e5 times cumulatively (round-4 isolation:
    vmapped tracking dies between 8x20x3 and 8x35x3 QP passes of ~200
    in-loop cho_solves each).  With the explicit inverse, custom-call
    count per program is ZERO on TPU — factorization and substitution run
    as plain XLA loops once per (re)factorization, never in the hot loop.
    CPU keeps LAPACK for the inverse (tests, f64 oracles).
    """
    if jax.default_backend() == "cpu":
        return jnp.linalg.inv(M)
    U = _chol_upper_jax(M)
    Linv = _tril_inv_jax(U.T)
    return _mm(Linv.T, Linv)




def _fori_scan(n, body, init):
    """fori_loop via lax.scan.  jax.lax.fori_loop lowers to While even for
    static trip counts, and on this TPU platform a While nested under a
    vmapped scan miscompiles (worker kernel fault, round-4 isolation) —
    every loop that can sit under the MPC tracking scan must be a scan."""
    def step(c, i):
        return body(i, c), None
    return jax.lax.scan(step, init, jnp.arange(n))[0]


class QPSolution(NamedTuple):
    x: jax.Array        # [n] primal
    y: jax.Array        # [m] dual
    iters: jax.Array
    r_prim: jax.Array
    r_dual: jax.Array
    converged: jax.Array


def ruiz_equilibrate(P, q, A, l, u, iters: int = 10,
                     min_scale: float = 1e-4, max_scale: float = 1e4):
    """OSQP's modified Ruiz equilibration (OSQP §5.1): iteratively scale
    rows/cols of the KKT data by inverse sqrt inf-norms, plus a cost
    normalization c.  Returns (Pb, qb, Ab, lb, ub, D, E, c) with
      Pb = c D P D, qb = c D q, Ab = E A D, lb/ub = E l/u
    and the unscaling x = D xb, y = c^{-1} E yb.
    """
    n = q.shape[0]
    m = l.shape[0]
    dtype = q.dtype
    D = jnp.ones((n,), dtype)
    E = jnp.ones((m,), dtype)
    c = jnp.asarray(1.0, dtype)
    Pb, qb, Ab = P, q, A

    def body(_, carry):
        Pb, qb, Ab, D, E, c = carry
        # column norms of the [P; A] block for x-variables
        col_p = jnp.max(jnp.abs(Pb), axis=0)
        col_a = jnp.max(jnp.abs(Ab), axis=0)
        dx = 1.0 / jnp.sqrt(jnp.clip(jnp.maximum(col_p, col_a),
                                     min_scale, max_scale))
        # row norms of A for constraint rows
        row_a = jnp.max(jnp.abs(Ab), axis=1)
        de = 1.0 / jnp.sqrt(jnp.clip(row_a, min_scale, max_scale))
        Pb = Pb * dx[:, None] * dx[None, :]
        qb = qb * dx
        Ab = Ab * de[:, None] * dx[None, :]
        D = D * dx
        E = E * de
        # cost scaling: mean column norm of P vs q norm (OSQP eq. 28)
        gamma = 1.0 / jnp.clip(
            jnp.maximum(jnp.mean(jnp.max(jnp.abs(Pb), axis=0)),
                        jnp.max(jnp.abs(qb))), min_scale, max_scale)
        Pb = Pb * gamma
        qb = qb * gamma
        c = c * gamma
        return Pb, qb, Ab, D, E, c

    Pb, qb, Ab, D, E, c = _fori_scan(
        iters, body, (Pb, qb, Ab, D, E, c))
    return Pb, qb, Ab, E * l, E * u, D, E, c


def _polish(P, q, A, l, u, x, y, delta: float = 1e-7):
    """OSQP-style solution polish (OSQP §5.2): detect the active set from
    the dual signs, solve the equality-KKT system restricted to it (masked
    dense KKT with -delta regularization on inactive rows), and keep the
    polished point only if it improves the KKT residuals."""
    m = A.shape[0]
    n = q.shape[0]
    dtype = q.dtype
    act_l = y < -1e-12
    act_u = y > 1e-12
    act = act_l | act_u
    b = jnp.where(act_l, l, u)
    mask = act.astype(dtype)
    # [P  (MA)'] [x]   [-q ]
    # [MA  -(1-m) I] [nu] = [m b]   (inactive rows force nu_i = 0)
    MA = A * mask[:, None]
    K = jnp.block([
        [P + delta * jnp.eye(n, dtype=dtype), MA.T],
        [MA, -jnp.diag((1.0 - mask) + delta)],
    ])
    # unperturbed KKT operator for the refinement residual
    K0 = jnp.block([
        [P, MA.T],
        [MA, -jnp.diag(1.0 - mask)],
    ])
    rhs = jnp.concatenate([-q, mask * b])
    # factor K once; the refinement solves reuse the LU (K is symmetric
    # indefinite, so LU rather than Cholesky)
    K_lu = lu_factor(K)
    sol = lu_solve(K_lu, rhs)
    # iterative refinement against the unregularized system (OSQP's
    # polish_refine_iter) washes out the delta perturbation
    for _ in range(3):
        sol = sol + lu_solve(K_lu, rhs - _mm(K0, sol))
    x_p, nu = sol[:n], sol[n:]
    y_p = jnp.where(act, nu, 0.0)

    def score(x_, y_):
        s, p, comp = kkt_residuals(P, q, A, l, u, x_, y_)
        return jnp.maximum(jnp.maximum(s, p), comp)

    better = score(x_p, y_p) < score(x, y)
    better = better & jnp.all(jnp.isfinite(x_p)) & jnp.all(jnp.isfinite(y_p))
    return (jnp.where(better, x_p, x), jnp.where(better, y_p, y))


def solve_qp(P, q, A, l, u, *, rho: float = 0.1, sigma: float = 1e-6,
             alpha: float = 1.6, eps_abs: float = 1e-6,
             eps_rel: float = 1e-6, max_iter: int = 2000,
             x0=None, y0=None, ruiz: bool = True,
             adaptive_rho: bool = True, adaptive_rho_interval: int = 25,
             polish: bool = True,
             fixed_iters: int | None = None) -> QPSolution:
    """ADMM iteration (OSQP §3, the algorithm OSQP implements):

      x~ = M^-1 (sigma x - q + A'(rho z - y))
      z~ = A x~
      x+ = alpha x~ + (1-alpha) x
      z+ = clip(alpha z~ + (1-alpha) z + y/rho, l, u)
      y+ = y + rho (alpha z~ + (1-alpha) z - z+)

    With OSQP's production machinery: modified Ruiz equilibration,
    equality-row rho boost, periodic adaptive rho (with refactorization),
    and active-set polish.  Constraint rows with l == u (equalities) are
    handled by the same projection.  Warm starting via x0/y0 (the
    reference enables OSQP warm start, mpc.cpp:518).  Termination uses
    OSQP's unscaled residual criteria.
    """
    n = q.shape[0]
    dtype = q.dtype

    P0, q0, A0, l0, u0 = P, q, A, l, u
    if ruiz:
        P, q, A, l, u, D, E, c = ruiz_equilibrate(P, q, A, l, u)
    else:
        D = jnp.ones((n,), dtype)
        E = jnp.ones((A.shape[0],), dtype)
        c = jnp.asarray(1.0, dtype)
    cinv = 1.0 / c
    Dinv = 1.0 / D
    Einv = 1.0 / E

    # OSQP rho vector: equality rows (l == u) get 1e3 * rho — essential for
    # convergence on the MPC QP's mixed equality/box constraint set.
    # Classified on the UNSCALED bounds: exact equalities stay exact under
    # row scaling, but a near-equality inequality could flip class purely
    # from the equilibration magnitudes if tested on E*l/E*u.
    is_eq = jnp.abs(u0 - l0) < 1e-12
    eye_n = jnp.eye(n, dtype=dtype)

    def factor(rho_s):
        rho_vec = jnp.where(is_eq, 1e3 * rho_s, rho_s).astype(dtype)
        M = P + sigma * eye_n + _mm(A.T * rho_vec, A)
        return rho_vec, _spd_inverse(M)

    rho_vec, minv = factor(jnp.asarray(rho, dtype))

    # warm starts arrive unscaled (previous tick's solution)
    x = jnp.zeros((n,), dtype) if x0 is None else Dinv * x0
    y = jnp.zeros((A.shape[0],), dtype) if y0 is None else c * Einv * y0
    z = jnp.clip(_mm(A, x), l, u)

    class S(NamedTuple):
        x: jax.Array
        z: jax.Array
        y: jax.Array
        rho_s: jax.Array
        rho_vec: jax.Array
        minv: jax.Array
        it: jax.Array
        r_prim: jax.Array
        r_dual: jax.Array
        done: jax.Array

    def cond(s: S):
        return ~s.done

    def body(s: S):
        rhs = sigma * s.x - q + _mm(A.T, s.rho_vec * s.z - s.y)
        x_t = _mm(s.minv, rhs)
        z_t = _mm(A, x_t)
        x_new = alpha * x_t + (1 - alpha) * s.x
        z_relax = alpha * z_t + (1 - alpha) * s.z
        z_new = jnp.clip(z_relax + s.y / s.rho_vec, l, u)
        y_new = s.y + s.rho_vec * (z_relax - z_new)

        # unscaled residuals (OSQP default termination is on unscaled data)
        Ax_u = Einv * _mm(A, x_new)
        z_u = Einv * z_new
        r_prim = jnp.max(jnp.abs(Ax_u - z_u))
        Px_u = cinv * Dinv * _mm(P, x_new)
        Aty_u = cinv * Dinv * _mm(A.T, y_new)
        q_u = cinv * Dinv * q
        r_dual = jnp.max(jnp.abs(Px_u + q_u + Aty_u))
        prim_norm = jnp.maximum(jnp.max(jnp.abs(Ax_u)),
                                jnp.max(jnp.abs(z_u)))
        dual_norm = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px_u)), jnp.max(jnp.abs(Aty_u))),
            jnp.max(jnp.abs(q_u)))
        eps_prim = eps_abs + eps_rel * prim_norm
        eps_dual = eps_abs + eps_rel * dual_norm
        converged = (r_prim < eps_prim) & (r_dual < eps_dual)
        it = s.it + 1

        # periodic adaptive rho (OSQP §5.2 eq. 29), refactorize on change
        if adaptive_rho:
            ratio = jnp.sqrt((r_prim / jnp.maximum(prim_norm, 1e-12))
                             / jnp.maximum(
                                 r_dual / jnp.maximum(dual_norm, 1e-12),
                                 1e-12))
            rho_prop = jnp.clip(s.rho_s * ratio, 1e-6, 1e6)
            adapt = (jnp.mod(it, adaptive_rho_interval) == 0) \
                & ((rho_prop > 5.0 * s.rho_s) | (rho_prop < s.rho_s / 5.0)) \
                & ~converged

            def refac(_):
                rv, mi = factor(rho_prop)
                return rho_prop, rv, mi

            def keep(_):
                return s.rho_s, s.rho_vec, s.minv

            rho_s, rho_vec_n, minv_n = jax.lax.cond(adapt, refac, keep,
                                                    None)
        else:
            rho_s, rho_vec_n, minv_n = s.rho_s, s.rho_vec, s.minv

        return S(x=x_new, z=z_new, y=y_new,
                 rho_s=rho_s, rho_vec=rho_vec_n, minv=minv_n, it=it,
                 r_prim=r_prim, r_dual=r_dual,
                 done=converged | (it >= max_iter))

    init = S(x=x, z=z, y=y, rho_s=jnp.asarray(rho, dtype),
             rho_vec=rho_vec, minv=minv,
             it=jnp.asarray(0, jnp.int32),
             r_prim=jnp.asarray(jnp.inf, dtype),
             r_dual=jnp.asarray(jnp.inf, dtype),
             done=jnp.asarray(False))
    if fixed_iters is not None:
        # Masked fixed-trip scan: the SAME update sequence as the
        # while_loop (lanes freeze once done), just a bounded trip count.
        # Callers that run the QP inside an outer lax.scan (the MPC
        # tracking rollout) MUST use this mode: on this TPU platform a
        # while_loop nested under a vmapped scan miscompiles and crashes
        # the TPU worker (round-4 isolation — swapping only the loop
        # construct removes the fault).
        def step(c, _):
            nc = body(c)
            c2 = jax.tree.map(lambda a, b: jnp.where(c.done, b, a), nc, c)
            return c2, None
        out = jax.lax.scan(step, init, None, length=fixed_iters)[0]
    else:
        out = jax.lax.while_loop(cond, body, init)

    # unscale, then polish on the original data
    x_u = D * out.x
    y_u = cinv * E * out.y
    if polish:
        x_u, y_u = _polish(P0, q0, A0, l0, u0, x_u, y_u)
    return QPSolution(x=x_u, y=y_u, iters=out.it,
                      r_prim=out.r_prim, r_dual=out.r_dual,
                      converged=out.it < max_iter)


def kkt_residuals(P, q, A, l, u, x, y):
    """KKT residuals of a candidate solution: stationarity, primal
    feasibility, complementary slackness (the cross-solver oracle)."""
    z = _mm(A, x)
    stat = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    prim = jnp.max(jnp.maximum(z - u, 0.0) + jnp.maximum(l - z, 0.0))
    # complementarity: y+ pushes at u, y- pushes at l
    comp = jnp.max(jnp.abs(jnp.where(y > 0, (z - u) * y, (z - l) * y)))
    return stat, prim, comp
