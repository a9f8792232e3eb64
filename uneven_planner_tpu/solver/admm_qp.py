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
from jax.scipy.linalg import cho_factor, cho_solve


class QPSolution(NamedTuple):
    x: jax.Array        # [n] primal
    y: jax.Array        # [m] dual
    iters: jax.Array
    r_prim: jax.Array
    r_dual: jax.Array
    converged: jax.Array


def solve_qp(P, q, A, l, u, *, rho: float = 0.1, sigma: float = 1e-6,
             alpha: float = 1.6, eps_abs: float = 1e-6,
             eps_rel: float = 1e-6, max_iter: int = 2000,
             x0=None, y0=None) -> QPSolution:
    """ADMM iteration (OSQP §3, the algorithm OSQP implements):

      x~ = M^-1 (sigma x - q + A'(rho z - y))
      z~ = A x~
      x+ = alpha x~ + (1-alpha) x
      z+ = clip(alpha z~ + (1-alpha) z + y/rho, l, u)
      y+ = y + rho (alpha z~ + (1-alpha) z - z+)

    Constraint rows with l == u (equalities) are handled by the same
    projection.  Warm starting via x0/y0 (the reference enables OSQP warm
    start, mpc.cpp:518).
    """
    n = q.shape[0]
    dtype = q.dtype
    # OSQP rho vector: equality rows (l == u) get 1e3 * rho — essential for
    # convergence on the MPC QP's mixed equality/box constraint set.
    is_eq = jnp.abs(u - l) < 1e-12
    rho_vec = jnp.where(is_eq, 1e3 * rho, rho).astype(dtype)
    M = P + sigma * jnp.eye(n, dtype=dtype) + _mm(A.T * rho_vec, A)
    chol = cho_factor(M)

    x = jnp.zeros((n,), dtype) if x0 is None else x0
    y = jnp.zeros((A.shape[0],), dtype) if y0 is None else y0
    z = jnp.clip(_mm(A, x), l, u)

    class S(NamedTuple):
        x: jax.Array
        z: jax.Array
        y: jax.Array
        it: jax.Array
        r_prim: jax.Array
        r_dual: jax.Array
        done: jax.Array

    def cond(s: S):
        return ~s.done

    def body(s: S):
        rhs = sigma * s.x - q + _mm(A.T, rho_vec * s.z - s.y)
        x_t = cho_solve(chol, rhs)
        z_t = _mm(A, x_t)
        x_new = alpha * x_t + (1 - alpha) * s.x
        z_relax = alpha * z_t + (1 - alpha) * s.z
        z_new = jnp.clip(z_relax + s.y / rho_vec, l, u)
        y_new = s.y + rho_vec * (z_relax - z_new)

        Ax = _mm(A, x_new)
        r_prim = jnp.max(jnp.abs(Ax - z_new))
        Px = _mm(P, x_new)
        Aty = _mm(A.T, y_new)
        r_dual = jnp.max(jnp.abs(Px + q + Aty))
        eps_prim = eps_abs + eps_rel * jnp.maximum(jnp.max(jnp.abs(Ax)),
                                                   jnp.max(jnp.abs(z_new)))
        eps_dual = eps_abs + eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
            jnp.max(jnp.abs(q)))
        converged = (r_prim < eps_prim) & (r_dual < eps_dual)
        it = s.it + 1
        return S(x=x_new, z=z_new, y=y_new, it=it,
                 r_prim=r_prim, r_dual=r_dual,
                 done=converged | (it >= max_iter))

    init = S(x=x, z=z, y=y, it=jnp.asarray(0, jnp.int32),
             r_prim=jnp.asarray(jnp.inf, dtype),
             r_dual=jnp.asarray(jnp.inf, dtype),
             done=jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, init)
    return QPSolution(x=out.x, y=out.y, iters=out.it,
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
