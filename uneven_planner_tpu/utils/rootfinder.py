"""Polynomial real-root isolation for trajectory rate diagnostics.

The reference ships a 1.1k-line RootFinder (reference:
src/uneven_planner/back_end/include/utils/root_finder.hpp: closed-form
cubic/quartic, companion-matrix eigenvalues, Sturm isolation) used only for
the max-velocity/acceleration diagnostics (se2traj.hpp:152-251).  The
TPU-native equivalent is a fixed-iteration Durand–Kerner simultaneous root
iteration: branchless, batched, works on TPU (which has no nonsymmetric
eigensolver), and exact enough for diagnostics (residual-polished roots).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def poly_sqr(p: jax.Array) -> jax.Array:
    """Coefficients of p(x)^2 (RootFinder::polySqr, root_finder.hpp:850);
    p given highest-degree first."""
    return jnp.convolve(p, p)


def poly_val(p: jax.Array, x: jax.Array) -> jax.Array:
    """Horner evaluation, highest-degree first (polyVal,
    root_finder.hpp:885)."""
    def step(acc, c):
        return acc * x + c, None
    acc, _ = jax.lax.scan(step, jnp.zeros_like(x), p)
    return acc


def poly_der(p: jax.Array) -> jax.Array:
    n = p.shape[0] - 1
    k = jnp.arange(n, 0, -1, dtype=p.dtype)
    return p[:-1] * k


def roots(p: jax.Array, iters: int = 64) -> jax.Array:
    """All complex roots by Durand–Kerner; p highest-degree first,
    degree = len(p)-1 (leading coefficient regularized)."""
    n = p.shape[0] - 1
    dtype = jnp.complex64 if p.dtype == jnp.float32 else jnp.complex128
    lead = jnp.where(jnp.abs(p[0]) < 1e-12, 1e-12, p[0])
    mon = (p / lead).astype(dtype)

    k = jnp.arange(n)
    z0 = (0.4 + 0.9j) ** (k + 1)
    z0 = z0.astype(dtype)

    def body(_, z):
        pz = poly_val(mon, z)
        diff = z[:, None] - z[None, :]
        diff = diff + jnp.eye(n, dtype=dtype)  # avoid self-division
        denom = jnp.prod(diff, axis=1)
        return z - pz / denom

    return jax.lax.fori_loop(0, iters, body, z0)


def real_roots_in_01(p: jax.Array, tol: float = 1e-6):
    """Real roots clipped to [0, 1] with a validity mask."""
    z = roots(p)
    real = jnp.real(z)
    ok = (jnp.abs(jnp.imag(z)) < tol * (1.0 + jnp.abs(real))) \
        & (real > -tol) & (real < 1.0 + tol)
    return jnp.clip(real, 0.0, 1.0), ok


def max_dot_value_norm(c_piece: jax.Array, T: jax.Array) -> jax.Array:
    """Exact max ||velocity|| over one quintic piece via the roots of
    d/dt ||v||^2 (Piece::getMaxDotValueNorm, se2traj.hpp:152-201).

    c_piece: [6, Dim] ascending coefficients; T: duration.
    Works on the normalized domain t in [0, 1] like the reference.
    """
    dim = c_piece.shape[1]
    # normalized velocity coefficients: v(u) with u = t/T, highest first
    k = jnp.arange(5, 0, -1, dtype=c_piece.dtype)      # 5,4,3,2,1
    # ascending c1..c5 -> v coeffs ascending: (j+1) c_{j+1} T^{j+1}... use
    # normalizedDotCoeffMat semantics (se2traj.hpp:76-88):
    # col i (desc) = n * c_i * T^n
    pow_T = T ** jnp.arange(1, 6, dtype=c_piece.dtype)  # T^1..T^5
    v_desc = (c_piece[1:, :] * jnp.arange(1, 6, dtype=c_piece.dtype)[:, None]
              * pow_T[:, None])[::-1]                   # [5, Dim] desc in u
    sq = jnp.zeros((9,), c_piece.dtype)
    for d in range(dim):
        sq = sq + poly_sqr(v_desc[:, d])
    der = poly_der(sq)                                  # degree 7, desc
    cand, ok = real_roots_in_01(der)
    cand = jnp.concatenate([cand, jnp.asarray([0.0, 1.0], c_piece.dtype)])
    ok = jnp.concatenate([ok, jnp.asarray([True, True])])
    vals = jax.vmap(lambda u: poly_val(sq, u))(cand)
    vals = jnp.where(ok, vals, -jnp.inf)
    return jnp.sqrt(jnp.maximum(jnp.max(vals), 0.0)) / T


def max_vel_rate_exact(c_xy: jax.Array, ts: jax.Array) -> jax.Array:
    """Max ||v|| over the whole trajectory via per-piece root isolation
    (PolyTrajectory::getMaxDotValueNorm, se2traj.hpp:381-392)."""
    per = jax.vmap(max_dot_value_norm)(c_xy, ts)
    return jnp.max(per)
