"""Uniform-piece-time MINCO as constant-matrix matmuls (the TPU fast path).

The ALM solver always uses *uniform* piece times T_piece = T/N (single
log-time decision variable, reference back_end/include/back_end/
alm_traj_opt.h:232-261).  In normalized local time u = t/T_piece the C^4
continuity and waypoint equations of the MINCO system (reference
se2traj.hpp:595-680) are independent of T: every T_piece^k factor cancels
between the two sides of each junction row.  Only the six boundary rows see
T, and only through the substitution v -> T_piece*v, a -> T_piece^2*a.

Hence for fixed piece count N the whole 6N x 6N solve collapses to one
matmul with a *precomputed constant* inverse:

    c_norm = G @ [q; head_p; T*head_v; T^2*head_a; tail_p; T*tail_v; T^2*tail_a]

where c_norm[i, k] is the coefficient of u^k of piece i (so the physical
coefficient is c[i, k] = c_norm[i, k] / T_piece^k).  G = A^{-1} restricted to
the nonzero right-hand-side rows is computed once per N in float64 numpy at
trace time and baked into the program as an MXU constant.

Sampling at the solver's fixed fractions u_j = j/K is likewise constant:
beta bases, and even the yaw-piece index for each xy sample (reference
alm_traj_opt.cpp:747-764 locates the yaw piece by global time; with uniform
times the index floor((i + j/K) * Nyaw / Nxy) is a compile-time integer).

This replaces the sequential block-Thomas scan of `minco.generate` (kept as
the general-times reference implementation and parity oracle) with a single
batched matmul — the difference between a ~30-step serialized scan and one
MXU op per L-BFGS evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_P = jax.lax.Precision.HIGHEST


def _beta_np(u: np.ndarray):
    """numpy beta rows (value/vel/acc/jerk) at normalized time u."""
    u = np.asarray(u, np.float64)
    o, l = np.zeros_like(u), np.ones_like(u)
    b0 = np.stack([l, u, u**2, u**3, u**4, u**5], axis=-1)
    b1 = np.stack([o, l, 2*u, 3*u**2, 4*u**3, 5*u**4], axis=-1)
    b2 = np.stack([o, o, 2*l, 6*u, 12*u**2, 20*u**3], axis=-1)
    b3 = np.stack([o, o, o, 6*l, 24*u, 60*u**2], axis=-1)
    return b0, b1, b2, b3


@functools.lru_cache(maxsize=None)
def _solve_matrix(N: int) -> np.ndarray:
    """G [6N, N+5]: normalized-coefficient solve operator for N pieces.

    Column order: N-1 waypoints, then head (p, v~, a~), then tail (p, v~, a~)
    with v~ = T_piece * v, a~ = T_piece^2 * a.
    """
    assert N >= 2
    n = 6 * N
    A = np.zeros((n, n), np.float64)
    rhs_rows = []  # (row, rhs column) pairs

    b0_1, b1_1, b2_1, b3_1 = _beta_np(np.float64(1.0))
    b4_1 = np.array([0.0, 0.0, 0.0, 0.0, 24.0, 120.0])  # snap basis at u=1
    dfact = np.array([1.0, 1.0, 2.0, 6.0, 24.0])        # d! for d = 0..4

    row = 0
    # head rows: c[0,0]=hp, c[0,1]=hv~, 2 c[0,2]=ha~
    A[row, 0] = 1.0
    rhs_rows.append((row, N - 1 + 0))
    row += 1
    A[row, 1] = 1.0
    rhs_rows.append((row, N - 1 + 1))
    row += 1
    A[row, 2] = 2.0
    rhs_rows.append((row, N - 1 + 2))
    row += 1

    bders = [b0_1, b1_1, b2_1, b3_1, b4_1]
    for i in range(N - 1):
        # waypoint: sum_k c[i,k] = q_i
        A[row, 6*i:6*i+6] = b0_1
        rhs_rows.append((row, i))
        row += 1
        # continuity of derivative order d = 0..4 at the junction
        for d in range(5):
            A[row, 6*i:6*i+6] = bders[d]
            A[row, 6*(i+1) + d] = -dfact[d]
            row += 1

    # tail rows
    A[row, 6*(N-1):] = b0_1
    rhs_rows.append((row, N - 1 + 3))
    row += 1
    A[row, 6*(N-1):] = b1_1
    rhs_rows.append((row, N - 1 + 4))
    row += 1
    A[row, 6*(N-1):] = b2_1
    rhs_rows.append((row, N - 1 + 5))
    row += 1
    assert row == n

    Ainv = np.linalg.inv(A)
    G = np.zeros((n, N + 5), np.float64)
    for r, c in rhs_rows:
        G[:, c] += Ainv[:, r]
    return G


def generate_norm(inner: jax.Array, Tp: jax.Array, head: jax.Array,
                  tail: jax.Array, N: int) -> jax.Array:
    """Normalized coefficients c_norm [N, 6, Dim] for N uniform pieces of
    duration Tp through `inner` [N-1, Dim] waypoints with boundary PVA rows
    `head`/`tail` [3, Dim].  Matches `minco.generate(inner, full(N, Tp),
    head, tail)` up to the c[i,k] = c_norm[i,k]/Tp^k rescale."""
    dtype = inner.dtype
    G = jnp.asarray(_solve_matrix(N), dtype)
    scale = jnp.stack([jnp.ones_like(Tp), Tp, Tp * Tp])  # [3]
    r = jnp.concatenate([inner, head * scale[:, None],
                         tail * scale[:, None]], axis=0)  # [N+5, Dim]
    c = jnp.matmul(G, r, precision=_P)  # [6N, Dim]
    return c.reshape(N, 6, -1)


def generate_norm_cm(inner: jax.Array, Tp: jax.Array, head: jax.Array,
                     tail: jax.Array, N: int) -> jax.Array:
    """Channel-major `generate_norm`: returns c_norm^T [Dim, 6N] (the layout
    the TPU solver keeps throughout — minor dim large, no channel padding)."""
    dtype = inner.dtype
    Gt = jnp.asarray(_solve_matrix(N).T, dtype)              # [N+5, 6N]
    scale = jnp.stack([jnp.ones_like(Tp), Tp, Tp * Tp])      # [3]
    rT = jnp.concatenate([inner.T, (head * scale[:, None]).T,
                          (tail * scale[:, None]).T], axis=1)  # [Dim, N+5]
    return jnp.matmul(rT, Gt, precision=_P)                  # [Dim, 6N]


def denormalize(c_norm: jax.Array, Tp: jax.Array) -> jax.Array:
    """Physical ascending-power coefficients c[i,k] = c_norm[i,k] / Tp^k."""
    k = jnp.arange(6, dtype=c_norm.dtype)
    return c_norm * (Tp ** -k)[None, :, None]


# Jerk energy quadratic form: q_kl = int_0^1 beta3_k beta3_l du, rows 3..5.
_JERK_Q = np.zeros((6, 6), np.float64)
_JERK_Q[3:, 3:] = np.array([[36.0, 72.0, 120.0],
                            [72.0, 192.0, 360.0],
                            [120.0, 360.0, 720.0]])


def jerk_cost_norm(c_norm: jax.Array, Tp: jax.Array, N: int) -> jax.Array:
    """Integral of squared jerk over all pieces: (1/Tp^5) * sum_i c_i^T Q c_i
    (equals minco.jerk_cost on the denormalized coefficients,
    se2traj.hpp:697-710)."""
    Q = jnp.asarray(_JERK_Q, c_norm.dtype)
    qc = jnp.einsum("kl,ild->ikd", Q, c_norm, precision=_P)
    return jnp.sum(qc * c_norm) / Tp ** 5


@functools.lru_cache(maxsize=None)
def _jerk_q_block(N: int) -> np.ndarray:
    """Block-diagonal [6N, 6N] jerk quadratic form (one _JERK_Q per piece)."""
    Q = np.zeros((6 * N, 6 * N), np.float64)
    for i in range(N):
        Q[6*i:6*i+6, 6*i:6*i+6] = _JERK_Q
    return Q


def jerk_cost_norm_cm(cT: jax.Array, Tp: jax.Array, N: int) -> jax.Array:
    """`jerk_cost_norm` on channel-major coefficients cT [Dim, 6N], as one
    dense quadratic form (MXU) instead of per-piece reshapes."""
    Q = jnp.asarray(_jerk_q_block(N), cT.dtype)
    return jnp.sum(jnp.matmul(cT, Q, precision=_P) * cT) / Tp ** 5


@functools.lru_cache(maxsize=None)
def sample_matrices(N: int, Nyaw: int, K: int):
    """Constant dense sampling operators mapping normalized coefficients to
    the flat [S = N*(K+1)] constraint-sample grid in ONE matmul each.

    Returns numpy float64:
      SXY  [3S, 6N]:   rows 0..S-1 position, S..2S-1 d/du, 2S..3S-1 d2/du2
                       (caller divides by Tp, Tp^2 for physical vel/acc)
      SYAW [2S, 6Nyaw]: rows 0..S-1 yaw value, S..2S-1 d/du_yaw
                       (the static yaw-piece location is folded in)
    """
    K1 = K + 1
    S = N * K1
    B0, B1, B2, yidx, BY0, BY1 = sample_plan(N, Nyaw, K)
    SXY = np.zeros((3 * S, 6 * N), np.float64)
    for i in range(N):
        r = i * K1
        SXY[r:r + K1, 6*i:6*i+6] = B0
        SXY[S + r:S + r + K1, 6*i:6*i+6] = B1
        SXY[2*S + r:2*S + r + K1, 6*i:6*i+6] = B2
    SYAW = np.zeros((2 * S, 6 * Nyaw), np.float64)
    yf = yidx.reshape(-1)
    b0f = BY0.reshape(-1, 6)
    b1f = BY1.reshape(-1, 6)
    for s in range(S):
        SYAW[s, 6*yf[s]:6*yf[s]+6] = b0f[s]
        SYAW[S + s, 6*yf[s]:6*yf[s]+6] = b1f[s]
    return SXY, SYAW


@functools.lru_cache(maxsize=None)
def sample_plan(N: int, Nyaw: int, K: int):
    """Constant sampling operators for the ALM constraint grid.

    Returns numpy arrays:
      B0, B1, B2:   [K+1, 6] xy bases at u_j = j/K
      yidx:         [N, K+1] int32 yaw piece index of each xy sample
      BY0, BY1:     [N, K+1, 6] yaw bases at the per-sample normalized
                    local yaw time
    """
    K1 = K + 1
    u = np.arange(K1, dtype=np.float64) / K
    B0, B1, B2, _ = _beta_np(u)

    i = np.arange(N, dtype=np.float64)[:, None]
    g = (i + u[None, :]) * (Nyaw / N)          # global time / T_piece_yaw
    yidx = np.minimum(np.floor(g + 1e-12).astype(np.int64), Nyaw - 1)
    uy = g - yidx
    BY0, BY1, _, _ = _beta_np(uy)
    return (B0, B1, B2, yidx.astype(np.int32), BY0, BY1)
