"""MINCO (s=3, minimum-jerk) SE(2) trajectory representation.

TPU-native re-design of the reference MinJerkOpt / MINCO_SE2 (reference:
src/uneven_planner/back_end/include/utils/se2traj.hpp:564-870).  A trajectory
with N pieces is the unique quintic piecewise polynomial through N-1 inner
waypoints with fixed boundary PVA and C^4 continuity; coefficients come from
one block-tridiagonal solve.  Everything here is a pure differentiable
function of (inner points, piece times, boundary states): the reference's
hand-written gradient propagation (calJerkGradCT, se2traj.hpp:719-747, and
the adjoint calGradCTtoQT, se2traj.hpp:751-816) is replaced by JAX autodiff
through `generate` + `jerk_cost`, which computes the identical chain.

Coefficient layout: c[i, k, d] = coefficient of t^k (ascending) of piece i,
dimension d.  (The reference stores the same ascending layout in its 6N x Dim
matrix, se2traj.hpp:595-680.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uneven_planner_tpu.minco.banded import block_tridiag_solve


def _beta(t, dtype):
    """Basis rows beta0..beta3 at time t: value/vel/acc/jerk weights of
    [1, t, t^2, t^3, t^4, t^5]."""
    t = jnp.asarray(t, dtype=dtype)
    o = jnp.zeros_like(t)
    l = jnp.ones_like(t)
    b0 = jnp.stack([l, t, t**2, t**3, t**4, t**5])
    b1 = jnp.stack([o, l, 2*t, 3*t**2, 4*t**3, 5*t**4])
    b2 = jnp.stack([o, o, 2*l, 6*t, 12*t**2, 20*t**3])
    b3 = jnp.stack([o, o, o, 6*l, 24*t, 60*t**2])
    return b0, b1, b2, b3


def generate(inner: jax.Array, ts: jax.Array, head: jax.Array,
             tail: jax.Array) -> jax.Array:
    """Solve for coefficients (reference MinJerkOpt::generate,
    se2traj.hpp:595-680).

    Args:
      inner: [N-1, Dim] inner waypoints (q).
      ts:    [N] piece durations (T).
      head:  [3, Dim] boundary (pos; vel; acc) at start.
      tail:  [3, Dim] boundary (pos; vel; acc) at end.

    Returns:
      c: [N, 6, Dim] ascending-power coefficients.
    """
    N = ts.shape[0]
    dim = head.shape[-1]
    dtype = ts.dtype
    assert N >= 2, "MINCO needs at least 2 pieces"

    b0, b1, b2, b3 = jax.vmap(lambda t: jnp.stack(_beta(t, dtype)))(ts).transpose(1, 0, 2)
    # b0..b3: [N, 6]

    # Diagonal blocks.
    D = jnp.zeros((N, 6, 6), dtype=dtype)
    # Block 0 rows 0-2: head PVA rows (se2traj.hpp:612-614).
    D = D.at[0, 0, 0].set(1.0)
    D = D.at[0, 1, 1].set(1.0)
    D = D.at[0, 2, 2].set(2.0)
    # Blocks 1..N-1 rows 0-2: continuity -I terms (se2traj.hpp:640,646,651).
    D = D.at[1:, 0, 0].set(-1.0)
    D = D.at[1:, 1, 1].set(-1.0)
    D = D.at[1:, 2, 2].set(-2.0)
    # Blocks 0..N-2 rows 3-5: jerk/snap continuity + waypoint rows
    # (se2traj.hpp:621-633).
    D = D.at[:-1, 3, 3].set(6.0)
    D = D.at[:-1, 3, 4].set(24.0 * ts[:-1])
    D = D.at[:-1, 3, 5].set(60.0 * ts[:-1] ** 2)
    D = D.at[:-1, 4, 4].set(24.0)
    D = D.at[:-1, 4, 5].set(120.0 * ts[:-1])
    D = D.at[:-1, 5, :].set(b0[:-1])
    # Block N-1 rows 3-5: tail PVA rows (se2traj.hpp:656-670).
    D = D.at[-1, 3, :].set(b0[-1])
    D = D.at[-1, 4, :].set(b1[-1])
    D = D.at[-1, 5, :].set(b2[-1])

    # Super-diagonal blocks: -6 / -24 jerk/snap continuity into next piece
    # (se2traj.hpp:624,627).
    U = jnp.zeros((N, 6, 6), dtype=dtype)
    U = U.at[:-1, 3, 3].set(-6.0)
    U = U.at[:-1, 4, 4].set(-24.0)

    # Sub-diagonal blocks: position/vel/acc continuity rows evaluated at the
    # end of the previous piece (se2traj.hpp:634-651).
    Lb = jnp.zeros((N, 6, 6), dtype=dtype)
    Lb = Lb.at[1:, 0, :].set(b0[:-1])
    Lb = Lb.at[1:, 1, :].set(b1[:-1])
    Lb = Lb.at[1:, 2, :].set(b2[:-1])

    rhs = jnp.zeros((N, 6, dim), dtype=dtype)
    rhs = rhs.at[0, 0:3, :].set(head)
    rhs = rhs.at[:-1, 5, :].set(inner)
    rhs = rhs.at[-1, 3:6, :].set(tail)

    return block_tridiag_solve(Lb, D, U, rhs)


def jerk_cost(c: jax.Array, ts: jax.Array) -> jax.Array:
    """Closed-form integral of squared jerk (se2traj.hpp:697-710)."""
    c3, c4, c5 = c[:, 3, :], c[:, 4, :], c[:, 5, :]
    T1 = ts
    T2 = T1 * T1
    T3 = T2 * T1
    T4 = T2 * T2
    T5 = T4 * T1
    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    e = (36.0 * dot(c3, c3) * T1 + 144.0 * dot(c4, c3) * T2
         + 192.0 * dot(c4, c4) * T3 + 240.0 * dot(c5, c3) * T3
         + 720.0 * dot(c5, c4) * T4 + 720.0 * dot(c5, c5) * T5)
    return jnp.sum(e)


def eval_piece(c_i: jax.Array, s: jax.Array):
    """(value, vel, acc, jerk) of one piece's [6, Dim] coefficients at local
    time s (Piece::getValue/getDotValue/getDDotValue, se2traj.hpp:106-150)."""
    b0, b1, b2, b3 = _beta(s, c_i.dtype)
    P = jax.lax.Precision.HIGHEST
    mm = lambda b: jnp.matmul(b, c_i, precision=P)
    return mm(b0), mm(b1), mm(b2), mm(b3)


def locate_piece(ts_cumsum: jax.Array, t: jax.Array):
    """Piece index and local time for global time t with uniform or general
    piece times (PolyTrajectory::locatePieceIdx, se2traj.hpp:343-361):
    clamps t into [0, total]."""
    N = ts_cumsum.shape[0]
    idx = jnp.clip(jnp.searchsorted(ts_cumsum, t, side="right"), 0, N - 1)
    start = jnp.where(idx == 0, jnp.zeros_like(t), ts_cumsum[idx - 1])
    return idx, t - start


def eval_traj(c: jax.Array, ts: jax.Array, t: jax.Array):
    """(pos, vel, acc, jerk) at global time t for an [N,6,Dim] trajectory."""
    idx, s = locate_piece(jnp.cumsum(ts), t)
    return eval_piece(c[idx], s)


# ----------------------------------------------------------------------------
# SE(2) pairing: independent xy / yaw piece counts, equal total time
# (MINCO_SE2, se2traj.hpp:819-870)
# ----------------------------------------------------------------------------

def generate_se2(inner_xy, ts_xy, head_xy, tail_xy,
                 inner_yaw, ts_yaw, head_yaw, tail_yaw):
    c_xy = generate(inner_xy, ts_xy, head_xy, tail_xy)
    c_yaw = generate(inner_yaw, ts_yaw, head_yaw, tail_yaw)
    return c_xy, c_yaw


def jerk_cost_se2(c_xy, ts_xy, c_yaw, ts_yaw):
    return jerk_cost(c_xy, ts_xy) + jerk_cost(c_yaw, ts_yaw)
