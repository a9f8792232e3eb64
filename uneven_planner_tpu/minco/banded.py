"""Block-tridiagonal linear solver for MINCO systems.

The reference solves its 6N x 6N banded (p=q=6) system with an in-place
banded LU without pivoting (reference:
src/uneven_planner/back_end/include/utils/banded_system.hpp:14-146).  On TPU
the natural formulation is block-tridiagonal with 6x6 blocks — the MINCO
matrix couples only adjacent pieces — solved by a block Thomas recursion
under `lax.scan`.  The scan is differentiable, so the reference's hand-written
adjoint solve (banded_system.hpp:120-145, used by calGradCTtoQT) is subsumed
by JAX autodiff through this function.  Batching over scenarios is `vmap`;
each scan step is then a batch of small matrix solves, which is where the
parallelism lives (SURVEY.md "banded solves don't shard profitably at these
sizes" — the batch dim carries the work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# All small matmuls run at HIGHEST precision: TPU f32 dots default to
# bf16 MXU passes, which corrupts the MINCO solve and its gradients.
_P = jax.lax.Precision.HIGHEST


def gauss_solve(M: jax.Array, B: jax.Array) -> jax.Array:
    """Dense k x k solve by Gaussian elimination WITHOUT pivoting, unrolled
    over k (static, small).  Element-wise ops only -> full f32 on the TPU
    VPU, any dtype, differentiable, vmappable.  The no-pivot assumption is
    the reference's (banded_system.hpp:64-66); MINCO diagonal blocks are
    safely conditioned.
    """
    k = M.shape[-1]
    A = jnp.concatenate([M, B], axis=-1)  # [k, k+m]
    for i in range(k):
        A = A.at[i].set(A[i] / A[i, i])
        factors = A[:, i].at[i].set(0.0)
        A = A - factors[:, None] * A[i][None, :]
    return A[:, k:]


def block_tridiag_solve(L: jax.Array, D: jax.Array, U: jax.Array,
                        b: jax.Array) -> jax.Array:
    """Solve a block-tridiagonal system.

    Args:
      L: [N, k, k] sub-diagonal blocks; L[0] is ignored.
      D: [N, k, k] diagonal blocks.
      U: [N, k, k] super-diagonal blocks; U[N-1] is ignored.
      b: [N, k, m] right-hand sides.

    Returns:
      x: [N, k, m] with A x = b.

    No pivoting beyond the dense LU inside each k x k solve — same
    well-conditioned-by-construction assumption as the reference
    (banded_system.hpp:64-66), which holds for MINCO matrices.
    """
    def fwd(carry, inp):
        W_prev, y_prev = carry
        Li, Di, Ui, bi = inp
        M = Di - jnp.matmul(Li, W_prev, precision=_P)
        rhs = jnp.concatenate(
            [Ui, bi - jnp.matmul(Li, y_prev, precision=_P)], axis=-1)
        sol = gauss_solve(M, rhs)
        k = Di.shape[-1]
        Wi, yi = sol[..., :k], sol[..., k:]
        return (Wi, yi), (Wi, yi)

    k = D.shape[-1]
    m = b.shape[-1]
    W0 = jnp.zeros((k, k), dtype=D.dtype)
    y0 = jnp.zeros((k, m), dtype=D.dtype)
    _, (W, y) = jax.lax.scan(fwd, (W0, y0), (L, D, U, b))

    def bwd(x_next, inp):
        Wi, yi = inp
        xi = yi - jnp.matmul(Wi, x_next, precision=_P)
        return xi, xi

    _, x_rev = jax.lax.scan(bwd, jnp.zeros((k, m), dtype=D.dtype),
                            (W[::-1], y[::-1]))
    return x_rev[::-1]


def block_tridiag_matvec(L: jax.Array, D: jax.Array, U: jax.Array,
                         x: jax.Array) -> jax.Array:
    """A @ x for the same block layout (test utility)."""
    y = D @ x
    y = y.at[1:].add(L[1:] @ x[:-1])
    y = y.at[:-1].add(U[:-1] @ x[1:])
    return y
