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
        M = Di - Li @ W_prev
        rhs = jnp.concatenate([Ui, bi - Li @ y_prev], axis=-1)
        sol = jnp.linalg.solve(M, rhs)
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
        xi = yi - Wi @ x_next
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
