"""TPU-friendly small dense linear algebra.

XLA's LU/Cholesky on TPU are row-sequential and dominate the runtime of
every small (16-44 dim) factorization in the control stack (measured:
one batched 22x22 `jnp.linalg.solve` costs ~1 ms at B=128 — more than the
entire surrounding arithmetic).  These routines replace factorizations with
pure matmul iterations that the MXU executes at full rate:

  * `ns_inverse`   — Newton-Schulz iteration X <- X(2I - AX), quadratic
                     convergence from the classic ||A||_1 ||A||_inf init.
  * `spd_solve`    — NS inverse + one iterative-refinement step (recovers
                     f32 accuracy even if the iteration is truncated).

For well-conditioned SPD systems (everything in this framework is
regularized to kappa <~ 1e6) 12-16 iterations reach f32 roundoff.
"""
from __future__ import annotations

import jax.numpy as jnp


def ns_inverse(A, iters: int = 16, spd: bool = True):
    """Approximate inverse of a (batched) square matrix via Newton-Schulz.

    For SPD inputs a symmetric Jacobi equilibration D^-1/2 A D^-1/2 is
    applied first — the control stack's matrices (Huu, KKT Schur blocks)
    owe most of their condition number to diagonal scale disparity, and the
    scaled iterate then converges in ~16 iterations.  Init
    X0 = A~^T/(||A~||_1 ||A~||_inf) guarantees contraction; each iteration
    squares the residual.
    """
    n = A.shape[-1]
    if spd:
        d = jnp.clip(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-12, None)
        s = 1.0 / jnp.sqrt(d)                      # (..., n)
        As = A * s[..., :, None] * s[..., None, :]
    else:
        s = None
        As = A
    a1 = jnp.sum(jnp.abs(As), axis=-2, keepdims=True).max(axis=-1, keepdims=True)
    ainf = jnp.sum(jnp.abs(As), axis=-1, keepdims=True).max(axis=-2, keepdims=True)
    X = jnp.swapaxes(As, -1, -2) / (a1 * ainf + 1e-30)
    eye2 = 2.0 * jnp.eye(n, dtype=A.dtype)
    for _ in range(iters):
        X = X @ (eye2 - As @ X)
    if spd:
        X = X * s[..., :, None] * s[..., None, :]
    return X


def spd_solve(A, b, iters: int = 20, refine: int = 2):
    """Solve A x = b for SPD (batched) A via NS inverse + iterative
    refinement.  b may be a vector (..., n) or matrix (..., n, k)."""
    X = ns_inverse(A, iters)
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    x = X @ b
    for _ in range(refine):
        x = x + X @ (b - A @ x)
    return x[..., 0] if vec else x


def spd_inverse(A, iters: int = 14, refine: int = 1):
    """Refined inverse (for projector construction)."""
    X = ns_inverse(A, iters)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    for _ in range(refine):
        X = X + X @ (eye - A @ X)
    return X
