"""Custom-call-free linear algebra for TPU: everything is matmuls, selects
and elementwise ops — no LAPACK/cuSolver-style custom lowerings.

Motivation: the experimental axon TPU backend lacks several linalg custom
calls (cholesky / triangular-solve / SVD), and even where stock lowerings
exist, the shapes in this framework are tiny-but-massively-batched
(n_tx<=4 equalizer systems over B*D*N subcarriers; F<=616 readout grams over
B blocks) — exactly the regime where unrolled elimination and Newton-Schulz
iteration on the MXU beat a host-style factorization.

  * solve_hermitian_small: batched complex solve via the real 2n x 2n
    embedding [[Ar, -Ai], [Ai, Ar]] and unrolled Gauss-Jordan with partial
    pivoting (static n <= 8).
  * pd_solve_ns: batched SPD solve by Newton-Schulz matrix-inverse iteration
    (quadratic convergence, pure matmuls) + iterative refinement.
  * svdvals_small: singular values of batched complex (n_r, n_t) matrices via
    cyclic Jacobi eigenvalue sweeps on the real embedding of H^H H.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _real_embed(A: jnp.ndarray) -> jnp.ndarray:
    """Complex (..., n, n) -> real (..., 2n, 2n) [[Ar, -Ai], [Ai, Ar]]."""
    Ar, Ai = jnp.real(A), jnp.imag(A)
    top = jnp.concatenate([Ar, -Ai], axis=-1)
    bot = jnp.concatenate([Ai, Ar], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def gauss_solve_real(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched real solve by unrolled Gauss-Jordan with partial pivoting.

    A (..., n, n), b (..., n, k); n is static and small (<= 16).
    """
    n = A.shape[-1]
    lead = jnp.broadcast_shapes(A.shape[:-2], b.shape[:-2])
    A = jnp.broadcast_to(A, (*lead, *A.shape[-2:]))
    b = jnp.broadcast_to(b, (*lead, *b.shape[-2:]))
    M = jnp.concatenate([A, b], axis=-1)  # (..., n, n+k)
    for col in range(n):
        piv = jnp.argmax(jnp.abs(M[..., col:, col]), axis=-1) + col  # (...,)
        # swap row `col` and row `piv` (batched, via gather + select)
        rows = jnp.arange(n)
        piv_b = piv[..., None]                      # (..., 1)
        is_col = rows == col
        is_piv = rows[None] == piv_b if piv_b.ndim == 1 else rows == piv_b
        # build the permuted row index per batch
        idx = jnp.where(is_col, piv_b, jnp.where(is_piv, col, rows))
        M = jnp.take_along_axis(M, idx[..., None], axis=-2)
        pivot_row = M[..., col, :]                  # (..., n+k)
        pivot_val = pivot_row[..., col:col + 1]
        pivot_row = pivot_row / jnp.where(jnp.abs(pivot_val) > 1e-30,
                                          pivot_val, 1e-30)
        factors = M[..., :, col:col + 1]            # (..., n, 1)
        elim = M - factors * pivot_row[..., None, :]
        keep = (rows == col)[:, None]
        M = jnp.where(keep, pivot_row[..., None, :], elim)
    return M[..., n:]


def chol_solve_small(A: jnp.ndarray, b: jnp.ndarray,
                     eps: float = 1e-30) -> jnp.ndarray:
    """Batched SPD solve by fully-unrolled Cholesky + substitution.

    A (..., n, n) SPD real with static small n, b (..., n, k).

    Every index is static, so this lowers to pure elementwise vector ops over
    the batch — no gathers, no pivot selection. That makes it ~10x faster on
    TPU than pivoted elimination for the massively-batched tiny systems of
    the per-subcarrier equalizer (pivoting is unnecessary for the PD normal
    equations it solves). Diagonal pivots are clamped at `eps` so the
    ZF-with-1e-12-loading path stays finite on (measure-zero) singular
    channels.
    """
    n = A.shape[-1]
    # Cholesky: L[i][j] lower-triangular factors as separate (...,)-arrays
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for p in range(i):
            s = s - L[i][p][..., None] * y[p]
        y[i] = s / L[i][i][..., None]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for p in range(i + 1, n):
            s = s - L[p][i][..., None] * x[p]
        x[i] = s / L[i][i][..., None]
    return jnp.stack(x, axis=-2)


def solve_hermitian_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched complex solve A x = b via the real embedding.

    A (..., n, n) complex, b (..., n, k) complex -> (..., n, k) complex.
    """
    n = A.shape[-1]
    Ae = _real_embed(A)
    be = jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=-2)
    xe = gauss_solve_real(Ae, be)
    return xe[..., :n, :] + 1j * xe[..., n:, :]


def ns_prepare(A: jnp.ndarray, iters: int = 30):
    """Batched SPD Newton-Schulz inverse; returns a `solve(b, refine)` closure.

    A (..., F, F) real SPD. X_{t+1} = X_t (2I - A X_t) converges quadratically
    with X_0 = A^T / (||A||_1 ||A||_inf); refinement steps against A polish
    each solution. Preparing once and solving several right-hand sides (the
    readout's solution + its iterative-refinement residual) shares the
    expensive inverse iteration.

    The system is Jacobi-prescaled (A -> D^-1/2 A D^-1/2 with D = diag(A)):
    the grams this framework produces mix features of very different scales
    (reservoir states O(1) vs scaled inputs O(1e-2)), and diagonal scaling
    removes that part of the conditioning before the iteration starts.
    """
    F = A.shape[-1]
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))           # (..., F)
    As = A * s[..., :, None] * s[..., None, :]
    norm1 = jnp.max(jnp.sum(jnp.abs(As), axis=-2), axis=-1)
    norminf = jnp.max(jnp.sum(jnp.abs(As), axis=-1), axis=-1)
    X = jnp.swapaxes(As, -1, -2) / (norm1 * norminf)[..., None, None]
    I2 = 2.0 * jnp.eye(F, dtype=A.dtype)
    # the iteration is precision-critical: pinned to HIGHEST regardless of
    # the global default (which the data path may lower for throughput) —
    # at bf16 matmul precision Newton-Schulz diverges and the readout NaNs
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def body(_, X):
        return mm(X, I2 - mm(As, X))

    X = jax.lax.fori_loop(0, iters, body, X)

    def solve(b: jnp.ndarray, refine: int = 2) -> jnp.ndarray:
        bs = b * s[..., :, None]
        x = mm(X, bs)
        for _ in range(refine):
            x = x + mm(X, bs - mm(As, x))
        return x * s[..., :, None]

    return solve


def pd_solve_ns(A: jnp.ndarray, b: jnp.ndarray, iters: int = 30,
                refine: int = 2) -> jnp.ndarray:
    """Batched SPD solve via Newton-Schulz inverse iteration (one RHS).

    For several right-hand sides against the same A, use `ns_prepare`."""
    return ns_prepare(A, iters)(b, refine)


def _jacobi_sweeps_sym(G: jnp.ndarray, sweeps: int = 8) -> jnp.ndarray:
    """Eigenvalues of batched real symmetric G (..., n, n) by cyclic Jacobi.

    n is static and small; rotations are applied with dense rotation
    matrices (n x n matmuls) — batched, custom-call-free.
    """
    n = G.shape[-1]
    eye = jnp.eye(n, dtype=G.dtype)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = G[..., p, p]
                aqq = G[..., q, q]
                apq = G[..., p, q]
                # stable Jacobi rotation angle
                tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) > 1e-30,
                                                     apq, 1e-30))
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.abs(apq) > 1e-30, t, 0.0)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                # rotation matrix J: identity with (p,p)=(q,q)=c, (p,q)=s, (q,p)=-s
                J = jnp.broadcast_to(eye, G.shape).copy() if False else eye
                onehot_p = eye[p]
                onehot_q = eye[q]
                c_ = c[..., None, None]
                s_ = s[..., None, None]
                P = onehot_p[:, None] * onehot_p[None, :]
                Q = onehot_q[:, None] * onehot_q[None, :]
                PQ = onehot_p[:, None] * onehot_q[None, :]
                QP = onehot_q[:, None] * onehot_p[None, :]
                J = (eye - P - Q) + c_ * (P + Q) + s_ * PQ - s_ * QP
                G = jnp.swapaxes(J, -1, -2) @ G @ J
    return jnp.diagonal(G, axis1=-2, axis2=-1)


def svdvals_small(H: jnp.ndarray, sweeps: int = 8) -> jnp.ndarray:
    """Singular values (desc) of batched complex (..., n_r, n_t), n_t small.

    Eigenvalues of the real embedding of G = H^H H come in duplicated pairs;
    sorting descending and taking every second value recovers the n_t
    singular values.
    """
    n_t = H.shape[-1]
    # real-embedded Gram directly (no complex matmul): with
    # He = [[Hr, -Hi], [Hi, Hr]], He^T He == embed(H^H H)
    Hr, Hi = jnp.real(H), jnp.imag(H)
    He = jnp.concatenate(
        [jnp.concatenate([Hr, -Hi], axis=-1),
         jnp.concatenate([Hi, Hr], axis=-1)], axis=-2)
    Ge = jnp.einsum("...ij,...ik->...jk", He, He)
    ev = _jacobi_sweeps_sym(Ge, sweeps)
    ev = jnp.sort(ev, axis=-1)[..., ::-1]          # (..., 2*n_t) desc
    ev_unique = ev[..., ::2]                       # duplicated pairs
    return jnp.sqrt(jnp.maximum(ev_unique, 0.0))
