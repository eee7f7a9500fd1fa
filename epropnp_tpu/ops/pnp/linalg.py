"""Batched small-matrix linear algebra, unrolled for TPU.

``jnp.linalg.solve``/``inv``/``cholesky`` on tiny (dof <= 7) systems lower to
batched LU loops that run far from speed-of-light on TPU. The PnP hot loop
(reference epropnp/levenberg_marquardt.py:216 and the proposal fitting in
epropnp/epropnp.py) only ever factorizes SPD matrices of size 3/4/6, so these
helpers unroll the Cholesky factorization and triangular solves into straight
elementwise code: every operation is a (batch,)-shaped multiply/add on the
VPU, with zero intra-matrix control flow.

Semantics match ``jnp.linalg``: NaNs propagate on non-PD input (callers that
need a fallback detect non-finite entries, exactly like the reference's
``cholesky_wrapper``).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of SPD ``a`` (..., n, n), unrolled over n."""
    n = a.shape[-1]
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(s)
            else:
                l[i][j] = s / l[j][j]
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [jnp.stack([l[i][j] if j <= i else zero for j in range(n)],
                      axis=-1) for i in range(n)]
    return jnp.stack(rows, axis=-2)


def tri_solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``l @ x = b`` for lower-triangular l. b: (..., n) or (..., n, m)."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    x = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - l[..., i, k, None] * x[k]
        x[i] = s / l[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def tri_solve_upper_t(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``l.T @ x = b`` for lower-triangular l (back substitution)."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    x = [None] * n
    for i in reversed(range(n)):
        s = b[..., i, :]
        for k in range(i + 1, n):
            s = s - l[..., k, i, None] * x[k]
        x[i] = s / l[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_spd_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a @ x = b`` for SPD a via unrolled Cholesky."""
    l = cholesky_small(a)
    return tri_solve_upper_t(l, tri_solve_lower(l, b))


def cho_solve_small(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve given a precomputed lower Cholesky factor."""
    return tri_solve_upper_t(l, tri_solve_lower(l, b))


def inv_spd_small(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of SPD ``a`` via Cholesky with identity right-hand side."""
    eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype), a.shape)
    return solve_spd_small(a, eye)


def inv_3x3(a: jnp.ndarray) -> jnp.ndarray:
    """General 3x3 inverse via the adjugate (camera intrinsics etc.)."""
    m = lambda i, j: a[..., i, j]  # noqa: E731
    c00 = m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1)
    c01 = m(1, 2) * m(2, 0) - m(1, 0) * m(2, 2)
    c02 = m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0)
    det = m(0, 0) * c00 + m(0, 1) * c01 + m(0, 2) * c02
    c10 = m(0, 2) * m(2, 1) - m(0, 1) * m(2, 2)
    c11 = m(0, 0) * m(2, 2) - m(0, 2) * m(2, 0)
    c12 = m(0, 1) * m(2, 0) - m(0, 0) * m(2, 1)
    c20 = m(0, 1) * m(1, 2) - m(0, 2) * m(1, 1)
    c21 = m(0, 2) * m(1, 0) - m(0, 0) * m(1, 2)
    c22 = m(0, 0) * m(1, 1) - m(0, 1) * m(1, 0)
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def solve_3x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a general 3x3 system; b (..., 3) or (..., 3, m)."""
    inv = inv_3x3(a)
    if b.ndim == a.ndim - 1:
        return jnp.einsum('...ij,...j->...i', inv, b)
    return inv @ b


def det_small(a: jnp.ndarray) -> jnp.ndarray:
    """Determinant of SPD ``a`` via the Cholesky diagonal product."""
    l = cholesky_small(a)
    d = l[..., 0, 0]
    for i in range(1, a.shape[-1]):
        d = d * l[..., i, i]
    return d * d
