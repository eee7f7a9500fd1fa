"""Unrolled small-matrix linalg vs jnp.linalg reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epropnp_tpu.ops.pnp import linalg as lg


def rand_spd(key, b, n, dtype=jnp.float64):
    a = jax.random.normal(key, (b, n, n), dtype)
    return a @ jnp.swapaxes(a, -1, -2) + 0.5 * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize('n', [3, 4, 6])
def test_cholesky_solve_inv_det(n):
    key = jax.random.PRNGKey(n)
    a = rand_spd(key, 16, n)
    b = jax.random.normal(jax.random.PRNGKey(n + 10), (16, n), jnp.float64)

    np.testing.assert_allclose(np.asarray(lg.cholesky_small(a)),
                               np.asarray(jnp.linalg.cholesky(a)), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(lg.solve_spd_small(a, b)),
        np.asarray(jnp.linalg.solve(a, b[..., None])[..., 0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lg.inv_spd_small(a)),
                               np.asarray(jnp.linalg.inv(a)), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lg.det_small(a)),
                               np.asarray(jnp.linalg.det(a)), rtol=1e-9)


def test_matrix_rhs_and_3x3():
    key = jax.random.PRNGKey(0)
    a = rand_spd(key, 8, 6)
    b = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 3), jnp.float64)
    np.testing.assert_allclose(np.asarray(lg.solve_spd_small(a, b)),
                               np.asarray(jnp.linalg.solve(a, b)), atol=1e-8)
    g = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 3), jnp.float64)
    g = g + 3.0 * jnp.eye(3)  # well-conditioned, not symmetric
    np.testing.assert_allclose(np.asarray(lg.inv_3x3(g)),
                               np.asarray(jnp.linalg.inv(g)), atol=1e-9)
    rhs = jax.random.normal(jax.random.PRNGKey(3), (8, 3), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(lg.solve_3x3(g, rhs)),
        np.asarray(jnp.linalg.solve(g, rhs[..., None])[..., 0]), atol=1e-9)


def test_cholesky_nan_on_non_pd():
    a = -jnp.eye(3, dtype=jnp.float64)[None]
    assert not np.all(np.isfinite(np.asarray(lg.cholesky_small(a))))
