"""Property tests of the AMIS proposal distributions.

The reference uses pyro/numpy samplers whose RNG streams cannot match, so
these are distributional checks: normalization of densities, analytic
log_prob parity where an oracle exists (scipy / torch), and sample moments.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epropnp_tpu.ops.pnp.distributions import (
    AngularCentralGaussian,
    MultivariateStudentT,
    VonMisesUniformMix,
    cholesky_wrapper,
    von_mises_log_prob,
)


def test_student_t_log_prob_vs_scipy():
    from scipy.stats import multivariate_t
    rng = np.random.default_rng(0)
    loc = rng.normal(size=(5, 3))
    a = rng.normal(size=(5, 3, 3)) * 0.3
    cov = a @ np.swapaxes(a, -1, -2) + np.eye(3)
    tril = np.linalg.cholesky(cov)
    d = MultivariateStudentT(3.0, jnp.asarray(loc), jnp.asarray(tril))
    x = rng.normal(size=(7, 5, 3))
    lp = d.log_prob(jnp.asarray(x))
    for b in range(5):
        expect = multivariate_t(loc[b], cov[b], df=3).logpdf(x[:, b])
        np.testing.assert_allclose(lp[:, b], expect, rtol=1e-10)


def test_student_t_sample_moments():
    rng = np.random.default_rng(1)
    loc = rng.normal(size=(2, 3))
    tril = np.stack([np.eye(3) * 0.5, np.diag([1.0, 2.0, 0.3])])
    d = MultivariateStudentT(3.0, jnp.asarray(loc), jnp.asarray(tril))
    s = d.sample(jax.random.PRNGKey(0), (200000,))
    assert s.shape == (200000, 2, 3)
    # Mean exists for df=3.
    np.testing.assert_allclose(np.mean(np.asarray(s), axis=0), loc, atol=0.05)
    # Median along each axis equals loc (robust check, variance is heavy-tailed).
    np.testing.assert_allclose(np.median(np.asarray(s), axis=0), loc, atol=0.02)


def test_von_mises_log_prob_vs_torch():
    import torch
    rng = np.random.default_rng(2)
    loc = rng.uniform(-3, 3, size=(4, 1))
    kappa = rng.uniform(0.1, 50.0, size=(4, 1))
    x = rng.uniform(-np.pi, np.pi, size=(6, 4, 1))
    lp = von_mises_log_prob(jnp.asarray(x), jnp.asarray(loc), jnp.asarray(kappa))
    expect = torch.distributions.VonMises(
        torch.as_tensor(loc), torch.as_tensor(kappa)).log_prob(torch.as_tensor(x))
    np.testing.assert_allclose(lp, expect.numpy(), rtol=1e-6)


def test_von_mises_mix_log_prob_vs_scipy():
    """Exact mixture log-prob oracle: 0.75 scipy.vonmises + 0.25 uniform.

    Reference: epropnp/distributions.py:74-79 (VonMisesUniformMix
    log_prob as logaddexp of the two weighted components).
    """
    from scipy.stats import vonmises
    rng = np.random.default_rng(7)
    loc = rng.uniform(-3, 3, size=(5, 1))
    kappa = rng.uniform(0.05, 80.0, size=(5, 1))
    x = rng.uniform(-np.pi, np.pi, size=(9, 5, 1))
    d = VonMisesUniformMix(jnp.asarray(loc), jnp.asarray(kappa))
    lp = np.asarray(d.log_prob(jnp.asarray(x)))
    pdf_vm = vonmises.pdf(x, kappa[None], loc=loc[None])
    expect = np.log(0.75 * pdf_vm + 0.25 / (2 * np.pi))
    np.testing.assert_allclose(lp, expect, rtol=1e-6, atol=1e-12)


def test_von_mises_mix_normalizes():
    loc = jnp.asarray([[0.7], [-2.0]])
    kappa = jnp.asarray([[5.0], [0.5]])
    d = VonMisesUniformMix(loc, kappa)
    grid = jnp.linspace(-math.pi, math.pi, 20001)
    lp = d.log_prob(grid[:, None, None])
    integral = np.trapezoid(np.exp(np.asarray(lp[:, :, 0])), np.asarray(grid),
                            axis=0)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-6)


def test_von_mises_mix_sampling_matches_density():
    """Empirical histogram of mixture samples matches the analytic density."""
    loc = jnp.asarray([[1.2]])
    kappa = jnp.asarray([[8.0]])
    d = VonMisesUniformMix(loc, kappa)
    n = 400000
    s = np.asarray(d.sample(jax.random.PRNGKey(3), (n,)))[:, 0, 0]
    assert np.all((s >= -np.pi) & (s <= np.pi))
    hist, edges = np.histogram(s, bins=100, range=(-np.pi, np.pi),
                               density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    dens = np.exp(np.asarray(d.log_prob(jnp.asarray(centers)[:, None, None]))
                  )[:, 0, 0]
    assert np.max(np.abs(hist - dens)) < 0.05 * np.max(dens) + 0.01


@pytest.mark.parametrize("q", [4])
def test_acg_log_prob_normalizes_on_sphere(q):
    """Monte Carlo integral of the ACG density over S^3 equals 1."""
    rng = np.random.default_rng(4)
    a = rng.normal(size=(q, q)) * 0.5
    cov = a @ a.T + np.eye(q)
    cov /= np.trace(cov)
    tril = np.linalg.cholesky(cov)
    d = AngularCentralGaussian(jnp.asarray(tril)[None])
    m = 400000
    u = rng.normal(size=(m, q))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    area = 2 * math.pi ** (q / 2) / math.gamma(q / 2)
    lp = np.asarray(d.log_prob(jnp.asarray(u[:, None, :])))[:, 0]
    integral = np.mean(np.exp(lp)) * area
    np.testing.assert_allclose(integral, 1.0, rtol=0.02)


def test_acg_isotropic_samples_uniform():
    tril = jnp.eye(4)[None] * 0.5
    d = AngularCentralGaussian(tril)
    s = np.asarray(d.sample(jax.random.PRNGKey(5), (100000,)))[:, 0]
    np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-6)
    second_moment = np.einsum('ni,nj->ij', s, s) / len(s)
    np.testing.assert_allclose(second_moment, np.eye(4) / 4, atol=0.01)


def test_cholesky_wrapper_fallback():
    good = jnp.asarray(np.diag([4.0, 1.0, 9.0]))[None]
    bad = jnp.asarray(-np.eye(3))[None]
    mats = jnp.concatenate([good, bad])
    tril = cholesky_wrapper(mats, [1.0, 1.0, 4.0])
    np.testing.assert_allclose(tril[0], np.diag([2.0, 1.0, 3.0]), atol=1e-12)
    np.testing.assert_allclose(tril[1], np.diag([1.0, 1.0, 4.0]), atol=1e-12)


def test_von_mises_sampler_finite_extreme_kappa():
    """f32 regression: the textbook Best-Fisher rho = (tau - sqrt(2 tau))
    / (2 kappa) cancels to 0 below kappa ~ 4e-4 (r = inf -> f = inf/inf
    = nan), and at huge kappa r rounds to 1.0 while z can hit -1.0
    (f = 0/0). Both arise from real AMIS proposal fits (a near-uniform
    yaw posterior gave kappa = 2.5e-5 in the Det dryrun). The sampler
    must stay finite and monotonically concentrate with kappa."""
    import jax
    import jax.numpy as jnp
    from epropnp_tpu.ops.pnp.distributions import _sample_von_mises

    resultants = []
    for kappa in (1e-6, 2.5e-5, 4e-4, 0.5, 23.0, 1e8):
        x = np.asarray(_sample_von_mises(
            jax.random.PRNGKey(0), jnp.asarray(0.3), jnp.asarray(kappa),
            (4000,), jnp.float32))
        assert np.isfinite(x).all(), kappa
        resultants.append(np.hypot(np.cos(x).mean(), np.sin(x).mean()))
    assert resultants[-1] > 0.999        # near-delta at huge kappa
    assert resultants[0] < 0.05          # near-uniform at tiny kappa
    assert all(b >= a - 0.02 for a, b in zip(resultants, resultants[1:]))
