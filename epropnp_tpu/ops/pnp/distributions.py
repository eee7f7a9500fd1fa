"""Proposal distributions for AMIS pose sampling (pure JAX, explicit PRNG).

Replaces the reference's pyro/numpy distributions
(``epropnp/distributions.py`` + pyro ``MultivariateStudentT``):

  * multivariate Student's t (translation proposal),
  * von Mises + uniform mixture on the circle (4DoF yaw proposal) — the
    reference samples via ``np.random.vonmises`` on the host (a device<->host
    sync, reference :62-72); here a Best-Fisher rejection sampler runs fully
    on-device with a fixed iteration cap,
  * angular central Gaussian on S^3 (6DoF quaternion proposal).

All are parameter structs + pure functions; sampling takes explicit keys.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, i0e

from .linalg import cholesky_small, tri_solve_lower


def batch_mahalanobis(scale_tril, diff):
    """Squared Mahalanobis norm ``diff^T (L L^T)^{-1} diff`` with batching.

    scale_tril: (*, d, d); diff: (**, d) broadcast-compatible -> (**,).
    """
    d = diff.shape[-1]
    # Broadcast batch dims of L and diff.
    batch = jnp.broadcast_shapes(scale_tril.shape[:-2], diff.shape[:-1])
    L = jnp.broadcast_to(scale_tril, batch + (d, d))
    x = jnp.broadcast_to(diff, batch + (d,))
    sol = tri_solve_lower(L, x)
    return jnp.sum(jnp.square(sol), axis=-1)


def half_log_det(scale_tril):
    return jnp.sum(
        jnp.log(jnp.diagonal(scale_tril, axis1=-2, axis2=-1)), axis=-1)


def cholesky_wrapper(mat, default_diag=None):
    """Cholesky with per-matrix fallback to a default diagonal on failure.

    The reference (epropnp/epropnp.py:16-33) catches the LAPACK error and
    substitutes ``diag(default_diag)`` per failing matrix; on TPU
    ``jnp.linalg.cholesky`` yields NaNs instead, so the fallback is a
    ``where`` on finiteness.
    """
    n = mat.shape[-1]
    tril = cholesky_small(mat)
    ok = jnp.all(jnp.isfinite(tril), axis=(-2, -1), keepdims=True)
    if default_diag is not None:
        default = jnp.diag(jnp.asarray(default_diag, dtype=mat.dtype))
    else:
        default = jnp.eye(n, dtype=mat.dtype)
    return jnp.where(ok, jnp.where(jnp.isfinite(tril), tril, 0.0), default)


# --------------------------------------------------------------------------
# Multivariate Student's t
# --------------------------------------------------------------------------

class MultivariateStudentT(NamedTuple):
    """Parameters of a multivariate t distribution (df is static-ish scalar)."""

    df: Union[float, jnp.ndarray]
    loc: jnp.ndarray          # (*, d)
    scale_tril: jnp.ndarray   # (*, d, d)

    def log_prob(self, value):
        d = self.loc.shape[-1]
        df = jnp.asarray(self.df, dtype=value.dtype)
        M = batch_mahalanobis(self.scale_tril, value - self.loc)
        hld = half_log_det(self.scale_tril)
        return (gammaln(0.5 * (df + d)) - gammaln(0.5 * df)
                - 0.5 * d * jnp.log(df * math.pi) - hld
                - 0.5 * (df + d) * jnp.log1p(M / df))

    def sample(self, key, sample_shape=()):
        d = self.loc.shape[-1]
        batch = self.loc.shape[:-1]
        shape = tuple(sample_shape) + batch
        k_norm, k_chi2 = jax.random.split(key)
        z = jax.random.normal(k_norm, shape + (d,), dtype=self.loc.dtype)
        df = jnp.asarray(self.df, dtype=self.loc.dtype)
        chi2 = 2.0 * jax.random.gamma(
            k_chi2, 0.5 * df, shape=shape, dtype=self.loc.dtype)
        scaled = jnp.einsum('...ij,...j->...i', self.scale_tril, z)
        return self.loc + scaled * jnp.sqrt(df / chi2)[..., None]


# --------------------------------------------------------------------------
# Von Mises + uniform mixture on the circle
# --------------------------------------------------------------------------

def _sample_von_mises(key, loc, concentration, shape, dtype,
                      max_rounds: int = 64):
    """Best-Fisher (1979) rejection sampler, fixed-cap masked loop.

    Runs entirely on-device (no host sync). The acceptance rate is >= ~58%
    for all kappa, so 64 masked rounds leave a < 1e-24 failure probability;
    unaccepted lanes keep the last proposal.
    """
    kappa = jnp.clip(concentration, 1e-6, 1e18)
    s_ = jnp.sqrt(1.0 + 4.0 * jnp.square(kappa))
    tau = 1.0 + s_
    # cancellation-free form of (tau - sqrt(2 tau)) / (2 kappa): the
    # textbook expression rounds to 0/(2 kappa) = 0 in f32 below
    # kappa ~ 4e-4, sending r = (1 + rho^2)/(2 rho) to inf and the
    # acceptance ratio f to inf/inf = nan (small kappa is routine for
    # the AMIS yaw proposal on near-uniform objects)
    rho = 2.0 * kappa * tau / ((s_ + 1.0) * (tau + jnp.sqrt(2.0 * tau)))
    r = (1.0 + jnp.square(rho)) / (2.0 * rho)

    def body(i, carry):
        x, done, key = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        u1 = jax.random.uniform(k1, shape, dtype=dtype)
        u2 = jax.random.uniform(k2, shape, dtype=dtype)
        u3 = jax.random.uniform(k3, shape, dtype=dtype)
        z = jnp.cos(math.pi * u1)
        # guarded division: at large kappa r rounds to 1.0 in f32 and z
        # can hit -1.0, making (1 + rz)/(r + z) = 0/0 = nan (the AMIS
        # proposal fit can legitimately produce near-delta kappa on
        # degenerate objects). The z -> -r limit of the target density
        # is the point mass at loc, i.e. f -> 1.
        denom = r + z
        safe = jnp.abs(denom) > 1e-12
        f = jnp.where(safe,
                      (1.0 + r * z) / jnp.where(safe, denom, 1.0),
                      1.0)
        c = kappa * (r - f)
        accept = ((c * (2.0 - c) - u2) > 0.0) \
            | ((jnp.log(jnp.maximum(c / jnp.maximum(u2, 1e-30), 1e-30))
                + 1.0 - c) >= 0.0)
        proposal = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        x = jnp.where(done, x, proposal)
        done = done | accept
        return x, done, key

    x0 = jnp.zeros(shape, dtype=dtype)
    done0 = jnp.zeros(shape, dtype=bool)
    x, _, _ = jax.lax.fori_loop(0, max_rounds, body, (x0, done0, key))
    # Shift by loc and wrap into [-pi, pi] (numpy vonmises convention).
    out = x + loc
    return out - 2.0 * math.pi * jnp.round(out / (2.0 * math.pi))


def von_mises_log_prob(value, loc, concentration):
    return concentration * jnp.cos(value - loc) \
        - math.log(2.0 * math.pi) \
        - (jnp.log(i0e(concentration)) + concentration)


class VonMisesUniformMix(NamedTuple):
    """0.75 von Mises + 0.25 uniform mixture on the circle.

    Reference: epropnp/distributions.py:55-79. Sampling draws the first
    ``round(S * uniform_mix)`` samples from the uniform component and the
    rest from the von Mises component (deterministic split, as in the
    reference).
    """

    loc: jnp.ndarray            # (*, 1)
    concentration: jnp.ndarray  # (*, 1)
    uniform_mix: float = 0.25

    def log_prob(self, value):
        vm = von_mises_log_prob(value, self.loc, self.concentration) \
            + math.log(1.0 - self.uniform_mix)
        return jnp.logaddexp(
            vm, math.log(self.uniform_mix / (2.0 * math.pi)))

    def sample(self, key, sample_shape=()):
        assert len(sample_shape) == 1
        s = sample_shape[0]
        n_uniform = round(s * self.uniform_mix)
        n_vm = s - n_uniform
        batch = self.loc.shape
        k_u, k_v = jax.random.split(key)
        dtype = self.loc.dtype
        uniform = jax.random.uniform(
            k_u, (n_uniform,) + batch, dtype=dtype,
            minval=-math.pi, maxval=math.pi)
        vm = _sample_von_mises(
            k_v, self.loc, self.concentration, (n_vm,) + batch, dtype)
        return jnp.concatenate([uniform, vm], axis=0)


# --------------------------------------------------------------------------
# Angular central Gaussian on S^{q-1}
# --------------------------------------------------------------------------

class AngularCentralGaussian(NamedTuple):
    """Antipodally symmetric distribution on the unit sphere S^{q-1}.

    log_prob = -q/2 * log(x^T Sigma^{-1} x) - log|L| - log(area(S^{q-1})).
    Reference: epropnp/distributions.py:15-52.
    """

    scale_tril: jnp.ndarray  # (*, q, q)
    eps: float = 1e-6

    @property
    def q(self):
        return self.scale_tril.shape[-1]

    def log_prob(self, value):
        q = self.q
        area = 2.0 * math.pi ** (0.5 * q) / math.gamma(0.5 * q)
        M = batch_mahalanobis(self.scale_tril, value)
        hld = half_log_det(self.scale_tril)
        return jnp.log(M) * (-q / 2.0) - hld - math.log(area)

    def sample(self, key, sample_shape=()):
        q = self.q
        batch = self.scale_tril.shape[:-2]
        shape = tuple(sample_shape) + batch + (q,)
        normal = jax.random.normal(key, shape, dtype=self.scale_tril.dtype)
        gaussian = jnp.einsum('...ij,...j->...i', self.scale_tril, normal)
        norm = jnp.linalg.norm(gaussian, axis=-1, keepdims=True)
        unit = jnp.zeros((q,), self.scale_tril.dtype).at[0].set(1.0)
        return jnp.where(norm < self.eps, unit,
                         gaussian / jnp.maximum(norm, 1e-30))
