"""End-to-End Probabilistic Perspective-n-Points (EPro-PnP) — TPU-native.

Treats the pose as a random variable ``p(y|X) ~ exp(-cost(y; X))`` and
approximates the normalizing integral with Adaptive Multiple Importance
Sampling (AMIS). Gradients flow only through the evaluated costs (at the
target pose and at the samples); proposal fitting and the deterministic
solve are ``stop_gradient``.

Semantics follow the reference ``epropnp/epropnp.py``. TPU-first
restructuring: the AMIS loop unrolls over the (small, static) ``num_iter``
with preallocated logprob buffers updated at static indices, and the
triangular ``logprobs[i, :i+1]`` structure is materialized exactly as in the
reference — per iteration, one vectorized log_prob of the new proposal over
all past samples and one of the old proposals over the new samples.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .common import evaluate_pnp, pnp_denormalize, pnp_normalize
from .distributions import (
    AngularCentralGaussian,
    MultivariateStudentT,
    VonMisesUniformMix,
    cholesky_wrapper,
)
from .linalg import det_small, inv_spd_small
from .levenberg_marquardt import LMSolver


@dataclass(frozen=True)
class EProPnPBase:
    """Base AMIS Monte Carlo forward. Reference: epropnp/epropnp.py:36-196."""

    mc_samples: int = 512
    num_iter: int = 4
    normalize: bool = False
    eps: float = 1e-5
    solver: Optional[LMSolver] = None

    def __post_init__(self):
        assert self.num_iter > 0
        assert self.mc_samples % self.num_iter == 0

    @property
    def iter_samples(self) -> int:
        return self.mc_samples // self.num_iter

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):
        """Deterministic solve. Reference: epropnp/epropnp.py:84-85."""
        return self.solver(*args, **kwargs)

    def monte_carlo_forward(self, x3d, x2d, w2d, camera, cost_fun, rng=None,
                            pose_init=None, force_init_solve=True, **kwargs):
        """Monte Carlo PnP forward (AMIS).

        Args:
            x3d/x2d/w2d: (num_obj, num_points, {3, 2, 2}).
            rng: PRNG key driving the init solver and the AMIS proposals.
            pose_init: optional (num_obj, 4 or 7) target pose y_gt.

        Returns:
            (pose_opt, cost, pose_opt_plus,
             pose_samples (mc_samples, num_obj, 4|7),
             pose_sample_logweights (mc_samples, num_obj), cost_init)
        Reference: epropnp/epropnp.py:87-196.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.normalize:
            transform, x3d, pose_init = pnp_normalize(
                x3d, pose_init, detach_transformation=True)

        assert x3d.ndim == x2d.ndim == w2d.ndim == 3
        num_obj = x3d.shape[0]
        s = self.iter_samples
        t = self.num_iter

        def eval_cost(pose):
            return evaluate_pnp(
                x3d, x2d, w2d, pose, camera, cost_fun, out_cost=True).cost

        cost_init = eval_cost(pose_init) if pose_init is not None else None

        k_solve, k_amis = jax.random.split(rng)
        pose_opt, pose_cov, cost, pose_opt_plus = self.solver(
            x3d, x2d, w2d, camera, cost_fun, rng=k_solve,
            pose_init=pose_init, cost_init=cost_init,
            with_pose_cov=True, force_init_solve=force_init_solve,
            normalize_override=False, **kwargs)

        # Proposal params are fitted under stop_gradient (reference :139-140).
        # TPU restructuring: the AMIS loop is a ``lax.scan`` over a constant
        # number of iterations — the body traces ONCE (the reference's
        # triangular ``logprobs[i, :i+1]`` updates become full-width writes
        # masked at the mixture stage), which keeps the compiled graph ~t x
        # smaller than unrolling. Proposal-parameter buffers are (t, ...)
        # stacked arrays updated at the loop index.
        params0 = jax.lax.stop_gradient(
            self.initial_fit(pose_opt, pose_cov, camera))
        # Buffers live in the sample dtype: estimate_params refits them from
        # (x3d-dtype) samples each iteration, and dynamic updates require a
        # dtype match even when the initial fit was promoted (e.g. f64 cam).
        params_buf = jax.tree_util.tree_map(
            lambda a: jnp.zeros((t,) + a.shape, x3d.dtype).at[0].set(
                a.astype(x3d.dtype)),
            params0)

        pose_dim = pose_opt.shape[-1]
        pose_samples = jnp.zeros((t, s, num_obj, pose_dim), x3d.dtype)
        logprobs = jnp.zeros((t, t, s, num_obj), x3d.dtype)
        cost_pred = jnp.zeros((t, s, num_obj), x3d.dtype)
        iter_keys = jax.random.split(k_amis, t)
        neg_inf = jnp.asarray(-jnp.inf, x3d.dtype)
        iota_t = jnp.arange(t)

        def amis_iter(carry, scan_in):
            params_buf, pose_samples, logprobs, cost_pred = carry
            i, key = scan_in
            params_i = jax.tree_util.tree_map(lambda a: a[i], params_buf)

            # ===== step 1: sample from the newest proposal =====
            new_trans, new_rot = self.gen_new_distr(params_i)
            k_t, k_r = jax.random.split(key)
            trans_samples = new_trans.sample(k_t, (s,))
            rot_samples = new_rot.sample(k_r, (s,))
            samples_i = jax.lax.stop_gradient(
                jnp.concatenate([trans_samples, rot_samples], axis=-1))
            pose_samples = pose_samples.at[i].set(samples_i)

            # ===== step 2: evaluate the integrand (differentiable) =====
            cost_pred = cost_pred.at[i].set(eval_cost(samples_i))

            # ===== step 3: proposal mixture logprobs =====
            # New distr on ALL sample rows (rows > i are placeholders,
            # masked out of the mixture): (t, s, num_obj).
            lp_new = new_trans.log_prob(pose_samples[..., :3]) \
                + _flatten2(new_rot.log_prob(pose_samples[..., 3:]))
            # All stacked distrs (rows > i placeholders) on the new samples.
            old_trans, old_rot = self.gen_stacked_distr(params_buf)
            lp_all = old_trans.log_prob(samples_i[..., :3]) \
                + _flatten2(old_rot.log_prob(samples_i[..., 3:]))
            logprobs = logprobs.at[:, i].set(lp_all)
            logprobs = logprobs.at[i, :].set(lp_new)

            # Mixture over valid proposals only (reference's triangular
            # structure): distr row j participates iff j <= i.
            valid_distr = (iota_t <= i)[:, None, None, None]
            mix_logprobs = jax.scipy.special.logsumexp(
                jnp.where(valid_distr, logprobs, neg_inf), axis=0
            ) - jnp.log(i + 1.0).astype(x3d.dtype)

            # ===== step 4: sample log weights (sample rows > i masked) =====
            valid_sample = (iota_t <= i)[:, None, None]
            logweights = jnp.where(
                valid_sample, -cost_pred - mix_logprobs, neg_inf)

            # ===== step 5: fit the next proposal =====
            new_params = jax.lax.stop_gradient(self.estimate_params(
                jax.lax.stop_gradient(pose_samples).reshape(
                    t * s, num_obj, pose_dim),
                jax.lax.stop_gradient(logweights).reshape(t * s, num_obj)))
            # On the last iteration the write lands back on row i (clamped
            # dynamic index), after its final read — harmless.
            params_buf = jax.tree_util.tree_map(
                lambda buf, p: jax.lax.dynamic_update_index_in_dim(
                    buf, p, jnp.minimum(i + 1, t - 1), 0),
                params_buf, new_params)
            return (params_buf, pose_samples, logprobs, cost_pred), None

        (params_buf, pose_samples, logprobs, cost_pred), _ = jax.lax.scan(
            amis_iter,
            (params_buf, pose_samples, logprobs, cost_pred),
            (jnp.arange(t), iter_keys))

        # Final mixture over all t proposals (all rows valid).
        mix_logprobs = jax.scipy.special.logsumexp(
            logprobs, axis=0) - math.log(t)
        pose_sample_logweights = -cost_pred - mix_logprobs

        pose_samples = pose_samples.reshape(self.mc_samples, num_obj, pose_dim)
        pose_sample_logweights = pose_sample_logweights.reshape(
            self.mc_samples, num_obj)

        if self.normalize:
            pose_opt = pnp_denormalize(transform, pose_opt)
            pose_samples = pnp_denormalize(transform, pose_samples)
            if pose_opt_plus is not None:
                pose_opt_plus = pnp_denormalize(transform, pose_opt_plus)

        return (pose_opt, cost, pose_opt_plus, pose_samples,
                pose_sample_logweights, cost_init)


def _flatten2(x):
    """Collapse the trailing event dim of rotation log_probs: (..., k) -> sum.

    The 4DoF rotation log_prob has a trailing singleton (B, 1) event dim and
    the 6DoF ACG log_prob is already scalar per sample; the reference's
    ``.flatten(2)`` on (i+1, s, B, 1) is equivalent to squeezing it.
    """
    if x.ndim >= 1 and x.shape[-1] == 1:
        return x[..., 0]
    return x


@dataclass(frozen=True)
class EProPnP4DoF(EProPnPBase):
    """4DoF pose [x, y, z, yaw]: t-dist translation + von Mises/uniform yaw.

    Reference: epropnp/epropnp.py:199-260.
    """

    def initial_fit(self, pose_opt, pose_cov, camera):
        trans_mode = pose_opt[..., :3]
        rot_mode = pose_opt[..., 3:]
        trans_cov_tril = cholesky_wrapper(pose_cov[..., :3, :3], [1.0, 1.0, 4.0])
        rot_kappa = 0.33 / jnp.maximum(pose_cov[..., 3:, 3], self.eps)
        return trans_mode, trans_cov_tril, rot_mode, rot_kappa

    @staticmethod
    def gen_new_distr(params):
        trans_mode, trans_cov_tril, rot_mode, rot_kappa = params
        return (MultivariateStudentT(3.0, trans_mode, trans_cov_tril),
                VonMisesUniformMix(rot_mode, rot_kappa))

    @staticmethod
    def gen_stacked_distr(params):
        """Distributions over stacked (t, ...) proposal-parameter buffers."""
        trans_mode, trans_cov_tril, rot_mode, rot_kappa = (
            p[:, None] for p in params)
        return (MultivariateStudentT(3.0, trans_mode, trans_cov_tril),
                VonMisesUniformMix(rot_mode, rot_kappa))

    @classmethod
    def gen_old_distr(cls, params_list):
        return cls.gen_stacked_distr(
            tuple(jnp.stack(ps) for ps in zip(*params_list)))

    def estimate_params(self, pose_samples, pose_sample_logweights):
        """Weighted translation moments + circular yaw statistics.

        Reference: epropnp/epropnp.py:238-260.
        """
        w = jax.nn.softmax(pose_sample_logweights, axis=0)  # (c, num_obj)
        trans_mode = jnp.sum(w[..., None] * pose_samples[..., :3], axis=0)
        dev = pose_samples[..., :3] - trans_mode
        trans_cov = jnp.sum(
            w[..., None, None] * dev[..., :, None] * dev[..., None, :], axis=0)
        trans_cov_tril = cholesky_wrapper(trans_cov, [1.0, 1.0, 4.0])

        sin_mean = jnp.sum(w[..., None] * jnp.sin(pose_samples[..., 3:]), axis=0)
        cos_mean = jnp.sum(w[..., None] * jnp.cos(pose_samples[..., 3:]), axis=0)
        rot_mode = jnp.arctan2(sin_mean, cos_mean)
        r_sq = jnp.square(sin_mean) + jnp.square(cos_mean)
        rot_kappa = 0.33 * jnp.maximum(jnp.sqrt(r_sq), self.eps) \
            * (2.0 - r_sq) / jnp.maximum(1.0 - r_sq, self.eps)
        return trans_mode, trans_cov_tril, rot_mode, rot_kappa


@dataclass(frozen=True)
class EProPnP6DoF(EProPnPBase):
    """6DoF pose [x, y, z, w, i, j, k]: t-dist translation + ACG rotation.

    Reference: epropnp/epropnp.py:263-342.
    """

    acg_mle_iter: int = 3
    acg_dispersion: float = 0.001

    def initial_fit(self, pose_opt, pose_cov, camera):
        trans_mode = pose_opt[..., :3]
        rot_mode = pose_opt[..., 3:]
        trans_cov_tril = cholesky_wrapper(pose_cov[..., :3, :3])

        eye4 = jnp.eye(4, dtype=pose_opt.dtype)
        tf = camera.get_quaternion_transfrom_mat(rot_mode)  # (num_obj, 4, 3)
        rot_cov = inv_spd_small(
            tf @ inv_spd_small(pose_cov[..., 3:, 3:])
            @ jnp.swapaxes(tf, -1, -2) + eye4)
        rot_cov = rot_cov / jnp.trace(
            rot_cov, axis1=-2, axis2=-1)[..., None, None]
        rot_cov_tril = cholesky_wrapper(
            rot_cov + det_small(rot_cov)[..., None, None] ** 0.25
            * (self.acg_dispersion * eye4))
        return trans_mode, trans_cov_tril, rot_cov_tril

    @staticmethod
    def gen_new_distr(params):
        trans_mode, trans_cov_tril, rot_cov_tril = params
        return (MultivariateStudentT(3.0, trans_mode, trans_cov_tril),
                AngularCentralGaussian(rot_cov_tril))

    @staticmethod
    def gen_stacked_distr(params):
        """Distributions over stacked (t, ...) proposal-parameter buffers."""
        trans_mode, trans_cov_tril, rot_cov_tril = (
            p[:, None] for p in params)
        return (MultivariateStudentT(3.0, trans_mode, trans_cov_tril),
                AngularCentralGaussian(rot_cov_tril))

    @classmethod
    def gen_old_distr(cls, params_list):
        return cls.gen_stacked_distr(
            tuple(jnp.stack(ps) for ps in zip(*params_list)))

    def estimate_params(self, pose_samples, pose_sample_logweights):
        """Weighted moments + fixed-point ACG maximum likelihood.

        Reference: epropnp/epropnp.py:317-342.
        """
        w = jax.nn.softmax(pose_sample_logweights, axis=0)  # (c, num_obj)
        trans_mode = jnp.sum(w[..., None] * pose_samples[..., :3], axis=0)
        dev = pose_samples[..., :3] - trans_mode
        trans_cov = jnp.sum(
            w[..., None, None] * dev[..., :, None] * dev[..., None, :], axis=0)
        trans_cov_tril = cholesky_wrapper(trans_cov)

        eye4 = jnp.eye(4, dtype=pose_samples.dtype)
        rot = pose_samples[..., 3:]                            # (c, num_obj, 4)
        r_r_t = rot[..., :, None] * rot[..., None, :]          # (c, num_obj, 4, 4)
        num_obj = pose_samples.shape[1]
        rot_cov = jnp.broadcast_to(eye4, (num_obj, 4, 4))
        for _ in range(self.acg_mle_iter):
            m = jnp.einsum('cbi,bij,cbj->cb', rot, inv_spd_small(rot_cov), rot)
            inv_m_w = w / jnp.maximum(m, self.eps)             # (c, num_obj)
            inv_m_wn = inv_m_w / jnp.sum(inv_m_w, axis=0)
            rot_cov = jnp.sum(inv_m_wn[..., None, None] * r_r_t, axis=0) \
                + eye4 * self.eps
        rot_cov_tril = cholesky_wrapper(
            rot_cov + det_small(rot_cov)[..., None, None] ** 0.25
            * (self.acg_dispersion * eye4))
        return trans_mode, trans_cov_tril, rot_cov_tril
