"""Monte Carlo KL pose loss with an EMA normalization factor.

``loss = (cost_target + logsumexp(pose_sample_logweights)) / norm_factor``
where ``norm_factor`` is an exponential moving average of the caller-supplied
scale, synced across data-parallel replicas with ``lax.pmean``.

The EMA buffer is explicit functional state (a train-state leaf) instead of a
module buffer; it must be checkpointed with the params, exactly like the
reference's registered buffer.

Reference: EPro-PnP-6DoF/lib/models/monte_carlo_pose_loss.py:9-35 and
EPro-PnP-Det/epropnp_det/models/losses/monte_carlo_pose_loss.py:13-66 (the
Det variant adds mmdet-style weighting and the cross-replica ``reduce_mean``;
both are covered here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MonteCarloPoseLossState:
    norm_factor: jnp.ndarray  # scalar EMA buffer

    @classmethod
    def create(cls, init_norm_factor: float = 1.0, dtype=jnp.float32):
        return cls(norm_factor=jnp.asarray(init_norm_factor, dtype))


def monte_carlo_pose_loss(
    pose_sample_logweights: jnp.ndarray,  # (mc_samples, num_obj)
    cost_target: jnp.ndarray,             # (num_obj,)
    norm_factor: jnp.ndarray,             # scalar, current-batch scale
    state: MonteCarloPoseLossState,
    momentum: float = 0.01,
    training: bool = True,
    axis_name: Optional[str] = None,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
    loss_weight: float = 1.0,
):
    """Returns ``(loss, new_state)``.

    Args:
        axis_name: data-parallel mesh axis for the cross-replica mean of
            ``norm_factor`` (the reference's ``reduce_mean``); None when
            single-device.
        weight / avg_factor: mmdet-style per-object weights and averaging
            factor (Det variant); None reproduces the 6DoF variant.
    """
    if training:
        nf = jax.lax.stop_gradient(norm_factor)
        if axis_name is not None:
            nf = jax.lax.pmean(nf, axis_name)
        new_norm_factor = state.norm_factor * (1.0 - momentum) + momentum * nf
        new_state = state.replace(norm_factor=new_norm_factor)
    else:
        new_state = state

    loss_pred = jax.scipy.special.logsumexp(pose_sample_logweights, axis=0)
    loss_pose = cost_target + loss_pred
    loss_pose = jnp.where(jnp.isnan(loss_pose), 0.0, loss_pose)
    if weight is not None:
        loss_pose = loss_pose * weight
    if avg_factor is not None:
        loss = jnp.sum(loss_pose) / avg_factor
    else:
        loss = jnp.mean(loss_pose)
    loss = loss * loss_weight / new_state.norm_factor
    return loss, new_state
