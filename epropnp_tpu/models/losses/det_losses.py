"""Detection-suite losses (functional, explicit EMA state, pmean sync).

Covers the reference's loss zoo (EPro-PnP-Det/epropnp_det/models/losses/):
  * ``mvd_gaussian_mixture_nll_loss`` — multivariate-deviation Gaussian
    mixture NLL over attention heads with log-std + log-mix-weight, optional
    cross-RoI mixture normalization, and an adaptive weight that divides by
    an EMA of the mean inverse std (cross-replica synced)
    (mvd_gaussian_mixture_nll_loss.py:15-107).
  * ``smooth_l1_loss_mod`` — smooth L1 accepting integer targets 0/-1 for
    precomputed diffs (smooth_l1_loss.py:13-50).
  * ``cosine_angle_loss`` — ``1 - cos(pred - target)``
    (cosine_angle_loss.py:12-39).
  * ``sigmoid focal loss`` (mmdet FocalLoss semantics, used by FCOS cls).
  * mmdet-style ``weight_reduce_loss`` helpers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def weight_reduce_loss(loss, weight=None, reduction: str = 'mean',
                       avg_factor=None):
    """mmdet semantics: elementwise weight, then mean/sum/none."""
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    if avg_factor is not None:
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
    return jnp.mean(loss)


def smooth_l1_loss_mod(pred, target, beta: float = 1.0, weight=None,
                       reduction: str = 'mean', avg_factor=None):
    """Smooth L1; integer targets 0 (|pred| is the diff) / -1 (pred is)."""
    assert beta > 0
    if isinstance(target, int):
        diff = jnp.abs(pred) if target == 0 else pred
    else:
        diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def cosine_angle_loss(pred, target, weight=None, reduction: str = 'mean',
                      avg_factor=None):
    loss = 1.0 - jnp.cos(pred - target)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def sigmoid_focal_loss(logits, targets_onehot, gamma: float = 2.0,
                       alpha: float = 0.25, weight=None,
                       reduction: str = 'mean', avg_factor=None):
    """mmdet sigmoid focal loss. targets_onehot: same shape as logits."""
    p = jax.nn.sigmoid(logits)
    ce = (jax.nn.softplus(-logits) * targets_onehot
          + jax.nn.softplus(logits) * (1.0 - targets_onehot))
    p_t = p * targets_onehot + (1.0 - p) * (1.0 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1.0 - alpha) * (1.0 - targets_onehot)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * ce
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mvd_gaussian_mixture_nll_loss(
        pred, target, logstd, logmixweight, mean_inv_std,
        roi_boxes=None, roi_img_ids=None, adaptive_weight: bool = True,
        momentum: float = 0.1, mix_axis: int = 1, eps: float = 1e-4,
        training: bool = True, axis_name: Optional[str] = None,
        weight=None, reduction: str = 'mean', avg_factor=None):
    """Gaussian-mixture NLL of reprojection deviations.

    Args:
        pred/target: (n, num_mix, h, w, 2); integer target 0/-1 supported.
        logstd: (n, num_mix, h, w, 2); logmixweight: (n, num_mix, h, w).
        mean_inv_std: scalar EMA buffer (functional state).
        roi_boxes/roi_img_ids: enable cross-RoI logsumexp normalization.

    Returns: (loss, new_mean_inv_std).
    """
    if isinstance(target, int):
        diff = jnp.abs(pred) if target == 0 else pred
    else:
        diff = jnp.abs(pred - target)
    inverse_std = jnp.minimum(jnp.exp(-logstd), 1.0 / eps)
    dw_sq = jnp.sum(jnp.square(diff * inverse_std), axis=-1)
    loss_comp = -0.5 * dw_sq + logmixweight - jnp.sum(logstd, axis=-1)
    if roi_boxes is None:
        loss = -jax.scipy.special.logsumexp(loss_comp, axis=mix_axis)
    else:
        from ...ops.inter_roi_ops import logsumexp_across_rois
        lse = jax.scipy.special.logsumexp(loss_comp, axis=mix_axis,
                                          keepdims=True)
        # (n, 1, h, w) -> NHWC for the roi op -> back
        lse_hwc = jnp.moveaxis(lse, 1, -1)
        lse_hwc = logsumexp_across_rois(lse_hwc, roi_boxes, roi_img_ids)
        loss = -jnp.moveaxis(lse_hwc, -1, 1)[:, 0]

    new_mean_inv_std = mean_inv_std
    if adaptive_weight:
        if training:
            inv_std = jax.lax.stop_gradient(inverse_std)
            mixweight = jnp.exp(jax.lax.stop_gradient(logmixweight))[..., None]
            num = jnp.sum(inv_std * mixweight)
            den = jnp.sum(mixweight) * 2.0
            if axis_name is not None:
                num = jax.lax.pmean(num, axis_name)
                den = jax.lax.pmean(den, axis_name)
            batch_mean_inv_std = num / jnp.maximum(den, eps)
            new_mean_inv_std = mean_inv_std * (1.0 - momentum) \
                + momentum * batch_mean_inv_std
        loss = loss / jnp.maximum(new_mean_inv_std, eps)
    return weight_reduce_loss(loss, weight, reduction, avg_factor), \
        new_mean_inv_std
