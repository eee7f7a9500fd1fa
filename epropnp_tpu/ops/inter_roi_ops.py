"""Cross-RoI logsumexp/softmax for overlapping regions of interest.

Normalizes per-RoI attention maps across *all* RoIs of the same image that
overlap spatially: every other RoI's map is resampled into the current
RoI's frame and combined with logsumexp, so mixture weights compete across
objects (used by the dense reprojection loss's cross-RoI attention).

Reference: EPro-PnP-Det/epropnp_det/ops/inter_roi_ops.py:19-107. The
reference loops over data-dependent overlap sets with per-pair
``affine_grid``/``grid_sample``; TPU-first this becomes one fixed-shape
all-pairs bilinear resample with validity masks — no host control flow,
identical results (non-overlapping pairs contribute -inf everywhere).

RoI layout here: NHWC maps ``(bn, rh, rw, chn)`` + boxes ``(bn, 4)``
[x1, y1, x2, y2] + image ids ``(bn,)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bilinear_sample import bilinear_sample


def logsumexp_across_rois(roi_inputs: jnp.ndarray, roi_boxes: jnp.ndarray,
                          roi_img_ids: jnp.ndarray) -> jnp.ndarray:
    """(bn, rh, rw, chn) -> (bn, rh, rw, chn)."""
    bn, rh, rw, chn = roi_inputs.shape
    if bn == 0:
        return roi_inputs
    wh = roi_boxes[:, 2:] - roi_boxes[:, :2]  # (bn, 2)

    # Pixel-center image coordinates of each RoI's grid: (bn, rh, rw, 2)
    gy = (jnp.arange(rh, dtype=roi_inputs.dtype) + 0.5) / rh
    gx = (jnp.arange(rw, dtype=roi_inputs.dtype) + 0.5) / rw
    yy, xx = jnp.meshgrid(gy, gx, indexing='ij')
    unit = jnp.stack([xx, yy], axis=-1)  # (rh, rw, 2) in [0, 1]
    img_xy = roi_boxes[:, None, None, :2] + unit * wh[:, None, None, :]

    def contributions(i):
        """logsumexp over all other same-image RoIs resampled into frame i."""
        xy = img_xy[i]  # (rh, rw, 2)

        def from_j(j):
            # feature coords of xy inside roi j (align_corners=False)
            rel = (xy - roi_boxes[j, :2]) / wh[j]
            coords = rel * jnp.asarray([rw, rh], roi_inputs.dtype) - 0.5
            vals = bilinear_sample(roi_inputs[j], coords, 'border')
            inside = jnp.all((rel > 0.0) & (rel < 1.0), axis=-1)
            valid = inside & (roi_img_ids[i] == roi_img_ids[j]) & (i != j)
            return jnp.where(valid[..., None], vals, -jnp.inf)

        others = jax.vmap(from_j)(jnp.arange(bn))  # (bn, rh, rw, chn)
        stacked = jnp.concatenate([others, roi_inputs[i][None]], axis=0)
        return jax.scipy.special.logsumexp(stacked, axis=0)

    return jax.vmap(contributions)(jnp.arange(bn))


def logsoftmax_across_rois(roi_inputs, roi_boxes, roi_img_ids,
                           extra_axis=None):
    lse = logsumexp_across_rois(roi_inputs, roi_boxes, roi_img_ids)
    if extra_axis is not None:
        lse = jax.scipy.special.logsumexp(lse, axis=extra_axis,
                                          keepdims=True)
    return roi_inputs - lse


def softmax_across_rois(roi_inputs, roi_boxes, roi_img_ids, extra_axis=None):
    return jnp.exp(
        logsoftmax_across_rois(roi_inputs, roi_boxes, roi_img_ids,
                               extra_axis))
