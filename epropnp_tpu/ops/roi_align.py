"""RoI Align on NHWC maps (aligned=True, average pooling).

TPU-friendly replacement for mmcv's ``roi_align`` used by the dense
auxiliary losses (deform_pnp_head.py:719-741): each output bin averages a
fixed 2x2 grid of bilinear samples (the reference's adaptive
``sampling_ratio=0`` rounds the grid per-RoI — a dynamic shape; a fixed
grid is the standard static approximation).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bilinear_sample import batched_bilinear_sample


def roi_align(feats: jnp.ndarray, roi_img_inds: jnp.ndarray,
              roi_boxes: jnp.ndarray, output_size, spatial_scale: float = 1.0,
              samples_per_bin: int = 2) -> jnp.ndarray:
    """
    Args:
        feats: (num_img, h, w, c).
        roi_img_inds: (n,) int.
        roi_boxes: (n, 4) [x1, y1, x2, y2] in input coordinates.
        output_size: (rh, rw).

    Returns: (n, rh, rw, c).
    """
    rh, rw = output_size
    s = samples_per_bin
    boxes = roi_boxes * spatial_scale
    x1, y1 = boxes[:, 0], boxes[:, 1]
    bw = (boxes[:, 2] - boxes[:, 0]) / rw
    bh = (boxes[:, 3] - boxes[:, 1]) / rh

    # sample offsets within each bin: (rw*s,) fractional positions
    jx = (jnp.arange(rw * s) + 0.5) / s  # in bin units along x
    jy = (jnp.arange(rh * s) + 0.5) / s
    # (n, rh*s), (n, rw*s) pixel coords; aligned=True -> -0.5
    xs = x1[:, None] + jx[None, :] * bw[:, None] - 0.5
    ys = y1[:, None] + jy[None, :] * bh[:, None] - 0.5
    coords = jnp.stack(
        [jnp.broadcast_to(xs[:, None, :], xs.shape[:1] + (rh * s, rw * s)),
         jnp.broadcast_to(ys[:, :, None], ys.shape[:1] + (rh * s, rw * s))],
        axis=-1)
    sampled = batched_bilinear_sample(feats, roi_img_inds, coords, 'border')
    n, _, _, c = sampled.shape
    sampled = sampled.reshape(n, rh, s, rw, s, c)
    return jnp.mean(sampled, axis=(2, 4))
