"""Bilinear sampling of NHWC feature maps at continuous locations.

The TPU-native replacement for ``F.grid_sample`` gathers: instead of the
reference's 5-D trilinear trick that folds the image index into a third
grid coordinate (deformable_attention_sampler.py:96-128), features are
gathered per (object -> image) index and sampled with explicit bilinear
weights. XLA lowers the four corner gathers to dynamic-gathers; all weight
math is fused elementwise.

Semantics match ``F.grid_sample(align_corners=False)``: a sampling location
given in *feature pixels* addresses pixel centers at integer+0.5, i.e. the
callers pass ``x_img / stride - 0.5``.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, coords: jnp.ndarray,
                    padding_mode: str = 'border') -> jnp.ndarray:
    """Sample ``feat`` (h, w, c) at ``coords`` (*, 2) in [x, y] pixel units.

    Returns (*, c). ``padding_mode``: 'border' clamps out-of-range
    coordinates; 'zeros' zeroes contributions from outside the map.
    """
    h, w = feat.shape[:2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = feat[yc, xc]
        if padding_mode == 'zeros':
            inside = ((xi >= 0) & (xi <= w - 1)
                      & (yi >= 0) & (yi <= h - 1))
            vals = jnp.where(inside[..., None], vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def batched_bilinear_sample(feats: jnp.ndarray, img_inds: jnp.ndarray,
                            coords: jnp.ndarray,
                            padding_mode: str = 'border') -> jnp.ndarray:
    """Sample per-object from a stack of maps.

    Args:
        feats: (num_img, h, w, c).
        img_inds: (num_obj,) int image index per object.
        coords: (num_obj, *, 2) in [x, y] feature pixels.

    Returns (num_obj, *, c).
    """
    h, w = feats.shape[1:3]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    extra_dims = coords.ndim - 2  # dims between num_obj and the coord axis
    b = img_inds.reshape((-1,) + (1,) * extra_dims)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = feats[b, yc, xc]
        if padding_mode == 'zeros':
            inside = ((xi >= 0) & (xi <= w - 1)
                      & (yi >= 0) & (yi <= h - 1))
            vals = jnp.where(inside[..., None], vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)
