"""Sine positional encodings (pure functions).

Covers mmdet's ``SinePositionalEncoding`` dense-map variant and the
reference's continuous-point extension ``points_to_enc``
(EPro-PnP-Det/epropnp_det/models/utils/positional_encoding.py:12-50).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def points_to_enc(points: jnp.ndarray, img_sizes: jnp.ndarray,
                  num_feats: int = 128, temperature: float = 10000.0,
                  normalize: bool = True,
                  scale: float = 2.0 * math.pi) -> jnp.ndarray:
    """Encode continuous 2D points.

    Args:
        points: (*, 2) in [x, y] image pixels.
        img_sizes: (*, 2) in [h, w] (broadcastable to points).

    Returns: (*, num_feats * 2) embedding, [y-enc | x-enc] order.
    """
    if normalize:
        points = points / img_sizes[..., ::-1] * scale
    dim_t = jnp.arange(num_feats, dtype=points.dtype)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    pos = points[..., None] / dim_t  # (*, 2, num_feats)
    pos = jnp.stack(
        [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
    ).reshape(points.shape[:-1] + (2, num_feats))
    # concat (y, x)
    return jnp.concatenate([pos[..., 1, :], pos[..., 0, :]], axis=-1)


def dense_posenc(h: int, w: int, img_h: float, img_w: float,
                 num_feats: int = 128, temperature: float = 10000.0,
                 stride: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """Dense (h, w, num_feats*2) encoding of feature-map pixel centers."""
    ys = (jnp.arange(h, dtype=dtype) + 0.5) * stride
    xs = (jnp.arange(w, dtype=dtype) + 0.5) * stride
    yy, xx = jnp.meshgrid(ys, xs, indexing='ij')
    pts = jnp.stack([xx, yy], axis=-1)
    sizes = jnp.asarray([img_h, img_w], dtype)
    return points_to_enc(pts, jnp.broadcast_to(sizes, pts.shape),
                         num_feats=num_feats, temperature=temperature)
