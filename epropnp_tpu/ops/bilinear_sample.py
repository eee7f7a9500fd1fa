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

import jax
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


def pack_patches(feat: jnp.ndarray) -> jnp.ndarray:
    """Precompute 2x2 patch rows for ``bilinear_sample_packed``.

    Returns (h+2, w+2, 4c) where row (yi, xi) holds
    ``[F[yi-1, xi-1], F[yi-1, xi], F[yi, xi-1], F[yi, xi]]`` (zero padded
    one pixel above/left and two below/right) — i.e. patch base ``yi``
    addresses integer corner ``y0 = yi - 1``.
    """
    h, w, c = feat.shape
    # tables stay in the feature dtype: isolated benchmarks say bf16
    # gathers run at half the f32 byte rate, but upcasting the table to
    # f32 (and a bf16->f32 bitcast view, which forces a physical
    # retiling from (16,128) bf16 tiles to (8,128) f32) both measured
    # neutral-to-slower end-to-end — XLA overlaps gather latency with
    # adjacent compute in the full graph.
    fp = jnp.pad(feat, ((1, 2), (1, 2), (0, 0)))
    return jnp.concatenate(
        [fp[:-1, :-1], fp[:-1, 1:], fp[1:, :-1], fp[1:, 1:]], axis=-1)


def bilinear_sample_packed(feat: jnp.ndarray, coords: jnp.ndarray,
                           padding_mode: str = 'border') -> jnp.ndarray:
    """Semantically identical to :func:`bilinear_sample`, restructured for
    TPU gather throughput: ONE wide row (the 2x2 corner patch, 4c) is
    gathered per sampling location instead of four c-rows, and corner
    validity is folded into the four bilinear weights. XLA's gather
    throughput is bound by an implementation ceiling (~115 GB/s for >=1KB
    rows, ~half that for the 4-corner advanced-indexing form), so halving
    the passes over the sampled bytes roughly doubles DCN sampling speed
    (tools/bench_gather.py).

    Callers that sample the same map many times should hoist
    ``pack_patches(feat)`` and use :func:`bilinear_sample_prepacked`.
    """
    return bilinear_sample_prepacked(pack_patches(feat), feat.shape[:2],
                                     coords, padding_mode,
                                     out_dtype=feat.dtype)


def corner_rows_and_weights(coords: jnp.ndarray, feat_hw,
                            padding_mode: str = 'border'):
    """Row indices into a ``pack_patches`` table + the 4 corner weights.

    Returns ``(flat_rows, w4)`` with ``flat_rows`` int32 of shape
    ``coords.shape[:-1]`` (index into ``packed.reshape(-1, 4c)``) and
    ``w4`` of shape ``coords.shape[:-1] + (4,)`` holding the bilinear
    corner weights ``[w00, w01, w10, w11]`` with out-of-map validity
    folded in for ``padding_mode='zeros'``. Shared by the jnp sampler
    and the fused deformable-conv kernel (ops/pallas_dcn.py).
    """
    h, w = feat_hw
    x, y = coords[..., 0], coords[..., 1]
    if padding_mode == 'border':
        x = jnp.clip(x, 0, w - 1)
        y = jnp.clip(y, 0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    if padding_mode == 'zeros':
        # fold corner validity into the weights; the patch row content at
        # the clamped base is then irrelevant wherever the weight is zero
        x_in0 = (x0 >= 0) & (x0 <= w - 1)
        x_in1 = (x0 >= -1) & (x0 <= w - 2)
        y_in0 = (y0 >= 0) & (y0 <= h - 1)
        y_in1 = (y0 >= -1) & (y0 <= h - 2)
        w00 = jnp.where(y_in0 & x_in0, w00, 0)
        w01 = jnp.where(y_in0 & x_in1, w01, 0)
        w10 = jnp.where(y_in1 & x_in0, w10, 0)
        w11 = jnp.where(y_in1 & x_in1, w11, 0)
    yb = jnp.clip(y0, -1, h).astype(jnp.int32) + 1
    xb = jnp.clip(x0, -1, w).astype(jnp.int32) + 1
    flat = yb * (w + 2) + xb
    w4 = jnp.stack([w00, w01, w10, w11], axis=-1)
    return flat, w4


def bilinear_sample_prepacked(packed: jnp.ndarray, feat_hw,
                              coords: jnp.ndarray,
                              padding_mode: str = 'border',
                              out_dtype=None) -> jnp.ndarray:
    """Sample from ``pack_patches`` output. See bilinear_sample_packed."""
    c4 = packed.shape[-1]
    c = c4 // 4
    flat, w4 = corner_rows_and_weights(coords, feat_hw, padding_mode)
    rows = packed.reshape(-1, c4)[flat.reshape(-1)]
    rows = rows.reshape(coords.shape[:-1] + (4, c))
    wts = w4.astype(rows.dtype)
    out = jnp.einsum('...kc,...k->...c', rows, wts)
    return out if out_dtype is None else out.astype(out_dtype)


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
