"""Deformable attention sampler (flax) for correspondence gathering.

Per object: predict ``num_heads x num_points`` 2D offsets from the object
embedding, bilinearly sample key/value/x2d/mask maps at
``center + offset * stride``, attend ``softmax(q.k / sqrt(d)) * mask``, and
produce an updated object embedding via out-proj + LayerNorm + FFN residual.

Reference: EPro-PnP-Det/epropnp_det/ops/deformable_attention_sampler.py:
16-142. TPU-first deviations: NHWC maps, the 5-D grid_sample image-index
trick becomes explicit per-object map indexing (batched_bilinear_sample),
dropout omitted at sampling (mmcv FFN's drop handled by ``deterministic``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .bilinear_sample import batched_bilinear_sample


class SamplerOutputs(NamedTuple):
    output: jnp.ndarray        # (num_obj, embed_dims)
    v_samples: jnp.ndarray     # (num_obj, heads, head_dim, num_points)
    a_samples: jnp.ndarray     # (num_obj, heads, 1, num_points)
    mask_samples: jnp.ndarray  # (num_obj, heads, 1, num_points)
    x2d_samples: jnp.ndarray   # (num_obj, heads, 2, num_points)


class DeformableAttentionSampler(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 32
    stride: int = 4
    ffn_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, obj_emb, key, value, img_dense_x2d,
                 img_dense_x2d_mask, obj_xy_point, strides, obj_img_ind,
                 deterministic: bool = True) -> SamplerOutputs:
        """
        Args:
            query: (num_obj, heads, 1, head_dim).
            obj_emb: (num_obj, embed_dims).
            key/value: (num_img, h, w, embed_dims) NHWC.
            img_dense_x2d: (num_img, h, w, 2); mask: (num_img, h, w, 1).
            obj_xy_point: (num_obj, 2) centers in image pixels.
            strides: (num_obj,) per-object offset scale.
            obj_img_ind: (num_obj,) int.
        """
        num_obj = query.shape[0]
        head_dim = self.embed_dims // self.num_heads
        hp = self.num_heads * self.num_points

        offsets = nn.Dense(
            hp * 2, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.5 ** 2 / 3.0, 'fan_avg', 'uniform'),
            name='sampling_offsets')(obj_emb).reshape(
                num_obj, self.num_heads, self.num_points, 2)
        # image-pixel sampling locations -> feature-pixel coordinates
        loc = obj_xy_point[:, None, None] \
            + offsets * strides[:, None, None, None]
        feat_xy = loc / self.stride - 0.5  # align_corners=False convention

        # Head h samples only its own channel slice [h*d:(h+1)*d] at its own
        # locations (the reference's per-head grid batching); static Python
        # loop over the 8 heads keeps each gather at head_dim channels.
        k_heads, v_heads = [], []
        for h in range(self.num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            k_heads.append(batched_bilinear_sample(
                key[..., sl], obj_img_ind, feat_xy[:, h], 'border'))
            v_heads.append(batched_bilinear_sample(
                value[..., sl], obj_img_ind, feat_xy[:, h], 'border'))
        # (num_obj, heads, head_dim, pts)
        k_samples = jnp.stack(k_heads, axis=1).transpose(0, 1, 3, 2)
        v_samples = jnp.stack(v_heads, axis=1).transpose(0, 1, 3, 2)
        x2d_s = batched_bilinear_sample(
            img_dense_x2d, obj_img_ind, feat_xy, 'border')
        m_s = batched_bilinear_sample(
            img_dense_x2d_mask, obj_img_ind, feat_xy, 'zeros')
        x2d_samples = jnp.transpose(x2d_s, (0, 1, 3, 2))
        mask_samples = jnp.transpose(m_s, (0, 1, 3, 2))

        a_samples = query @ k_samples / np.sqrt(head_dim)
        a_soft = nn.softmax(a_samples, axis=-1) * mask_samples
        out = (v_samples @ jnp.swapaxes(a_soft, -1, -2)).reshape(
            num_obj, self.embed_dims)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name='out_proj')(out) + obj_emb
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name='norm1')(out)
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name='ffn1')(out)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.embed_dims, dtype=self.dtype, name='ffn2')(ffn)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name='norm2')(out + ffn)
        return SamplerOutputs(out, v_samples, a_samples, mask_samples,
                              x2d_samples)
