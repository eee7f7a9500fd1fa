"""Deformable convolution v2 (flax) via bilinear gathers.

The reference relies on mmcv's CUDA DCNv2 (backbone stages + head towers,
``dcn_on_last_conv`` in configs). TPU-native formulation: a standard conv
predicts per-tap offsets (and modulation masks); the input is bilinearly
sampled at ``grid + base_tap + offset`` for each of the k*k taps; the
sampled stack contracts with the kernel as one matmul (MXU-friendly:
the gather is the only irregular part, the FLOPs land in a dense
(H*W, k*k*Cin) x (k*k*Cin, Cout) product).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bilinear_sample import bilinear_sample_packed


class DeformConv(nn.Module):
    """3x3 modulated deformable conv (DCNv2), stride 1, NHWC."""

    features: int
    kernel_size: int = 3
    use_modulation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c_in = x.shape
        k = self.kernel_size
        taps = k * k

        off_ch = taps * (3 if self.use_modulation else 2)
        offset_mask = nn.Conv(
            off_ch, (k, k), padding='SAME', dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name='conv_offset')(x)
        offsets = offset_mask[..., :taps * 2].reshape(n, h, w, taps, 2)
        if self.use_modulation:
            mod = jax.nn.sigmoid(offset_mask[..., taps * 2:]) * 2.0
        else:
            mod = jnp.ones((n, h, w, taps), self.dtype)

        half = (k - 1) // 2
        base = jnp.stack(jnp.meshgrid(
            jnp.arange(-half, half + 1, dtype=self.dtype),
            jnp.arange(-half, half + 1, dtype=self.dtype),
            indexing='ij'), axis=-1)[..., ::-1].reshape(taps, 2)  # [x, y]
        ys = jnp.arange(h, dtype=self.dtype)
        xs = jnp.arange(w, dtype=self.dtype)
        yy, xx = jnp.meshgrid(ys, xs, indexing='ij')
        grid = jnp.stack([xx, yy], axis=-1)  # (h, w, 2) in [x, y]
        coords = grid[None, :, :, None, :] + base + offsets  # (n,h,w,taps,2)

        sampled = jax.vmap(
            lambda feat, crd: bilinear_sample_packed(feat, crd, 'zeros')
        )(x, coords)  # (n, h, w, taps, c_in)
        sampled = sampled * mod[..., None]

        kernel = self.param(
            'kernel', nn.initializers.he_normal(),
            (taps * c_in, self.features), self.dtype)
        out = sampled.reshape(n, h, w, taps * c_in) @ kernel
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          self.dtype)
        return out + bias
