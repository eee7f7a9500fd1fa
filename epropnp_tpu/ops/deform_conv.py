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
    """3x3 modulated deformable conv (DCNv2), NHWC.

    ``strides`` > 1 samples at the strided output grid (the reference
    backbone's stage-3/4 FIRST blocks are stride-2 DCNv2: the configs set
    ``fallback_on_stride=False``, configs/epropnp_det_basic.py:16, so
    mmdet keeps DCN on the strided conv2). Padding follows torch
    ``padding=1`` semantics: output (i, j) is centered at input
    (i * stride, j * stride).

    ``fused`` selects the TPU Pallas contraction kernel
    (ops/pallas_dcn.py): the bilinear corner combine + tap matmul run in
    VMEM on the gathered patch rows, avoiding the HBM relayouts XLA
    inserts around the jnp formulation (~3x the gather cost at serving
    shapes). ``None`` = auto (fused on any non-CPU backend; the pure-jnp
    path on CPU, where the kernel would need interpret mode). Gradients
    always flow through the jnp reference formulation (custom_vjp), so
    training numerics are identical either way.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_modulation: bool = True
    # modulation = sigmoid(mask) * modulation_scale. 2.0 (default) makes
    # the zero-init identity-like (mod=1) for from-scratch training;
    # 1.0 reproduces mmcv ModulatedDeformConv2dPack exactly — required
    # when ingesting converted mmdet checkpoints (utils/torch_convert).
    modulation_scale: float = 2.0
    dtype: Any = jnp.float32
    fused: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c_in = x.shape
        k = self.kernel_size
        s = self.strides
        taps = k * k
        half = (k - 1) // 2
        # torch padding=1 geometry: out (i, j) centered at input (si, sj)
        ho = (h + 2 * half - k) // s + 1
        wo = (w + 2 * half - k) // s + 1

        off_ch = taps * (3 if self.use_modulation else 2)
        offset_mask = nn.Conv(
            off_ch, (k, k), (s, s), padding=half, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name='conv_offset')(x)
        offsets = offset_mask[..., :taps * 2].reshape(n, ho, wo, taps, 2)
        if self.use_modulation:
            mod = jax.nn.sigmoid(offset_mask[..., taps * 2:]) \
                * self.modulation_scale
        else:
            mod = jnp.ones((n, ho, wo, taps), self.dtype)

        base = jnp.stack(jnp.meshgrid(
            jnp.arange(-half, half + 1, dtype=self.dtype),
            jnp.arange(-half, half + 1, dtype=self.dtype),
            indexing='ij'), axis=-1)[..., ::-1].reshape(taps, 2)  # [x, y]
        ys = jnp.arange(ho, dtype=self.dtype) * s
        xs = jnp.arange(wo, dtype=self.dtype) * s
        yy, xx = jnp.meshgrid(ys, xs, indexing='ij')
        grid = jnp.stack([xx, yy], axis=-1)  # (ho, wo, 2) in [x, y]
        coords = grid[None, :, :, None, :] + base + offsets

        kernel = self.param(
            'kernel', nn.initializers.he_normal(),
            (taps * c_in, self.features), self.dtype)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          self.dtype)

        use_fused = self.fused
        if use_fused is None:
            use_fused = jax.default_backend() != 'cpu'
        if use_fused:
            from .bilinear_sample import pack_patches, corner_rows_and_weights
            from .pallas_dcn import dcn_gather_contract, pack_patches_mxu
            kern3 = kernel.reshape(taps, c_in, self.features)
            pack = (pack_patches_mxu if x.dtype.itemsize <= 2
                    else pack_patches)

            packed = jax.vmap(pack)(x)          # (n, (h+2)(w+2)... , 4c)
            rows_per_img = packed.shape[1] * packed.shape[2]
            rows, w4 = corner_rows_and_weights(coords, (h, w), 'zeros')
            w4 = w4 * mod[..., None]  # fold modulation into the weights
            # fold the image index into the rows and keep the gather 1-D:
            # a vmapped gather lowers to XLA's 2-index path (~7x slower)
            rows = rows + (jnp.arange(n, dtype=rows.dtype)
                           * rows_per_img)[:, None, None, None]
            # tap-major so each tap's rows form one contiguous block
            rows = rows.reshape(n * ho * wo, taps).T
            w4 = w4.reshape(n * ho * wo, taps, 4).swapaxes(0, 1)
            out = dcn_gather_contract(packed.reshape(-1, 4 * c_in),
                                      rows, w4, kern3)
            return out.reshape(n, ho, wo, self.features) + bias

        sampled = jax.vmap(
            lambda feat, crd: bilinear_sample_packed(feat, crd, 'zeros')
        )(x, coords)  # (n, ho, wo, taps, c_in)
        sampled = sampled * mod[..., None]
        out = sampled.reshape(n, ho, wo, taps * c_in) @ kernel
        return out + bias
