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
    # Serving-only: gather from a per-channel int8 quantized patch table
    # (pallas_dcn.quantize_packed_table) — halves the gathered bytes of
    # the HBM-bound DCN sampling; dequant scale is folded into the conv
    # kernel. Requires the fused path; ignored (with the float table)
    # when ``fused`` resolves to False. NOT for training: the quantized
    # contraction is forward-only.
    int8_gather: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, layout=None) -> jnp.ndarray:
        if layout is not None:
            return self._call_packed(x, layout)
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
            packed_flat = packed.reshape(-1, 4 * c_in)
            if self.int8_gather:
                from .pallas_dcn import (
                    dcn_gather_contract_q, quantize_packed_table)
                q, kern_s = quantize_packed_table(packed_flat, kern3)
                out = dcn_gather_contract_q(q, rows, w4, kern_s)
            else:
                out = dcn_gather_contract(packed_flat, rows, w4, kern3)
            return out.reshape(n, ho, wo, self.features) + bias

        sampled = jax.vmap(
            lambda feat, crd: bilinear_sample_packed(feat, crd, 'zeros')
        )(x, coords)  # (n, ho, wo, taps, c_in)
        sampled = sampled * mod[..., None]
        out = sampled.reshape(n, ho, wo, taps * c_in) @ kernel
        return out + bias

    def _call_packed(self, x: jnp.ndarray, layout) -> jnp.ndarray:
        """Level-packed composite input (ops/level_pack.LevelLayout).

        ``x`` is a (n, H, W, c) canvas holding every pyramid level
        (gaps zeroed). The offset/modulation conv runs ONCE on the
        canvas (3x3, so zeroed gaps reproduce per-level 'same'
        padding); sampling is exact per level — each region samples its
        own patch table with level-local clamping, so learned offsets
        can never read a neighboring level — and all levels' positions
        contract in ONE kernel call. Parameters are identical to the
        per-level path (same names, same shapes).
        """
        if self.strides != 1:
            raise ValueError('level-packed DeformConv is stride-1 only')
        n, hc, wc, c_in = x.shape
        k = self.kernel_size
        taps = k * k
        half = (k - 1) // 2

        off_ch = taps * (3 if self.use_modulation else 2)
        offset_mask = nn.Conv(
            off_ch, (k, k), padding=half, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name='conv_offset')(x)
        kernel = self.param(
            'kernel', nn.initializers.he_normal(),
            (taps * c_in, self.features), self.dtype)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          self.dtype)

        base = jnp.stack(jnp.meshgrid(
            jnp.arange(-half, half + 1, dtype=self.dtype),
            jnp.arange(-half, half + 1, dtype=self.dtype),
            indexing='ij'), axis=-1)[..., ::-1].reshape(taps, 2)  # [x, y]

        use_fused = self.fused
        if use_fused is None:
            use_fused = jax.default_backend() != 'cpu'

        def level_coords_mod(h, w, y0, x0):
            om = offset_mask[:, y0:y0 + h, x0:x0 + w, :]
            offsets = om[..., :taps * 2].reshape(n, h, w, taps, 2)
            if self.use_modulation:
                mod = jax.nn.sigmoid(om[..., taps * 2:]) \
                    * self.modulation_scale
            else:
                mod = jnp.ones((n, h, w, taps), self.dtype)
            yy, xx = jnp.meshgrid(jnp.arange(h, dtype=self.dtype),
                                  jnp.arange(w, dtype=self.dtype),
                                  indexing='ij')
            grid = jnp.stack([xx, yy], axis=-1)  # level-local [x, y]
            coords = grid[None, :, :, None, :] + base + offsets
            return coords, mod

        if not use_fused:
            out = jnp.zeros((n, hc, wc, self.features), self.dtype)
            for (h, w), (y0, x0) in zip(layout.shapes, layout.origins):
                coords, mod = level_coords_mod(h, w, y0, x0)
                sampled = jax.vmap(
                    lambda feat, crd: bilinear_sample_packed(
                        feat, crd, 'zeros')
                )(x[:, y0:y0 + h, x0:x0 + w, :], coords)
                sampled = sampled * mod[..., None]
                lvl = sampled.reshape(n, h, w, taps * c_in) @ kernel + bias
                out = out.at[:, y0:y0 + h, x0:x0 + w, :].set(lvl)
            return out

        from .bilinear_sample import pack_patches, corner_rows_and_weights
        from .pallas_dcn import dcn_gather_contract, pack_patches_mxu
        pack = pack_patches_mxu if x.dtype.itemsize <= 2 else pack_patches
        kern3 = kernel.reshape(taps, c_in, self.features)

        tables, rows_all, w4_all, counts = [], [], [], []
        table_rows = 0
        for (h, w), (y0, x0) in zip(layout.shapes, layout.origins):
            lvl_x = x[:, y0:y0 + h, x0:x0 + w, :]
            packed = jax.vmap(pack)(lvl_x)          # (n, h+2, w+2, 4c)
            rpi = packed.shape[1] * packed.shape[2]
            coords, mod = level_coords_mod(h, w, y0, x0)
            rows, w4 = corner_rows_and_weights(coords, (h, w), 'zeros')
            w4 = w4 * mod[..., None]
            rows = rows + table_rows + (
                jnp.arange(n, dtype=rows.dtype) * rpi)[:, None, None, None]
            tables.append(packed.reshape(-1, 4 * c_in))
            rows_all.append(rows.reshape(n * h * w, taps).T)
            w4_all.append(w4.reshape(n * h * w, taps, 4).swapaxes(0, 1))
            counts.append(n * h * w)
            table_rows += n * rpi

        table_cat = jnp.concatenate(tables, axis=0)
        rows_cat = jnp.concatenate(rows_all, axis=1)
        w4_cat = jnp.concatenate(w4_all, axis=1)
        if self.int8_gather:
            from .pallas_dcn import (
                dcn_gather_contract_q, quantize_packed_table)
            q, kern_s = quantize_packed_table(table_cat, kern3)
            out_flat = dcn_gather_contract_q(q, rows_cat, w4_cat, kern_s)
        else:
            out_flat = dcn_gather_contract(table_cat, rows_cat, w4_cat,
                                           kern3)
        out = jnp.zeros((n, hc, wc, self.features), out_flat.dtype)
        start = 0
        for (h, w), (y0, x0), cnt in zip(layout.shapes, layout.origins,
                                         counts):
            lvl = out_flat[start:start + cnt].reshape(n, h, w,
                                                      self.features)
            out = out.at[:, y0:y0 + h, x0:x0 + w, :].set(lvl + bias)
            start += cnt
        return out.astype(self.dtype)
