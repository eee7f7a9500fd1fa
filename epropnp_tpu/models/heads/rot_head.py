"""Rotation (dense correspondence) head of the CDPN model.

Upsamples the backbone feature 8x (three transpose-conv stages, each followed
by two 3x3 convs) and emits a 5-channel map: 3 normalized object coordinates
(noc) + 2 correspondence weights (w2d), plus a global 2-vector weight scale
from a pooled linear branch.

Reference: EPro-PnP-6DoF/lib/models/resnet_rot_head.py:11-78 (NHWC here;
``ConvTranspose(k3, s2, 'SAME')`` doubles the spatial dims exactly like the
reference's ``ConvTranspose2d(k3, s2, p1, output_padding=1)``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RotHead(nn.Module):
    num_layers: int = 3
    num_filters: int = 256
    output_dim: int = 5  # 3 noc + 2 w2d
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype)
        for _ in range(self.num_layers):
            # padding (1, 2) on the dilated input == torch
            # ConvTranspose2d(k3, s2, padding=1, output_padding=1): same
            # 2x upsample as 'SAME' but reference-exact tap alignment, so
            # converted torch weights reproduce features bit-for-bit
            x = nn.ConvTranspose(self.num_filters, (3, 3), (2, 2),
                                 padding=((1, 2), (1, 2)), use_bias=False,
                                 dtype=self.dtype)(x)
            x = nn.relu(norm()(x))
            for _ in range(2):
                x = nn.Conv(self.num_filters, (3, 3), padding=1,
                            use_bias=False, dtype=self.dtype)(x)
                x = nn.relu(norm()(x))
        out = nn.Conv(self.output_dim, (1, 1), use_bias=True,
                      dtype=self.dtype, name='out_layer')(x)
        noc, w2d = out[..., :3], out[..., 3:]
        pooled = jnp.mean(x, axis=(1, 2))
        scale = jnp.exp(nn.Dense(2, dtype=self.dtype,
                                 name='scale_branch')(pooled))
        return noc, w2d, scale
