"""Grouped linear layer (per-attention-head regression).

Reference: EPro-PnP-Det/epropnp_det/ops/group_linear.py:29-42. Expressed as
one einsum so XLA maps it onto a single batched matmul.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class GroupLinear(nn.Module):
    in_features: int
    out_features: int
    groups: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.groups
        din = self.in_features // g
        dout = self.out_features // g
        w = self.param(
            'weight',
            nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform'),
            (g, dout, din), self.dtype)
        batch = x.shape[:-1]
        xg = x.reshape(batch + (g, din))
        out = jnp.einsum('...gi,goi->...go', xg, w)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (g, dout),
                           self.dtype)
            out = out + b
        return out.reshape(batch + (self.out_features,))
