"""Per-point transformer layer for correspondence refinement.

The reference stacks mmcv ``BaseTransformerLayer`` blocks with a 32-dim
single-head self-attention over the sampled points of one object,
positional encodings added to query/key (deform_pnp_head.py:101-116 config,
forward_correspondence :379-425). flax reimplementation with the same
operation order: self_attn -> norm -> ffn -> norm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class PtsTransformerLayer(nn.Module):
    embed_dims: int = 32
    num_heads: int = 1
    ffn_dims: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        """x: (num_obj, num_pts, embed); pos: same shape positional enc."""
        d = self.embed_dims // self.num_heads
        q = nn.Dense(self.embed_dims, dtype=self.dtype, name='q_proj')(x + pos)
        k = nn.Dense(self.embed_dims, dtype=self.dtype, name='k_proj')(x + pos)
        v = nn.Dense(self.embed_dims, dtype=self.dtype, name='v_proj')(x)

        def split(t):
            n, p, _ = t.shape
            return t.reshape(n, p, self.num_heads, d).transpose(0, 2, 1, 3)

        attn = split(q) @ jnp.swapaxes(split(k), -1, -2) / np.sqrt(d)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ split(v)).transpose(0, 2, 1, 3).reshape(x.shape)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name='out_proj')(out)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name='norm1')(x + out)
        ffn = nn.Dense(self.ffn_dims, dtype=self.dtype, name='ffn1')(x)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.embed_dims, dtype=self.dtype, name='ffn2')(ffn)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name='norm2')(x + ffn)
