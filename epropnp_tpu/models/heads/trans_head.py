"""Direct translation regression head of the CDPN model.

Three 3x3 conv+BN+ReLU stages on the backbone feature followed by an MLP
(flattened 8x8x256 -> 4096 -> 4096 -> 3).

Reference: EPro-PnP-6DoF/lib/models/resnet_trans_head.py:10-67.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class TransHead(nn.Module):
    num_layers: int = 3
    num_filters: int = 256
    output_dim: int = 3
    hidden_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype)
        for _ in range(self.num_layers):
            x = nn.Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.relu(norm()(x))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        return nn.Dense(self.output_dim, dtype=self.dtype)(x)
