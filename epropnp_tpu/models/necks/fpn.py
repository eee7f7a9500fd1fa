"""Feature Pyramid Network neck (flax, NHWC).

mmdet-FPN semantics as used by the Det configs
(configs/epropnp_det_basic.py: in_channels [256, 512, 1024, 2048],
out 256, num_outs 6, ``add_extra_convs='on_output'``, p2-p7 with
``start_level 0``): lateral 1x1 convs, nearest top-down upsampling,
3x3 output convs, extra levels from stride-2 convs on the last output.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest(x, factor=2):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), 'nearest')


class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 6
    start_level: int = 0
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]
                 ) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == len(self.in_channels)
        used = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_{i}')(x)
            for i, x in enumerate(used)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(laterals[i])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f'fpn_conv_{i}')(lat)
            for i, lat in enumerate(laterals)]
        # extra levels on top of the last output (stride-2 convs)
        extra_src = outs[-1]
        for i in range(self.num_outs - len(outs)):
            if i > 0 and self.relu_before_extra_convs:
                extra_src = nn.relu(extra_src)
            extra_src = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                                dtype=self.dtype,
                                name=f'extra_conv_{i}')(extra_src)
            outs.append(extra_src)
        return tuple(outs)
