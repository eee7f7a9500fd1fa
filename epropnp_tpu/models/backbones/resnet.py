"""ResNet backbone family (flax.linen, NHWC, TPU-first).

Covers the reference's torchvision-style backbone usage: the 6DoF suite's
``ResNetBackboneNet`` (stem + 4 stages, no fc — reference
``EPro-PnP-6DoF/lib/models/resnet_backbone.py:10-69``) and the Det suite's
multi-scale feature extraction feeding an FPN (reference uses mmdet's
ResNet-101; ``configs/epropnp_det_basic.py``).

TPU-first design: NHWC layout (XLA's native conv layout on TPU), a single
``train`` switch for BatchNorm running statistics, optional bfloat16 compute
with float32 BatchNorm statistics, and ``out_indices`` to return any subset
of stage features with one trace.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# depth -> (block, stage_sizes, stage_channels(last = feat dim))
resnet_spec = {
    18: ('basic', (2, 2, 2, 2), (64, 128, 256, 512)),
    34: ('basic', (3, 4, 6, 3), (64, 128, 256, 512)),
    50: ('bottleneck', (3, 4, 6, 3), (64, 128, 256, 512)),
    101: ('bottleneck', (3, 4, 23, 3), (64, 128, 256, 512)),
    152: ('bottleneck', (3, 8, 36, 3), (64, 128, 256, 512)),
}


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output channels = 4 * filters
    strides: int = 1
    use_dcn: bool = False  # deformable 3x3 (reference R101-DCN stages 3-4)
    # sigmoid-mask multiplier of the DCN: 2.0 = identity-like zero init
    # (from-scratch default), 1.0 = mmcv DCNv2 exactly (converted ckpts)
    dcn_modulation_scale: float = 2.0
    dcn_int8_gather: bool = False  # serving-only quantized gather table
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        if self.use_dcn:
            # incl. the stride-2 first block: the reference configs keep
            # DCN on the strided conv2 (fallback_on_stride=False,
            # configs/epropnp_det_basic.py:16)
            from ...ops.deform_conv import DeformConv
            y = DeformConv(self.filters, strides=self.strides,
                           modulation_scale=self.dcn_modulation_scale,
                           int8_gather=self.dcn_int8_gather,
                           dtype=self.dtype)(y)
        else:
            y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                        padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet without the classification head.

    Args:
        depth: 18/34/50/101/152.
        out_indices: which stage outputs (1-based: stage 1 is stride 4,
            stage 4 is stride 32) to return. ``(4,)`` reproduces the 6DoF
            backbone (final (N, H/32, W/32, C) feature); ``(1, 2, 3, 4)``
            feeds an FPN.

    Input is NHWC. Returns a tuple of feature maps (even for one output).
    """

    depth: int = 34
    out_indices: Sequence[int] = (4,)
    dcn_stages: Sequence[int] = ()  # 1-based stages using deformable conv
    dcn_modulation_scale: float = 2.0  # 1.0 for converted mmcv checkpoints
    dcn_int8_gather: bool = False  # serving-only quantized gather table
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        block_name, stage_sizes, stage_channels = resnet_spec[self.depth]
        block = BasicBlock if block_name == 'basic' else Bottleneck

        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for stage, (n_blocks, channels) in enumerate(
                zip(stage_sizes, stage_channels), start=1):
            strides = 1 if stage == 1 else 2
            for i in range(n_blocks):
                kwargs = {}
                if block is Bottleneck and stage in self.dcn_stages:
                    kwargs['use_dcn'] = True
                    kwargs['dcn_modulation_scale'] = \
                        self.dcn_modulation_scale
                    kwargs['dcn_int8_gather'] = self.dcn_int8_gather
                x = block(channels, strides if i == 0 else 1,
                          dtype=self.dtype,
                          name=f'layer{stage}_block{i}', **kwargs)(x,
                                                                  train=train)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)

    @property
    def feat_channels(self):
        block_name, _, stage_channels = resnet_spec[self.depth]
        mult = 1 if block_name == 'basic' else 4
        return tuple(c * mult for c in stage_channels)
