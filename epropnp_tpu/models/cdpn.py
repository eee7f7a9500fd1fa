"""CDPN: the 6DoF dense-correspondence pose model (backbone + two heads).

``backbone(img[bs, 256, 256, 3]) -> feat[bs, 8, 8, C]``;
``rot_head -> (noc[bs, 64, 64, 3], w2d[bs, 64, 64, 2], scale[bs, 2])``;
``trans_head -> trans[bs, 3]``.

Reference: EPro-PnP-6DoF/lib/models/CDPN.py:12-24 (the Monte Carlo pose loss
lives in the functional train step, not inside the model — JAX state
discipline).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from .backbones.resnet import ResNetBackbone
from .heads.rot_head import RotHead
from .heads.trans_head import TransHead


class CDPNOutputs(NamedTuple):
    noc: jnp.ndarray     # (bs, 64, 64, 3)
    w2d: jnp.ndarray     # (bs, 64, 64, 2)
    scale: jnp.ndarray   # (bs, 2)
    trans: jnp.ndarray   # (bs, 3)


class CDPN(nn.Module):
    depth: int = 34
    rot_filters: int = 256
    trans_filters: int = 256
    dtype: Any = jnp.float32
    # Mixed-precision recipe: run the conv-heavy backbone in bfloat16
    # (params stay float32) while the heads and the PnP layer keep
    # ``dtype``. None = backbone uses ``dtype`` too.
    backbone_dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True) -> CDPNOutputs:
        feat, = ResNetBackbone(self.depth, out_indices=(4,),
                               dtype=self.backbone_dtype or self.dtype,
                               name='backbone')(img, train=train)
        feat = feat.astype(self.dtype)
        noc, w2d, scale = RotHead(num_filters=self.rot_filters,
                                  dtype=self.dtype,
                                  name='rot_head')(feat, train=train)
        trans = TransHead(num_filters=self.trans_filters, dtype=self.dtype,
                          name='trans_head')(feat, train=train)
        return CDPNOutputs(noc=noc, w2d=w2d, scale=scale, trans=trans)
