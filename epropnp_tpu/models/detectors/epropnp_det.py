"""EProPnPDet: single-stage monocular 3D detector (backbone + FPN + head).

Thin orchestrator — feature extraction delegates to the ResNet(-DCN)
backbone and FPN, everything else to the DeformPnPHead. Reference:
EPro-PnP-Det/epropnp_det/models/detectors/epropnp_det.py:27-46.

Exposes granular methods so a functional train/test step can interleave
network applies with pure loss math:
  * ``extract_feat``: images -> FPN pyramid
  * ``det_dense``: pyramid -> detector outputs + dense key/value
  * ``subheads``: sampled objects -> correspondence/branch outputs
  * ``roi_regr``: RoI features -> dense (noc, logstd) for aux losses
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ResNetBackbone
from ..dense_heads.deform_pnp_head import DeformPnPHead
from ..necks.fpn import FPN


class EProPnPDet(nn.Module):
    num_classes: int = 10
    backbone_depth: int = 101
    backbone_dcn_stages: Sequence[int] = (3, 4)
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 32
    strides: Sequence[int] = (4, 8, 16, 32, 64, 128)
    output_stride: int = 4
    use_cls_emb: bool = False
    dim_cls_agnostic: bool = False
    offset_cls_agnostic: bool = True
    pred_velo: bool = True
    pred_attr: bool = True
    num_attrs: int = 9
    score_type: str = 'te'
    dcn_on_last_conv: bool = True
    dcn_modulation_scale: float = 2.0  # 1.0 for converted mmcv checkpoints
    dcn_int8_gather: bool = False  # serving-only quantized gather tables
    level_packed_towers: bool = False  # composite-canvas FCOS towers
    detector_cfg: Any = None  # extra FCOSEmbHead overrides (dict)
    dtype: Any = jnp.float32
    # Mixed-precision recipe: backbone + FPN in bfloat16 (params stay
    # float32), heads in ``dtype``. None = same dtype everywhere.
    backbone_dtype: Any = None
    # Serving mixed precision for the head's dense stage (FCOS towers +
    # dense key/value convs) — the DCN patch-row gather there is the
    # det_dense bandwidth hot spot. Outputs are cast back to ``dtype``.
    dense_dtype: Any = None

    def setup(self):
        bdt = self.backbone_dtype or self.dtype
        # Root the pyramid at the configured finest stride, as the
        # reference configs do: the v1 family (strides from 4) takes
        # C2..C5 (configs/epropnp_det_basic.py out_indices=(0,1,2,3)),
        # the v1b family (strides from 8) takes C3..C5 only
        # (configs/epropnp_det_v1b_220411.py out_indices=(1,2,3)) — a
        # C2-rooted pyramid would mislabel every FCOS/dense stride by 2x
        # and quadruple the level-0 tower compute.
        if self.strides[0] not in (4, 8) or 8 not in self.strides \
                or 32 not in self.strides:
            raise ValueError(
                'strides must start at 4 (v1 family) or 8 (v1b family) '
                'and contain both 8 (FCOS base level) and 32 (dense-stage '
                f'top level); got {self.strides}')
        first_stage = {4: 1, 8: 2}[self.strides[0]]
        self.backbone = ResNetBackbone(
            depth=self.backbone_depth,
            out_indices=tuple(range(first_stage, 5)),
            dcn_stages=self.backbone_dcn_stages,
            dcn_modulation_scale=self.dcn_modulation_scale,
            dcn_int8_gather=self.dcn_int8_gather, dtype=bdt)
        spec_mult = 1 if self.backbone_depth in (18, 34) else 4
        in_ch = tuple(c * spec_mult
                      for c in (64, 128, 256, 512)[first_stage - 1:])
        num_levels = len(self.strides)
        self.neck = FPN(in_channels=in_ch, out_channels=self.embed_dims,
                        num_outs=num_levels, dtype=bdt)
        # FCOS runs on strides 8..; the dense stage on strides ..32
        # (reference det_lvl_range=(1,6)/(0,5), dense_lvl_range=(0,4)/(0,3)
        # for the v1/v1b families respectively)
        det_lvl_lo = self.strides.index(8)
        dense_lvl_hi = self.strides.index(32) + 1
        self.head = DeformPnPHead(
            num_classes=self.num_classes,
            in_channels=self.embed_dims,
            strides=self.strides,
            output_stride=self.output_stride,
            dense_lvl_range=(0, dense_lvl_hi),
            det_lvl_range=(det_lvl_lo, num_levels),
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_points=self.num_points,
            use_cls_emb=self.use_cls_emb,
            dim_cls_agnostic=self.dim_cls_agnostic,
            pred_velo=self.pred_velo,
            pred_attr=self.pred_attr,
            num_attrs=self.num_attrs,
            score_type=self.score_type,
            dcn_on_last_conv=self.dcn_on_last_conv,
            dcn_modulation_scale=self.dcn_modulation_scale,
            dcn_int8_gather=self.dcn_int8_gather,
            detector_cfg=dict(
                offset_cls_agnostic=self.offset_cls_agnostic,
                level_packed=self.level_packed_towers,
                **(self.detector_cfg or {})),
            dtype=self.dtype,
            dense_dtype=self.dense_dtype)

    def extract_feat(self, img, train: bool = False):
        """images (n, h, w, 3) -> FPN pyramid (strides[0]..)."""
        feats = self.backbone(img, train=train)
        return [f.astype(self.dtype) for f in self.neck(feats)]

    def det_dense(self, img, img_shape, train: bool = False):
        feats = self.extract_feat(img, train=train)
        return self.head.forward_det_dense(feats, img_shape)

    def subheads(self, *args, **kwargs):
        return self.head.forward_subheads(*args, **kwargs)

    def extract_rois(self, *args, **kwargs):
        return self.head.extract_rois(*args, **kwargs)

    def roi_regr(self, value_roi, gt_flips):
        return self.head.dense_corr_regr(value_roi, gt_flips)

    def __call__(self, img, img_shape, train: bool = False):
        """Init-friendly default: traces EVERY parameter-creating path."""
        det_outs, key, value = self.det_dense(img, img_shape, train=train)
        n, h0, w0, _ = key.shape
        num_obj = 2
        f32 = self.dtype
        x2d_small = jnp.zeros((n, h0, w0, 2), f32)
        mask_small = jnp.ones((n, h0, w0, 1), f32)
        img_shapes = jnp.asarray([img_shape] * n, f32)
        self.head.forward_subheads(
            jnp.zeros((num_obj, 2), f32),
            jnp.zeros((num_obj, self.embed_dims), f32),
            key, value, x2d_small, mask_small,
            jnp.full((num_obj,), float(self.output_stride), f32),
            jnp.zeros((num_obj,), jnp.int32),
            jnp.zeros((num_obj,), jnp.int32),
            jnp.zeros((n,), bool), img_shapes)
        dense_x2d = jnp.zeros(img.shape[:3] + (2,), f32)
        _, _, value_roi = self.head.extract_rois(
            jnp.zeros((num_obj,), jnp.int32),
            jnp.asarray([[0., 0., 8., 8.]] * num_obj, f32),
            dense_x2d, key, value, (4, 4))
        self.head.dense_corr_regr(value_roi, jnp.zeros((num_obj,), bool))
        return det_outs, key, value
