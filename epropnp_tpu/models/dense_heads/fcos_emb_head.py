"""FCOS-style detection head with projected-3D-center offsets and object
embeddings (flax, NHWC, fixed shapes).

Per level the head predicts: class scores, a class-agnostic (or per-class)
*projected 3D center* via ``center = offset * stride + point``, a
centerness score, and a D-dim object embedding. Targets assign each point
to the nearest projected GT center inside a center-sampled box within the
level's regression range, with
``centerness = exp(-alpha * dist / (1.414 * stride))``.

Reference: EPro-PnP-Det/epropnp_det/models/dense_heads/fcos_emb_head.py
(forward :165-198, targets :363-438, losses :200-245, preds :247-286).
TPU-first: ragged GT lists become (max_gt,)-padded arrays with masks; the
dynamic ``nonzero`` selections in loss/get_preds become mask weights and a
fixed-size top-k.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.deform_conv import DeformConv
from ..losses.det_losses import (
    sigmoid_focal_loss,
    smooth_l1_loss_mod,
)

INF = 1e8


def _gn_groups(channels: int, preferred: int = 32) -> int:
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


class FCOSLevelOutputs(NamedTuple):
    cls_score: jnp.ndarray   # (n, h, w, num_classes)
    center: jnp.ndarray      # (n, h, w, 2) or (n, h, w, num_classes*2)
    centerness: jnp.ndarray  # (n, h, w, 1)
    obj_emb: jnp.ndarray     # (n, h, w, emb_channels)
    points: jnp.ndarray      # (h*w, 2) image-pixel point centers


def level_points(h: int, w: int, stride: int, dtype=jnp.float32):
    """Image-plane coordinates of feature cells. Reference: :288-297."""
    ys = jnp.arange(h, dtype=dtype) * stride
    xs = jnp.arange(w, dtype=dtype) * stride
    yy, xx = jnp.meshgrid(ys, xs, indexing='ij')
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1) + stride // 2


class FCOSEmbHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 48), (48, 96), (96, 192), (192, 384), (384, INF))
    emb_channels: int = 256
    centerness_alpha: float = 2.5
    center_sample_radius: float = 1.5
    center_error_scale: float = 0.2
    min_ref_length: float = 4.0
    offset_cls_agnostic: bool = True
    dcn_on_last_conv: bool = True
    dcn_modulation_scale: float = 2.0  # 1.0 for converted mmcv checkpoints
    dcn_int8_gather: bool = False  # serving-only quantized gather table
    cls_branch: Sequence[int] = (256,)
    centerness_branch: Sequence[int] = (64,)
    offset_branch: Sequence[int] = (256,)
    emb_branch: Sequence[int] = (256,)
    dtype: Any = jnp.float32
    # Serving mixed precision: run the conv towers (incl. the DCN last
    # conv, whose patch-row gather is the det_dense bandwidth hot spot) in
    # this dtype; tower outputs are cast back to ``dtype`` before the
    # branch convs, so scores/centers/embeddings keep full precision.
    # None = same dtype as everything else.
    dense_dtype: Any = None
    # Pack all pyramid levels into one composite canvas so every tower /
    # branch conv runs ONCE at an MXU-friendly shape instead of 5 times
    # (3 of them on maps too small to tile the MXU). Output-identical to
    # the per-level path (ops/level_pack.py documents the exactness
    # rules); GroupNorm statistics stay per-level.
    level_packed: bool = False

    def _tower(self, name):
        ddt = self.dense_dtype or self.dtype
        convs = []
        for i in range(self.stacked_convs):
            if self.dcn_on_last_conv and i == self.stacked_convs - 1:
                convs.append(DeformConv(
                    self.feat_channels,
                    modulation_scale=self.dcn_modulation_scale,
                    int8_gather=self.dcn_int8_gather,
                    dtype=ddt, name=f'{name}_dcn{i}'))
            else:
                convs.append(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                     use_bias=False, dtype=ddt,
                                     name=f'{name}_conv{i}'))
            convs.append(nn.GroupNorm(_gn_groups(self.feat_channels),
                                      epsilon=1e-5, dtype=ddt,
                                      name=f'{name}_gn{i}'))
        return convs

    def _make_branch(self, chans, name):
        mods = []
        for i, ch in enumerate(chans):
            mods.append((
                nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f'{name}_conv{i}'),
                nn.GroupNorm(_gn_groups(ch), epsilon=1e-5, dtype=self.dtype,
                             name=f'{name}_gn{i}')))
        return mods

    @staticmethod
    def _apply_branch(mods, x):
        for conv, gn in mods:
            x = nn.relu(gn(conv(x)))
        return x

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]
                 ) -> Tuple[FCOSLevelOutputs, ...]:
        # modules are created once and shared across pyramid levels
        cls_tower = self._tower('cls')
        reg_tower = self._tower('reg')
        cls_branch = self._make_branch(self.cls_branch, 'cls_br')
        ctr_branch = self._make_branch(self.centerness_branch, 'ctr_br')
        off_branch = self._make_branch(self.offset_branch, 'off_br')
        emb_branch = self._make_branch(self.emb_branch, 'emb_br')
        conv_cls = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.59),  # prior prob 0.01
            name='conv_cls')
        conv_centerness = nn.Conv(1, (1, 1), dtype=self.dtype,
                                  name='conv_centerness')
        off_ch = 2 if self.offset_cls_agnostic else self.num_classes * 2
        conv_offset = nn.Conv(off_ch, (1, 1), dtype=self.dtype,
                              name='conv_offset')
        conv_emb = nn.Conv(self.emb_channels, (1, 1), use_bias=False,
                           dtype=self.dtype, name='conv_emb')
        conv_emb_gn = nn.GroupNorm(_gn_groups(self.emb_channels),
                                   epsilon=1e-5, dtype=self.dtype,
                                   name='conv_emb_gn')

        ddt = self.dense_dtype or self.dtype
        if self.level_packed and len(feats) > 1:
            return self._packed_forward(
                feats, ddt, cls_tower, reg_tower, cls_branch, ctr_branch,
                off_branch, emb_branch, conv_cls, conv_centerness,
                conv_offset, conv_emb, conv_emb_gn, off_ch)
        outs = []
        for lvl, (x, stride) in enumerate(zip(feats, self.strides)):
            cls_feat = x.astype(ddt)
            reg_feat = cls_feat
            for layer in cls_tower:
                cls_feat = layer(cls_feat)
                if isinstance(layer, nn.GroupNorm):
                    cls_feat = nn.relu(cls_feat)
            for layer in reg_tower:
                reg_feat = layer(reg_feat)
                if isinstance(layer, nn.GroupNorm):
                    reg_feat = nn.relu(reg_feat)
            cls_feat = cls_feat.astype(self.dtype)
            reg_feat = reg_feat.astype(self.dtype)

            cls_score = conv_cls(self._apply_branch(cls_branch, cls_feat))
            centerness = conv_centerness(
                self._apply_branch(ctr_branch, reg_feat))
            offset = conv_offset(
                self._apply_branch(off_branch, reg_feat)) * stride
            # conv_emb is an mmcv ConvModule (conv -> GN -> default ReLU,
            # fcos_emb_head.py:109-117) — the ReLU is part of the module
            obj_emb = nn.relu(conv_emb_gn(conv_emb(
                self._apply_branch(emb_branch, reg_feat))))

            n, h, w, _ = x.shape
            pts = level_points(h, w, stride, self.dtype)
            pts_map = pts.reshape(h, w, 2)
            if self.offset_cls_agnostic:
                center = offset + pts_map
            else:
                center = (offset.reshape(n, h, w, self.num_classes, 2)
                          + pts_map[:, :, None, :]).reshape(n, h, w, off_ch)
            outs.append(FCOSLevelOutputs(cls_score, center, centerness,
                                         obj_emb, pts))
        return tuple(outs)

    def _packed_forward(self, feats, ddt, cls_tower, reg_tower, cls_branch,
                        ctr_branch, off_branch, emb_branch, conv_cls,
                        conv_centerness, conv_offset, conv_emb, conv_emb_gn,
                        off_ch):
        """Level-packed tower/branch forward (identical outputs).

        Every conv runs once on the composite canvas; GroupNorms apply
        per level via ``map_levels`` (exact per-level statistics), which
        also rebuilds the canvas on zeros so the following conv sees the
        zero gaps per-level 'same' padding provides. DeformConv samples
        each level's region from its own patch table (no cross-level
        reads). Per-level stride scaling and point grids are applied
        after unpacking.
        """
        from ...ops.deform_conv import DeformConv
        from ...ops.level_pack import (
            map_levels, pack_levels, plan_level_packing, unpack_levels)
        layout = plan_level_packing(
            [(x.shape[1], x.shape[2]) for x in feats])

        def run_tower(tower, comp):
            for layer in tower:
                if isinstance(layer, DeformConv):
                    comp = layer(comp, layout=layout)
                elif isinstance(layer, nn.GroupNorm):
                    comp = map_levels(comp, layout,
                                      lambda s: nn.relu(layer(s)))
                else:
                    comp = layer(comp)
            return comp

        def run_branch(mods, comp):
            for conv, gn in mods:
                comp = conv(comp)
                comp = map_levels(comp, layout, lambda s: nn.relu(gn(s)))
            return comp

        comp_in = pack_levels([x.astype(ddt) for x in feats], layout)
        cls_feat = run_tower(cls_tower, comp_in).astype(self.dtype)
        reg_feat = run_tower(reg_tower, comp_in).astype(self.dtype)

        cls_score_c = conv_cls(run_branch(cls_branch, cls_feat))
        centerness_c = conv_centerness(run_branch(ctr_branch, reg_feat))
        offset_c = conv_offset(run_branch(off_branch, reg_feat))
        obj_emb_c = map_levels(
            conv_emb(run_branch(emb_branch, reg_feat)), layout,
            lambda s: nn.relu(conv_emb_gn(s)))

        outs = []
        for lvl, (cls_score, centerness, offset, obj_emb, stride) in \
                enumerate(zip(unpack_levels(cls_score_c, layout),
                              unpack_levels(centerness_c, layout),
                              unpack_levels(offset_c, layout),
                              unpack_levels(obj_emb_c, layout),
                              self.strides)):
            n, h, w, _ = cls_score.shape
            offset = offset * stride
            pts = level_points(h, w, stride, self.dtype)
            pts_map = pts.reshape(h, w, 2)
            if self.offset_cls_agnostic:
                center = offset + pts_map
            else:
                center = (offset.reshape(n, h, w, self.num_classes, 2)
                          + pts_map[:, :, None, :]).reshape(n, h, w, off_ch)
            outs.append(FCOSLevelOutputs(cls_score, center, centerness,
                                         obj_emb, pts))
        return tuple(outs)

    # ------------------------------------------------------------- targets

    def get_targets(self, points_per_lvl, gt_bboxes, gt_labels, gt_mask,
                    centers2d):
        """Fixed-shape FCOS target assignment.

        Args:
            points_per_lvl: list of (p_l, 2) per level.
            gt_bboxes: (num_img, max_gt, 4); gt_labels: (num_img, max_gt);
            gt_mask: (num_img, max_gt) validity; centers2d: (num_img,
            max_gt, 2) projected 3D centers.

        Returns (labels, centerness_targets, gt_inds) each (num_img, P)
        where P = sum of per-level point counts; gt_inds indexes the
        per-image GT axis (meaningless where labels == num_classes).
        """
        dtype = gt_bboxes.dtype
        pts = jnp.concatenate(points_per_lvl, axis=0)            # (P, 2)
        rr = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(r, dtype), (p.shape[0], 2))
            for p, r in zip(points_per_lvl, self.regress_ranges)])
        strides = jnp.concatenate([
            jnp.full((p.shape[0],), s, dtype)
            for p, s in zip(points_per_lvl, self.strides)])

        def single(boxes, labels, mask, c2d):
            # (P, max_gt)
            dx = pts[:, None, 0] - c2d[None, :, 0]
            dy = pts[:, None, 1] - c2d[None, :, 1]
            dists = jnp.sqrt(dx * dx + dy * dy)
            radius = strides[:, None] * self.center_sample_radius
            inside_center = (
                (jnp.abs(dx) < radius) & (jnp.abs(dy) < radius))
            l = pts[:, None, 0] - boxes[None, :, 0]
            t = pts[:, None, 1] - boxes[None, :, 1]
            r = boxes[None, :, 2] - pts[:, None, 0]
            b = boxes[None, :, 3] - pts[:, None, 1]
            inside_box = jnp.minimum(jnp.minimum(l, r),
                                     jnp.minimum(t, b)) > 0
            max_reg = jnp.maximum(jnp.maximum(l, r), jnp.maximum(t, b))
            in_range = (max_reg >= rr[:, None, 0]) & (max_reg <= rr[:, None, 1])
            valid = inside_center & inside_box & in_range & mask[None, :]
            dists = jnp.where(valid, dists, INF)
            min_dist = jnp.min(dists, axis=1)
            gt_ind = jnp.argmin(dists, axis=1)
            label = jnp.where(min_dist < INF, labels[gt_ind],
                              self.num_classes)
            rel = min_dist / (1.414 * strides)
            ctr = jnp.exp(-self.centerness_alpha * rel)
            return label, ctr, gt_ind

        return jax.vmap(single)(gt_bboxes, gt_labels, gt_mask, centers2d)

    # --------------------------------------------------------------- loss

    def loss(self, flat_cls, flat_center, flat_centerness, labels, gt_inds,
             centerness_targets, centers2d, gt_bboxes,
             axis_name: Optional[str] = None):
        """Masked FCOS losses. Reference: :200-245.

        Args (all flattened over images x points):
            flat_cls: (N, num_classes); flat_center: (N, 2) or (N, C*2);
            flat_centerness: (N,); labels/gt_inds/centerness_targets: (N,);
            centers2d/gt_bboxes: per-image-flattened GT arrays (G, 2)/(G, 4)
            that gt_inds indexes.
        """
        pos = labels < self.num_classes
        num_pos = jnp.sum(pos.astype(flat_cls.dtype))
        if axis_name is not None:
            num_pos = jax.lax.pmean(num_pos, axis_name)
        num_pos = jnp.maximum(num_pos, 1.0)

        onehot = jax.nn.one_hot(labels, self.num_classes,
                                dtype=flat_cls.dtype)
        loss_cls = sigmoid_focal_loss(flat_cls, onehot, reduction='sum') \
            / num_pos

        if not self.offset_cls_agnostic:
            lbl = jnp.minimum(labels, self.num_classes - 1)
            flat_center = jnp.take_along_axis(
                flat_center.reshape(-1, self.num_classes, 2),
                lbl[:, None, None].repeat(2, -1), axis=1)[:, 0]
        center_gt = centers2d[gt_inds]
        box_gt = gt_bboxes[gt_inds]
        ref_len = box_gt[:, 2:] - box_gt[:, :2]
        rel_err = (flat_center - center_gt) / (
            self.center_error_scale * (ref_len + self.min_ref_length))
        ctr_w = jnp.where(pos, centerness_targets, 0.0)
        ctr_sum = jnp.sum(ctr_w)
        if axis_name is not None:
            ctr_sum = jax.lax.pmean(ctr_sum, axis_name)
        loss_rp = smooth_l1_loss_mod(
            rel_err, 0, beta=1.0, weight=ctr_w[:, None], reduction='sum') \
            / (jnp.maximum(ctr_sum, 1e-6) * 2.0)

        bce = (jax.nn.softplus(-flat_centerness) * centerness_targets
               + jax.nn.softplus(flat_centerness)
               * (1.0 - centerness_targets))
        loss_centerness = jnp.sum(jnp.where(pos, bce, 0.0)) / num_pos
        return dict(loss_cls=loss_cls, loss_rp=loss_rp,
                    loss_centerness=loss_centerness)

    # --------------------------------------------------------------- preds

    def get_preds(self, level_outputs: Tuple[FCOSLevelOutputs, ...],
                  extra_maps: Sequence[Sequence[jnp.ndarray]] = (),
                  max_obj_per_img: int = 256, min_fcos_score: float = 0.04):
        """Thresholded fixed-size top-k detections across levels.

        Args:
            extra_maps: per-entry list of per-level NHWC maps to gather at
                the selected points (e.g. obj_emb, center).

        Returns dict with (K,)-shaped ``img_inds, score, labels, strides,
        valid`` and a list ``gathered`` of (K, C) arrays; K = bs *
        max_obj_per_img, selected top-k PER IMAGE (the reference's
        per-image thresholding, :247-286: dynamic nonzero -> static top-k
        with a validity mask). Objects of image i occupy the contiguous
        slice [i*max_obj_per_img, (i+1)*max_obj_per_img) — downstream
        NMS exploits this to vmap per image.
        """
        bs = level_outputs[0].cls_score.shape[0]
        kpi = max_obj_per_img

        def flat(maps):
            return jnp.concatenate(
                [m.reshape(bs, -1, m.shape[-1]) for m in maps], axis=1)

        cls = jax.nn.sigmoid(flat([o.cls_score for o in level_outputs]))
        ctr = jax.nn.sigmoid(flat([o.centerness for o in level_outputs]))
        fcos_score = cls * ctr                       # (bs, P, C)
        strides = jnp.concatenate([
            jnp.full((o.cls_score.shape[1] * o.cls_score.shape[2],), s,
                     cls.dtype)
            for o, s in zip(level_outputs, self.strides)])
        p = fcos_score.shape[1]
        c = self.num_classes
        score_img = fcos_score.reshape(bs, p * c)    # per-image candidates
        masked = jnp.where(score_img >= min_fcos_score, score_img, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, kpi)   # (bs, kpi)
        valid = (top_scores > 0.0).reshape(-1)
        img_inds = jnp.repeat(jnp.arange(bs), kpi)
        top_idx = top_idx.reshape(-1)
        point_inds = top_idx // c
        labels = top_idx % c

        out = dict(
            img_inds=img_inds,
            point_inds=point_inds,
            score=cls[img_inds, point_inds, labels],
            labels=labels,
            strides=strides[point_inds],
            valid=valid,
        )
        gathered = []
        for maps in extra_maps:
            fm = flat(maps)
            gathered.append(fm[img_inds, point_inds])
        out['gathered'] = gathered
        pts = jnp.concatenate([o.points for o in level_outputs], axis=0)
        out['points'] = pts[point_inds]
        return out
