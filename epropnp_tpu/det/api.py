"""High-level Det-suite API: build, load, and run the detector.

The TPU counterpart of the reference ``apis`` package
(EPro-PnP-Det/epropnp_det/apis/inference.py:82-170 ``init_detector`` /
``inference_detector``; apis/test.py:17-53 ``single_gpu_test``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.detectors.epropnp_det import EProPnPDet
from ..utils.checkpoint import load_checkpoint
from ..utils.timer import IterTimers
from .config import DetConfig
from .pipelines import REFERENCE_CROP_BOX, default_pipeline
from . import test as dtest


def build_detector(cfg: DetConfig, **overrides) -> EProPnPDet:
    return EProPnPDet(
        num_classes=cfg.num_classes,
        backbone_depth=cfg.backbone_depth,
        embed_dims=cfg.embed_dims,
        num_heads=cfg.num_heads,
        num_points=cfg.num_points,
        strides=cfg.strides,
        output_stride=cfg.output_stride,
        use_cls_emb=cfg.use_cls_emb,
        dim_cls_agnostic=cfg.dim_cls_agnostic,
        offset_cls_agnostic=cfg.offset_cls_agnostic,
        pred_velo=cfg.pred_velo,
        pred_attr=cfg.pred_attr,
        num_attrs=cfg.num_attrs,
        score_type=cfg.score_type,
        dcn_modulation_scale=cfg.dcn_modulation_scale,
        dcn_int8_gather=cfg.int8_dcn_gather,
        level_packed_towers=cfg.level_packed_towers,
        backbone_dtype=jnp.bfloat16 if cfg.bf16_backbone else None,
        dense_dtype=jnp.bfloat16 if cfg.bf16_dense else None,
        **overrides)


def torch_checkpoint_has_dcn_offsets(path: str) -> bool:
    """True if a torch checkpoint carries mmcv DCNv2 ``conv_offset`` keys.

    Such checkpoints were trained with mmcv's plain-sigmoid modulation;
    running them under ``dcn_modulation_scale != 1.0`` silently rescales
    every DCN mask. Plain torchvision zoo files (no offset keys) instead
    want the configured scale so the zero-offset graft stays
    identity-like.
    """
    from ..utils import torch_convert as tc
    return any('conv_offset' in k for k in tc.load_torch_state_dict(path))


def load_torch_variables(cfg: DetConfig, variables, path: str,
                         head_overrides: Optional[dict] = None):
    """Ingest a torch checkpoint into freshly initialized variables.

    Handles the reference's three weight sources (tools/train.py /
    tools/test.py + configs/epropnp_det_basic.py:18,254):
      * torchvision ImageNet ResNet (``conv1.weight`` at the top level) —
        the ``init_cfg=Pretrained torchvision://resnet101`` backbone init;
        DCN-stage 3x3 kernels graft into the DeformConv matmul layout
        with zero offsets (mmcv zero-inits ``conv_offset`` too);
      * an mmdet backbone(+neck) checkpoint (``backbone.``/``neck.``
        prefixes);
      * a full released EProPnPDet checkpoint (+ ``bbox_head.``) — build
        the model with ``dcn_modulation_scale=1.0`` for exact parity.

    Unmatched leaves keep their fresh init (filtered-restore semantics).
    """
    from ..utils import torch_convert as tc
    sd = tc.load_torch_state_dict(path)
    if any('conv_offset' in k for k in sd) \
            and cfg.dcn_modulation_scale != 1.0:
        raise ValueError(
            f'{path} carries mmcv DCNv2 conv_offset weights but the model '
            f'was built with dcn_modulation_scale={cfg.dcn_modulation_scale}'
            ' — every DCN mask would be silently rescaled. Rebuild with '
            'dcn_modulation_scale=1.0 (init_detector does this '
            'automatically).')
    dcn_stages = (3, 4)
    pre_params, pre_stats = {}, {}
    if 'backbone.conv1.weight' in sd:
        bb = tc.det_backbone_variables(sd, cfg.backbone_depth, dcn_stages,
                                       prefix='backbone.')
        pre_params['backbone'] = bb['params']
        pre_stats['backbone'] = bb['batch_stats']
    elif 'conv1.weight' in sd:  # torchvision zoo file
        bb = tc.det_backbone_variables(sd, cfg.backbone_depth, dcn_stages,
                                       prefix='')
        pre_params['backbone'] = bb['params']
        pre_stats['backbone'] = bb['batch_stats']
    if 'neck.lateral_convs.0.conv.weight' in sd:
        first_stage = {4: 1, 8: 2}[cfg.strides[0]]
        laterals = 5 - first_stage
        neck = tc.fpn_variables(sd, laterals,
                                len(cfg.strides) - laterals,
                                prefix='neck.')
        pre_params['neck'] = neck['params']
    if 'bbox_head.query_proj.weight' in sd:
        # Derive the head geometry from the same knobs the model was
        # built with (build_detector overrides on top of the module
        # defaults) so the converter tracks non-default architectures.
        from ..models.dense_heads.deform_pnp_head import DeformPnPHead
        from ..models.dense_heads.fcos_emb_head import FCOSEmbHead
        ov = head_overrides or {}
        det_cfg = ov.get('detector_cfg') or {}
        head = tc.det_head_variables(
            sd, prefix='bbox_head.',
            stacked_convs=det_cfg.get('stacked_convs',
                                      FCOSEmbHead.stacked_convs),
            dcn_on_last_conv=ov.get('dcn_on_last_conv',
                                    DeformPnPHead.dcn_on_last_conv),
            num_lvl_convs=len(ov.get('lvl_feat_channels',
                                     DeformPnPHead.lvl_feat_channels)),
            num_pred_fcs=ov.get('num_pred_fcs', DeformPnPHead.num_pred_fcs),
            num_pts_trans_layers=ov.get('num_pts_trans_layers',
                                        DeformPnPHead.num_pts_trans_layers))
        pre_params['head'] = head['params']
    if not pre_params:
        raise ValueError(
            f'{path}: no recognizable backbone/neck/head keys '
            '(expected torchvision or mmdet EPro-PnP-Det naming)')
    pretrained = {'params': pre_params}
    if pre_stats:
        pretrained['batch_stats'] = pre_stats
    return tc.merge_pretrained(dict(variables), pretrained)


def init_detector(cfg: DetConfig, checkpoint: Optional[str] = None,
                  img_hw=(672, 1600), **overrides):
    """Build the model and (optionally) restore parameters.

    Returns (model, variables). Reference: apis/inference.py:82-118.
    ``checkpoint`` accepts both native msgpack checkpoints and torch
    ``.pth/.pt/.tar`` files (converted via ``load_torch_variables``; the
    reference loads released torch checkpoints with tools/test.py
    ``--checkpoint``).
    """
    is_torch = bool(checkpoint) and checkpoint.endswith(
        ('.pth', '.pt', '.tar'))
    if is_torch and cfg.dcn_modulation_scale != 1.0 \
            and torch_checkpoint_has_dcn_offsets(checkpoint):
        # mmcv-trained DCNv2 weights expect plain-sigmoid modulation;
        # rebuild with exact mmcv semantics instead of silently
        # rescaling every mask (tools/train_det.py applies the same
        # detection before training).
        import dataclasses
        cfg = dataclasses.replace(cfg, dcn_modulation_scale=1.0)
    model = build_detector(cfg, **overrides)
    img = jnp.zeros((1,) + tuple(img_hw) + (3,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, tuple(img_hw))
    variables = dict(variables)
    if checkpoint:
        if is_torch:
            variables = load_torch_variables(cfg, variables, checkpoint,
                                             head_overrides=overrides)
        else:
            variables = load_checkpoint(checkpoint, variables)
    return model, variables


def inference_detector(model, variables, cfg: DetConfig,
                       imgs: List[np.ndarray],
                       cam_intrinsics: List[np.ndarray],
                       infer_fn=None, rng=None, timers: IterTimers = None,
                       crop_box='auto', tta: bool = False):
    """Run inference on raw images (host pipeline + jitted model).

    ``crop_box='auto'`` applies the reference sky-band crop
    (``REFERENCE_CROP_BOX``, i.e. 1600x900 -> 1600x672 — the released
    test pipeline crops too, basic.py:190) when the input frame is at
    least that large; pass None to disable or an explicit box.
    Returns per-image per-class detection arrays (reference
    apis/inference.py:120-170 + single_gpu_test).
    """
    timers = timers or IterTimers(enabled=False)
    samples = []
    with timers('data time'):
        for img, k in zip(imgs, cam_intrinsics):
            box = crop_box
            if box == 'auto':
                box = REFERENCE_CROP_BOX if (
                    img.shape[0] >= REFERENCE_CROP_BOX[3]
                    and img.shape[1] >= REFERENCE_CROP_BOX[2]) else None
            samples.append(default_pipeline(
                dict(img=img, cam_intrinsic=np.asarray(k)),
                training=False, crop_box=box))
    n = len(samples)
    batch_img = jnp.asarray(np.stack([s['img'] for s in samples]))
    cam = jnp.asarray(np.stack([s['cam_intrinsic'] for s in samples]),
                      jnp.float32)
    shapes = jnp.asarray([s['img_shape'] for s in samples], jnp.float32)
    ori = jnp.asarray([s['ori_shape'] for s in samples], jnp.float32)
    flips = jnp.asarray([s['flip'] for s in samples])
    x2d = jnp.asarray(np.stack([s['img_dense_x2d'] for s in samples]))
    x2d_mask = jnp.asarray(
        np.stack([s['img_dense_x2d_mask'] for s in samples]))

    if infer_fn is None:
        make_fn = (dtest.make_tta_inference_fn if tta
                   else dtest.make_inference_fn)
        infer_fn = jax.jit(make_fn(model, cfg))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    with timers('model time'):
        if tta:
            results = infer_fn(variables, batch_img, batch_img[:, :, ::-1],
                               cam, shapes, ori, x2d, x2d[:, :, ::-1],
                               x2d_mask, rng)
        else:
            results = infer_fn(variables, batch_img, cam, shapes, ori,
                               flips, x2d, x2d_mask, rng)
        jax.block_until_ready(results.bbox_3d)
    with timers('post-proc. time'):
        out2d, out3d = dtest.results_to_numpy(results, n, cfg.num_classes)
    return out2d, out3d
