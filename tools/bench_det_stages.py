"""Stage-level profiling of the Det-suite serving path on real hardware.

Times each stage of the jitted inference pipeline separately (each stage
jitted on its own, inputs pre-staged on device, `block_until_ready`
between timings) and then the fused end-to-end function, so the
hot spots of the 3 img/s serving number can be attributed:

  1. det_dense   — backbone + FPN + FCOS heads + dense key/value maps
  2. get_preds   — thresholded top-k candidate selection across levels
  3. subheads    — deformable attention + correspondence transformer
  4. pnp         — RSLM init + fast-mode Gauss-Newton solve
  5. post        — 3D->2D boxes, 2D NMS, BEV NMS

Counterpart of the reference's ``--timer`` per-stage timers
(EPro-PnP-Det/test.py:64-68, epropnp_det/utils/timer.py:10-46).

Usage: python tools/bench_det_stages.py [--height 672] [--width 1600]
       [--bs 1] [--iters 20] [--bf16] [--pallas]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from epropnp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from epropnp_tpu.core.bbox_3d.misc import (batched_bev_nms_per_image,
                                           bboxes_3d_to_2d)
from epropnp_tpu.core.bbox_3d.nms import nms_axis_aligned_per_image
from epropnp_tpu.det.api import build_detector
from epropnp_tpu.det.config import DetConfig
from epropnp_tpu.det.test import build_test_pnp, make_inference_fn
from epropnp_tpu.det.train import avg_pool_stride
from epropnp_tpu.ops.pnp import AdaptiveHuberPnPCost, PerspectiveCamera


@jax.jit
def _probe(x):
    return sum(jnp.ravel(leaf)[0].astype(jnp.float32)
               for leaf in jax.tree_util.tree_leaves(x))


def _sync(out):
    """Force completion of the dispatch chain. ``block_until_ready`` does
    not reliably block through the device tunnel; instead dispatch a tiny
    scalar probe (executes after all queued work on the device stream) and
    device_get its 4 bytes."""
    np.asarray(_probe(out))


def timed(fn, args, iters, name):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:>12}: {dt * 1e3:8.2f} ms')
    return out, dt


def main():
    # bounded-backoff device probe: a tunnel wedge must fail
    # loudly here, not hang the whole measurement session
    from epropnp_tpu.utils.backend_retry import wait_for_backend
    wait_for_backend(fallback_cpu=False)
    ap = argparse.ArgumentParser()
    ap.add_argument('--height', type=int, default=672)
    ap.add_argument('--width', type=int, default=1600)
    ap.add_argument('--bs', type=int, default=1)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--max-obj', type=int, default=256)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--bf16-dense', action='store_true',
                    help='head dense stage (FCOS towers + key/value) bf16')
    ap.add_argument('--pallas', action='store_true')
    ap.add_argument('--level-packed', action='store_true',
                    help='composite-canvas FCOS towers (level_pack)')
    ap.add_argument('--int8-gather', action='store_true',
                    help='int8-quantized DCN gather tables (serving)')
    ap.add_argument('--split-dense', action='store_true',
                    help='sub-attribute det_dense (backbone/fpn/fcos/'
                         'corr) + XLA-cost-analysis MFU')
    ap.add_argument('--peak-tflops', type=float, default=197.0,
                    help='chip peak for MFU (v5e bf16=197, f32~98)')
    args = ap.parse_args()

    import dataclasses
    cfg = DetConfig.v1b()
    if args.pallas:
        cfg = dataclasses.replace(
            cfg, pnp=dataclasses.replace(cfg.pnp, use_pallas=True))
    if args.bf16:
        cfg = dataclasses.replace(cfg, bf16_backbone=True)
    if args.bf16_dense:
        cfg = dataclasses.replace(cfg, bf16_dense=True)
    if args.level_packed:
        cfg = dataclasses.replace(cfg, level_packed_towers=True)
    if args.int8_gather:
        cfg = dataclasses.replace(cfg, int8_dcn_gather=True)
    model = build_detector(cfg)

    h, w, bs = args.height, args.width, args.bs
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(bs, h, w, 3)), jnp.float32)
    cam = jnp.asarray(
        np.tile(np.array([[1266.4, 0, 816.3], [0, 1266.4, 491.5],
                          [0, 0, 1]], np.float32), (bs, 1, 1)))
    img_shapes = jnp.asarray(np.tile([h, w], (bs, 1)), jnp.float32)
    ori_shapes = jnp.asarray(np.tile([900, 1600], (bs, 1)), jnp.float32)
    img_flips = jnp.zeros((bs,), bool)
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing='ij')
    dense_x2d = jnp.asarray(
        np.tile(np.stack([xs, ys], -1)[None], (bs, 1, 1, 1)), jnp.float32)
    dense_mask = jnp.ones((bs, h, w, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)

    variables = model.init(jax.random.PRNGKey(0), img[:1], (h, w))
    pnp = build_test_pnp(cfg)
    img_shape = (h, w)

    # ---- stage functions (jitted separately) ----
    @jax.jit
    def f_dense(variables, img):
        return model.apply(variables, img, img_shape, train=False,
                           method=model.det_dense)

    bound = model.bind(variables)
    detector = bound.head.detector

    @jax.jit
    def f_preds(variables, det_outs):
        bound = model.bind(variables)
        return bound.head.detector.get_preds(
            det_outs,
            extra_maps=[[o.obj_emb for o in det_outs],
                        [o.center for o in det_outs]],
            max_obj_per_img=args.max_obj, min_fcos_score=0.04)

    @jax.jit
    def f_subheads(variables, preds, key, value, dense_x2d, dense_mask):
        x2d_small = avg_pool_stride(dense_x2d, cfg.output_stride)
        mask_small = avg_pool_stride(dense_mask, cfg.output_stride)
        return model.apply(
            variables, preds['gathered'][1], preds['gathered'][0], key,
            value, x2d_small, mask_small, preds['strides'],
            preds['img_inds'], preds['labels'], img_flips, img_shapes,
            method=model.subheads)

    @jax.jit
    def f_pnp(sub, preds, rng):
        noc = sub.noc_list[-1]
        w2d = sub.w2d_list[-1] * sub.scale[:, None, :]
        x3d = noc * sub.dim_dec[:, None]
        camera = PerspectiveCamera.from_img_shape(
            cam[preds['img_inds']], ori_shapes[preds['img_inds']],
            z_min=0.1, allowed_border=200.0)
        cost_fun = AdaptiveHuberPnPCost(
            relative_delta=cfg.pnp.relative_delta).set_param(sub.x2d, w2d)
        pose_opt, _, _, _ = pnp(
            x3d, sub.x2d, w2d, camera, cost_fun, rng=rng, fast_mode=True)
        return pose_opt

    @jax.jit
    def f_post(sub, preds, pose_opt):
        img_inds, labels = preds['img_inds'], preds['labels']
        bbox_3d = jnp.concatenate([sub.dim_dec, pose_opt], axis=-1)
        bbox_2d, bbox_2d_mask = bboxes_3d_to_2d(
            bbox_3d, cam[img_inds], ori_shapes[img_inds])
        combined = preds['score'] * jax.nn.sigmoid(sub.score_pred)
        alive = preds['valid'] & bbox_2d_mask
        span = jnp.max(bbox_2d) + 1.0
        boxes_off = bbox_2d + (labels.astype(bbox_2d.dtype) * span)[:, None]
        alive = alive & nms_axis_aligned_per_image(
            boxes_off, combined, 0.8, bs, valid_mask=alive)
        bev_in = jnp.concatenate([bbox_3d, combined[:, None]], axis=-1)
        alive = alive & batched_bev_nms_per_image(
            jnp.where(alive[:, None], bev_in,
                      jnp.asarray([1, 1, 1, 1e6, 0, 1e6, 0, -1.0])),
            labels, bs, nms_thr=0.25)
        return alive

    print(f'devices={jax.devices()}  shape={bs}x{h}x{w}  '
          f'bf16={args.bf16} pallas={args.pallas}')
    it = args.iters

    if args.split_dense:
        # Fine-grained attribution of the det_dense stage + MFU estimate.
        def backbone_fn(m, img):
            return m.backbone(img, train=False)

        def feat_fn(m, img):
            return m.extract_feat(img, train=False)

        def fcos_fn(m, feats):
            lo, hi = m.head.det_lvl_range
            return m.head.detector(feats[lo:hi])

        def head_dense_fn(m, feats):
            return m.head.forward_det_dense(feats, img_shape)

        jfn = lambda f: jax.jit(  # noqa: E731
            lambda variables, x: model.apply(variables, x, method=f))
        feats, tf = timed(jfn(feat_fn), (variables, img), it,
                          'backbone+fpn')
        _, tb = timed(jfn(backbone_fn), (variables, img), it, 'backbone')
        print(f'{"fpn":>12}: {(tf - tb) * 1e3:8.2f} ms (derived)')
        _, tfc = timed(jfn(fcos_fn), (variables, feats), it, 'fcos_towers')
        _, thd = timed(jfn(head_dense_fn), (variables, feats), it,
                       'head_dense')
        print(f'{"corr+kv":>12}: {(thd - tfc) * 1e3:8.2f} ms (derived)')
        # FLOP estimates from XLA cost analysis -> MFU per sub-stage
        peak = args.peak_tflops * 1e12
        for name, f, x, dt in (('backbone+fpn', feat_fn, img, tf),
                               ('fcos_towers', fcos_fn, feats, tfc),
                               ('head_dense', head_dense_fn, feats, thd)):
            try:
                lowered = jax.jit(
                    lambda variables, x, _f=f: model.apply(
                        variables, x, method=_f)).lower(variables, x)
                ca = lowered.compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get('flops', float('nan')))
                mfu = flops / dt / peak
                print(f'{name:>12}: {flops / 1e9:8.1f} GFLOP  '
                      f'MFU {mfu * 100:5.1f}% (peak {args.peak_tflops} '
                      f'TFLOP/s)')
            except Exception as e:  # noqa: BLE001
                print(f'{name:>12}: cost_analysis unavailable ({e})')

    (det_outs, key, value), t1 = timed(
        f_dense, (variables, img), it, 'det_dense')
    preds, t2 = timed(f_preds, (variables, det_outs), it, 'get_preds')
    sub, t3 = timed(f_subheads,
                    (variables, preds, key, value, dense_x2d, dense_mask),
                    it, 'subheads')
    pose_opt, t4 = timed(f_pnp, (sub, preds, rng), it, 'pnp')
    _, t5 = timed(f_post, (sub, preds, pose_opt), it, 'post')
    total_stages = t1 + t2 + t3 + t4 + t5
    print(f'{"sum(stages)":>12}: {total_stages * 1e3:8.2f} ms')

    # ---- bisect the fused path: truncated fused functions ----
    full_infer = make_inference_fn(model, cfg, max_obj_per_img=args.max_obj)

    def make_truncated(upto):
        def infer(variables, img, cam_intrinsic, img_shapes, ori_shapes,
                  img_flips, img_dense_x2d, img_dense_x2d_mask, rng):
            img_shape = (img.shape[1], img.shape[2])
            det_outs, key, value = model.apply(
                variables, img, img_shape, train=False,
                method=model.det_dense)
            if upto == 'dense':
                return det_outs, key, value
            bound = model.bind(variables)
            preds = bound.head.detector.get_preds(
                det_outs,
                extra_maps=[[o.obj_emb for o in det_outs],
                            [o.center for o in det_outs]],
                max_obj_per_img=args.max_obj, min_fcos_score=0.04)
            if upto == 'preds':
                return preds
            x2d_small = avg_pool_stride(img_dense_x2d, cfg.output_stride)
            mask_small = avg_pool_stride(img_dense_x2d_mask,
                                         cfg.output_stride)
            sub = model.apply(
                variables, preds['gathered'][1], preds['gathered'][0], key,
                value, x2d_small, mask_small, preds['strides'],
                preds['img_inds'], preds['labels'], img_flips, img_shapes,
                method=model.subheads)
            if upto == 'subheads':
                return sub
            noc = sub.noc_list[-1]
            w2d = sub.w2d_list[-1] * sub.scale[:, None, :]
            x3d = noc * sub.dim_dec[:, None]
            camera = PerspectiveCamera.from_img_shape(
                cam_intrinsic[preds['img_inds']],
                ori_shapes[preds['img_inds']], z_min=0.1,
                allowed_border=200.0)
            cost_fun = AdaptiveHuberPnPCost(
                relative_delta=cfg.pnp.relative_delta).set_param(
                    sub.x2d, w2d)
            pose_opt, _, _, _ = pnp(x3d, sub.x2d, w2d, camera, cost_fun,
                                    rng=rng, fast_mode=True)
            return pose_opt
        return infer

    fused_args = (variables, img, cam, img_shapes, ori_shapes, img_flips,
                  dense_x2d, dense_mask, rng)
    for upto in ('dense', 'preds', 'subheads', 'pnp'):
        timed(jax.jit(make_truncated(upto)), fused_args, it,
              f'fused->{upto}')
    _, tf = timed(jax.jit(full_infer), fused_args, it, 'fused e2e')
    print(f'{"img/s":>12}: {bs / tf:8.2f}')


if __name__ == '__main__':
    main()
