"""Det-suite inference: one jitted function from images to 3D detections.

Mirrors the reference test flow (deform_pnp_head.py simple_test :623-660,
forward_test :481-505, test_post :506-621, get_bbox_3d_result :1046-1103):
FCOS top-k candidate selection, deformable-correspondence subheads,
fast-mode Gauss-Newton PnP solve, 3D-to-2D boxes, per-(image, class) 2D NMS
then BEV NMS. Fixed shapes throughout — detections come back as a
(K,)-padded structure with a validity mask; the host converts to ragged
per-image/per-class lists.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bbox_3d.misc import batched_bev_nms_per_image, bboxes_3d_to_2d
from ..core.bbox_3d.nms import nms_axis_aligned_per_image
from ..ops.pnp import (
    AdaptiveHuberPnPCost,
    EProPnP4DoF,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)
from .config import DetConfig
from .train import avg_pool_stride


class DetResults(NamedTuple):
    """Fixed-size (K,) detection set; ``valid`` marks live entries."""
    bbox_3d: jnp.ndarray   # (K, 7) [l, h, w, x, y, z, ry]
    bbox_2d: jnp.ndarray   # (K, 4)
    scores: jnp.ndarray    # (K,) 2d score
    scores_3d: jnp.ndarray  # (K,) combined 3d score
    labels: jnp.ndarray    # (K,)
    img_inds: jnp.ndarray  # (K,)
    velo: Optional[jnp.ndarray]    # (K, 2)
    attr: Optional[jnp.ndarray]    # (K, num_attrs) logits
    valid: jnp.ndarray     # (K,) bool


def build_test_pnp(cfg: DetConfig) -> EProPnP4DoF:
    """Test-time solver override: LM iters 10 -> 5 (basic.py:153)."""
    p = cfg.pnp
    return EProPnP4DoF(
        mc_samples=p.mc_samples, num_iter=p.num_iter, normalize=p.normalize,
        solver=LMSolver(
            dof=4, num_iter=p.test_lm_num_iter, normalize=p.normalize,
            use_pallas=p.use_pallas,
            init_solver=RSLMSolver(
                dof=4, num_points=p.rs_num_points,
                num_proposals=p.rs_num_proposals, num_iter=p.rs_num_iter,
                use_pallas=p.use_pallas)))


def make_inference_fn(model, cfg: DetConfig, max_obj_per_img: int = 256,
                      min_fcos_score: float = 0.04,
                      nms_iou2d: float = 0.8, nms_ioubev: float = 0.25):
    """Returns jit-able ``infer(variables, img, batch_meta, rng)``."""
    pnp = build_test_pnp(cfg)

    def infer(variables, img, cam_intrinsic, img_shapes, ori_shapes,
              img_flips, img_dense_x2d, img_dense_x2d_mask, rng):
        n_img = img.shape[0]
        img_shape = (img.shape[1], img.shape[2])
        det_outs, key, value = model.apply(
            variables, img, img_shape, train=False, method=model.det_dense)
        bound = model.bind(variables)
        detector = bound.head.detector

        preds = detector.get_preds(
            det_outs,
            extra_maps=[[o.obj_emb for o in det_outs],
                        [o.center for o in det_outs]],
            max_obj_per_img=max_obj_per_img, min_fcos_score=min_fcos_score)
        img_inds = preds['img_inds']
        labels = preds['labels']
        valid = preds['valid']
        obj_emb = preds['gathered'][0]
        center = preds['gathered'][1]

        x2d_small = avg_pool_stride(img_dense_x2d, cfg.output_stride)
        mask_small = avg_pool_stride(img_dense_x2d_mask, cfg.output_stride)
        sub = model.apply(
            variables, center, obj_emb, key, value, x2d_small, mask_small,
            preds['strides'], img_inds, labels, img_flips, img_shapes,
            method=model.subheads)

        noc = sub.noc_list[-1]
        w2d = sub.w2d_list[-1] * sub.scale[:, None, :]
        x3d = noc * sub.dim_dec[:, None]
        score_3d = jax.nn.sigmoid(sub.score_pred)

        camera = PerspectiveCamera.from_img_shape(
            cam_intrinsic[img_inds], ori_shapes[img_inds], z_min=0.1,
            allowed_border=200.0)
        cost_fun = AdaptiveHuberPnPCost(
            relative_delta=cfg.pnp.relative_delta).set_param(sub.x2d, w2d)
        pose_opt, _, _, _ = pnp(
            x3d, sub.x2d, w2d, camera, cost_fun, rng=rng, fast_mode=True)

        bbox_3d = jnp.concatenate(
            [sub.dim_dec, pose_opt], axis=-1)  # (K, 7)
        bbox_2d, bbox_2d_mask = bboxes_3d_to_2d(
            bbox_3d, cam_intrinsic[img_inds], ori_shapes[img_inds])
        score = preds['score']
        combined = score * score_3d
        alive = valid & bbox_2d_mask

        # per-(image, class) 2D NMS: images via per-image vmap blocks
        # (get_preds layout), classes via the coordinate-offset trick
        span = jnp.max(bbox_2d) + 1.0
        boxes_off = bbox_2d + (labels.astype(bbox_2d.dtype) * span)[:, None]
        keep2d = nms_axis_aligned_per_image(boxes_off, combined, nms_iou2d,
                                            n_img, valid_mask=alive)
        alive = alive & keep2d
        # BEV NMS (rotated)
        bev_in = jnp.concatenate(
            [bbox_3d, combined[:, None]], axis=-1)
        keep_bev = batched_bev_nms_per_image(
            jnp.where(alive[:, None], bev_in,
                      jnp.asarray([1, 1, 1, 1e6, 0, 1e6, 0, -1.0])),
            labels, n_img, nms_thr=nms_ioubev)
        alive = alive & keep_bev

        return DetResults(
            bbox_3d=bbox_3d, bbox_2d=bbox_2d, scores=score,
            scores_3d=combined, labels=labels, img_inds=img_inds,
            velo=sub.velo, attr=sub.attr, valid=alive)

    return infer


def make_tta_inference_fn(model, cfg: DetConfig, max_obj_per_img: int = 256,
                          min_fcos_score: float = 0.04,
                          nms_iou2d: float = 0.8, nms_ioubev: float = 0.25):
    """Horizontal-flip test-time augmentation (reference aug_test :661-717).

    Runs the dense forward on the original and flipped inputs, averages the
    flip-corrected score maps, selects candidates once, gathers
    correspondences from BOTH augmentations (concatenated along the point
    axis), and averages dims/scores/velocity/attributes before one PnP
    solve.
    """
    pnp = build_test_pnp(cfg)

    def infer(variables, img, img_flip, cam_intrinsic, img_shapes,
              ori_shapes, img_dense_x2d, img_dense_x2d_flip,
              img_dense_x2d_mask, rng):
        n_img = img.shape[0]
        img_shape = (img.shape[1], img.shape[2])
        outs0, key0, value0 = model.apply(
            variables, img, img_shape, train=False, method=model.det_dense)
        outs1, key1, value1 = model.apply(
            variables, img_flip, img_shape, train=False,
            method=model.det_dense)
        bound = model.bind(variables)
        detector = bound.head.detector

        # average flip-corrected score maps (reference :678-679)
        avg_outs = []
        for o0, o1 in zip(outs0, outs1):
            avg_outs.append(o0._replace(
                cls_score=(o0.cls_score + o1.cls_score[:, :, ::-1]) / 2,
                centerness=(o0.centerness + o1.centerness[:, :, ::-1]) / 2))
        preds = detector.get_preds(
            avg_outs,
            extra_maps=[[o.obj_emb for o in outs0],
                        [o.obj_emb[:, :, ::-1] for o in outs1],
                        [o.center for o in outs0],
                        [o.center[:, :, ::-1] for o in outs1]],
            max_obj_per_img=max_obj_per_img, min_fcos_score=min_fcos_score)
        img_inds, labels, valid = (preds['img_inds'], preds['labels'],
                                   preds['valid'])
        emb0, emb1, center0, center1 = preds['gathered']

        mask_small = avg_pool_stride(img_dense_x2d_mask, cfg.output_stride)
        x2d_small0 = avg_pool_stride(img_dense_x2d, cfg.output_stride)
        x2d_small1 = avg_pool_stride(img_dense_x2d_flip, cfg.output_stride)
        flips0 = jnp.zeros((n_img,), bool)
        flips1 = jnp.ones((n_img,), bool)
        # the flipped branch's center VALUES are already in flipped pixel
        # space (its maps were only flipped spatially for gathering), so
        # they address the flipped key/value maps directly (reference
        # :683-699 passes them through unchanged)
        sub0 = model.apply(
            variables, center0, emb0, key0, value0, x2d_small0, mask_small,
            preds['strides'], img_inds, labels, flips0, img_shapes,
            method=model.subheads)
        sub1 = model.apply(
            variables, center1, emb1, key1, value1, x2d_small1,
            mask_small, preds['strides'], img_inds, labels, flips1,
            img_shapes, method=model.subheads)

        dim_dec = (sub0.dim_dec + sub1.dim_dec) / 2
        score_3d = (jax.nn.sigmoid(sub0.score_pred)
                    + jax.nn.sigmoid(sub1.score_pred)) / 2
        noc = jnp.concatenate([sub0.noc_list[-1], sub1.noc_list[-1]], axis=1)
        x2d = jnp.concatenate([sub0.x2d, sub1.x2d], axis=1)
        w2d = jnp.concatenate(
            [sub0.w2d_list[-1] * sub0.scale[:, None, :],
             sub1.w2d_list[-1] * sub1.scale[:, None, :]], axis=1) / 2
        x3d = noc * dim_dec[:, None]
        velo = None if sub0.velo is None else (sub0.velo + sub1.velo) / 2
        attr = None if sub0.attr is None else (sub0.attr + sub1.attr) / 2

        camera = PerspectiveCamera.from_img_shape(
            cam_intrinsic[img_inds], ori_shapes[img_inds], z_min=0.1,
            allowed_border=200.0)
        cost_fun = AdaptiveHuberPnPCost(
            relative_delta=cfg.pnp.relative_delta).set_param(x2d, w2d)
        pose_opt, _, _, _ = pnp(
            x3d, x2d, w2d, camera, cost_fun, rng=rng, fast_mode=True)

        bbox_3d = jnp.concatenate([dim_dec, pose_opt], axis=-1)
        bbox_2d, bbox_2d_mask = bboxes_3d_to_2d(
            bbox_3d, cam_intrinsic[img_inds], ori_shapes[img_inds])
        score = preds['score']
        combined = score * score_3d
        alive = valid & bbox_2d_mask
        span = jnp.max(bbox_2d) + 1.0
        boxes_off = bbox_2d + (labels.astype(bbox_2d.dtype) * span)[:, None]
        alive = alive & nms_axis_aligned_per_image(
            boxes_off, combined, nms_iou2d, n_img, valid_mask=alive)
        bev_in = jnp.concatenate([bbox_3d, combined[:, None]], axis=-1)
        alive = alive & batched_bev_nms_per_image(
            jnp.where(alive[:, None], bev_in,
                      jnp.asarray([1, 1, 1, 1e6, 0, 1e6, 0, -1.0])),
            labels, n_img, nms_thr=nms_ioubev)
        return DetResults(bbox_3d=bbox_3d, bbox_2d=bbox_2d, scores=score,
                          scores_3d=combined, labels=labels,
                          img_inds=img_inds, velo=velo, attr=attr,
                          valid=alive)

    return infer


def mc_score_and_orient_density(cfg: DetConfig, x3d, x2d, w2d, camera,
                                cost_fun, pose_opt, rng,
                                mc_scoring_ratio: float = 0.0,
                                orient_bins: int = 128,
                                score_3d=None):
    """Optional Monte Carlo rescoring + yaw-density grid.

    Reference: test_post :518-551 — MC sampling refines the 3D score via
    the expected translation-error score of the pose samples; the
    orientation density evaluates the cost over a uniform yaw grid and
    log-softmax-normalizes it into a circular log-density.
    """
    from ..ops.pnp.common import evaluate_pnp
    pnp = build_test_pnp(cfg)
    out = {}
    if mc_scoring_ratio > 0:
        _, _, _, pose_samples, logweights, _ = pnp.monte_carlo_forward(
            x3d, x2d, w2d, camera, cost_fun, rng=rng, fast_mode=True)
        weights = jax.nn.softmax(logweights, axis=0)
        dev = jnp.linalg.norm(
            pose_samples[..., [0, 2]] - pose_opt[None, :, [0, 2]], axis=-1)
        score_mc = jnp.clip(
            (-jnp.log2(jnp.maximum(dev, 1e-12)) + 2.5) / 4.0, 0.0, 1.0)
        score_mc = jnp.sum(score_mc * weights, axis=0)
        out['pose_samples'] = pose_samples
        out['pose_sample_weights'] = weights
        if score_3d is not None:
            out['score_3d'] = (score_3d ** (1 - mc_scoring_ratio)
                               * score_mc ** mc_scoring_ratio)
        else:
            out['score_3d'] = score_mc
    if orient_bins > 0:
        grid = jnp.linspace(0.0, 2 * np.pi * (orient_bins - 1) / orient_bins,
                            orient_bins, dtype=pose_opt.dtype)
        pose_grid = jnp.broadcast_to(
            pose_opt[None], (orient_bins,) + pose_opt.shape)
        pose_grid = pose_grid.at[..., 3].set(grid[:, None])
        cost = evaluate_pnp(x3d, x2d, w2d, pose_grid, camera, cost_fun,
                            out_cost=True).cost
        out['orient_logprob'] = jnp.swapaxes(
            jax.nn.log_softmax(-cost, axis=0)
            + np.log(orient_bins / (2 * np.pi)), 0, 1)
    return out


def results_to_numpy(results: DetResults, num_img: int, num_classes: int):
    """Fixed-size device results -> per-image per-class ragged numpy lists.

    Matches the reference output structure (get_bbox_3d_result :1085-1103):
    ``bbox_3d_results[img][cls]`` = (m, 9+) array
    [l, h, w, x, y, z, ry, score, velo_x, velo_y, attr_logits...].
    """
    r = jax.device_get(results)
    valid = np.asarray(r.valid)
    out_2d, out_3d = [], []
    for i in range(num_img):
        per_img_2d, per_img_3d = [], []
        for c in range(num_classes):
            m = valid & (np.asarray(r.img_inds) == i) \
                & (np.asarray(r.labels) == c)
            bbox2d = np.concatenate(
                [np.asarray(r.bbox_2d)[m],
                 np.asarray(r.scores)[m][:, None]], axis=-1)
            cols = [np.asarray(r.bbox_3d)[m],
                    np.asarray(r.scores_3d)[m][:, None]]
            if r.velo is not None:
                cols.append(np.asarray(r.velo)[m])
            if r.attr is not None:
                attr_id = np.argmax(np.asarray(r.attr)[m], axis=-1)
                cols.append(attr_id[:, None].astype(np.float64))
            per_img_2d.append(bbox2d)
            per_img_3d.append(np.concatenate(cols, axis=-1))
        out_2d.append(per_img_2d)
        out_3d.append(per_img_3d)
    return out_2d, out_3d
