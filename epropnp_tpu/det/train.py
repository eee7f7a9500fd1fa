"""Functional training step for the Det suite.

One jitted function runs: backbone/FPN/FCOS forward, VolumeCenter targets,
FCOS losses, importance object sampling, deformable-correspondence
subheads, Monte Carlo pose loss (AMIS), 3D-score + derivative
regularization from a deterministic solve, auxiliary dense RoI
reprojection/regression losses, velocity/attribute losses, and the AdamW
update with gradient clipping.

Reference recipe: EPro-PnP-Det/epropnp_det/models/dense_heads/
deform_pnp_head.py:743-1044 (see per-block citations).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.bbox_3d.center_target import VolumeCenter
from ..core.bbox_3d.coders import DistDimProjErrorCoder, MultiClassLogDimCoder
from ..core.bbox_3d.misc import project_to_image
from ..models.dense_heads.deform_pnp_head import HeadEMAState, obj_sampler
from ..models.losses.det_losses import (
    cosine_angle_loss,
    mvd_gaussian_mixture_nll_loss,
    smooth_l1_loss_mod,
    weight_reduce_loss,
)
from ..models.losses.monte_carlo_pose_loss import monte_carlo_pose_loss
from ..ops.inter_roi_ops import logsoftmax_across_rois
from ..ops.pnp import (
    AdaptiveHuberPnPCost,
    EProPnP4DoF,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)
from .config import DetConfig


class DetBatch(NamedTuple):
    """Fixed-shape training batch (G = max GT per image, P = lidar pts)."""
    img: jnp.ndarray                 # (n, H, W, 3)
    cam_intrinsic: jnp.ndarray       # (n, 3, 3)
    img_shapes: jnp.ndarray          # (n, 2) augmented [h, w]
    ori_shapes: jnp.ndarray          # (n, 2)
    img_flips: jnp.ndarray           # (n,) bool
    img_dense_x2d: jnp.ndarray       # (n, H, W, 2)
    img_dense_x2d_mask: jnp.ndarray  # (n, H, W, 1)
    gt_bboxes: jnp.ndarray           # (n, G, 4)
    gt_bboxes_3d: jnp.ndarray        # (n, G, 7) [l,h,w,x,y,z,ry]
    gt_labels: jnp.ndarray           # (n, G) int
    gt_mask: jnp.ndarray             # (n, G) bool
    gt_velo: jnp.ndarray             # (n, G, 2)
    gt_attr: jnp.ndarray             # (n, G) int
    gt_x3d: Optional[jnp.ndarray] = None   # (n, G, P, 3)
    gt_x2d: Optional[jnp.ndarray] = None   # (n, G, P, 2)
    gt_pts_mask: Optional[jnp.ndarray] = None  # (n, G, P)


def build_pnp(cfg: DetConfig) -> EProPnP4DoF:
    p = cfg.pnp
    return EProPnP4DoF(
        mc_samples=p.mc_samples, num_iter=p.num_iter, normalize=p.normalize,
        solver=LMSolver(
            dof=4, num_iter=p.lm_num_iter, normalize=p.normalize,
            use_pallas=p.use_pallas,
            init_solver=RSLMSolver(
                dof=4, num_points=p.rs_num_points,
                num_proposals=p.rs_num_proposals, num_iter=p.rs_num_iter,
                use_pallas=p.use_pallas,
                fast_sampling=p.use_pallas)))


def avg_pool_stride(x, stride: int):
    n, h, w, c = x.shape
    return x.reshape(n, h // stride, stride, w // stride, stride, c).mean(
        axis=(2, 4))


def compute_losses(model, cfg: DetConfig, params, batch_stats,
                   batch: DetBatch, ema: HeadEMAState, rng,
                   axis_name: Optional[str] = None):
    """Returns (total_loss, (loss_dict, new_batch_stats, new_ema))."""
    n_img, gmax = batch.gt_labels.shape
    g_total = n_img * gmax
    s_total = cfg.train.num_obj_samples_per_img * n_img
    dim_coder = MultiClassLogDimCoder()
    proj_coder = DistDimProjErrorCoder()
    pnp = build_pnp(cfg)
    k_sampler, k_pnp = jax.random.split(rng)

    variables = {'params': params, 'batch_stats': batch_stats}
    x2d_small = avg_pool_stride(batch.img_dense_x2d, cfg.output_stride)
    x2d_mask_small = avg_pool_stride(batch.img_dense_x2d_mask,
                                     cfg.output_stride)

    # ---- flatten GT across images (reference :765-781) ----
    flat = lambda a: a.reshape((g_total,) + a.shape[2:])  # noqa: E731
    gt_boxes_f = flat(batch.gt_bboxes)
    gt_b3d_f = flat(batch.gt_bboxes_3d)
    gt_labels_f = flat(batch.gt_labels)
    gt_img_inds = jnp.repeat(jnp.arange(n_img), gmax)
    gt_flips_f = batch.img_flips[gt_img_inds]

    # ---- center targets (reference :778-782, VolumeCenter) ----
    ct = VolumeCenter(output_stride=cfg.output_stride).get_centers_2d(
        gt_boxes_f, gt_b3d_f, gt_img_inds, x2d_small, x2d_mask_small,
        batch.cam_intrinsic, obj_mask=flat(batch.gt_mask))
    centers2d_f = ct.centers_2d
    gt_valid_f = ct.valid_mask
    # sanitize padded/invalid GT slots: zero-size boxes and zero dims
    # otherwise produce inf in downstream ratios, which survive masking
    # as inf * 0 = NaN
    safe_b3d = jnp.asarray([1., 1., 1., 0., 0., 10., 0.], gt_b3d_f.dtype)
    gt_b3d_f = jnp.where(gt_valid_f[:, None], gt_b3d_f, safe_b3d)
    safe_box = jnp.asarray([0., 0., 8., 8.], gt_boxes_f.dtype)
    gt_boxes_f = jnp.where(gt_valid_f[:, None], gt_boxes_f, safe_box)

    # ---- network dense forward ----
    img_shape = (batch.img.shape[1], batch.img.shape[2])

    def dense_fwd(variables, img):
        return model.apply(variables, img, img_shape, train=True,
                           method=model.det_dense, mutable=['batch_stats'])

    if cfg.remat_dense:
        # recompute the dense activations in the backward pass instead of
        # keeping them in HBM (full-image activations dominate the train
        # footprint; see DetConfig.remat_dense)
        dense_fwd = jax.checkpoint(dense_fwd)
    (det_outs, key, value), new_model_state = dense_fwd(
        variables, batch.img)
    # bound copy exposes submodules for their pure (param-free) math
    detector = model.bind(variables).head.detector

    # ---- FCOS targets + losses (reference :808-837) ----
    pts_per_lvl = [o.points for o in det_outs]
    labels, ctr_targets, gt_inds_local = detector.get_targets(
        pts_per_lvl,
        batch.gt_bboxes, batch.gt_labels,
        batch.gt_mask & gt_valid_f.reshape(n_img, gmax),
        centers2d_f.reshape(n_img, gmax, 2))

    def flat_map(per_lvl):
        return jnp.concatenate(
            [m.reshape(n_img, -1, m.shape[-1]) for m in per_lvl], axis=1
        ).reshape(-1, per_lvl[0].shape[-1])

    flat_cls = flat_map([o.cls_score for o in det_outs])
    flat_center = flat_map([o.center for o in det_outs])
    flat_ctr = flat_map([o.centerness for o in det_outs])[:, 0]
    flat_emb = flat_map([o.obj_emb for o in det_outs])
    flat_strides = jnp.tile(jnp.concatenate([
        jnp.full((o.points.shape[0],), s, flat_cls.dtype)
        for o, s in zip(det_outs, detector.strides)]), (n_img,))
    flat_labels = labels.reshape(-1)
    flat_ctr_t = ctr_targets.reshape(-1)
    # global GT index (img * gmax + local)
    flat_gt_inds = (gt_inds_local
                    + jnp.arange(n_img)[:, None] * gmax).reshape(-1)

    losses = detector.loss(flat_cls, flat_center, flat_ctr, flat_labels,
                           flat_gt_inds, flat_ctr_t, centers2d_f, gt_boxes_f,
                           axis_name=axis_name)

    # ---- object sampling (reference :839-853 -> :1112) ----
    fg_mask = flat_labels < cfg.num_classes
    (pt_inds, s_gt_inds, s_weights, s_uweights, s_valid) = obj_sampler(
        k_sampler, s_total, fg_mask, flat_ctr_t, flat_gt_inds, g_total,
        uniform_mix_ratio=cfg.train.uniform_mix_ratio)
    s_img_inds = gt_img_inds[s_gt_inds]
    s_labels = gt_labels_f[s_gt_inds]
    s_b3d = gt_b3d_f[s_gt_inds]                       # (S, 7)
    obj_emb_s = flat_emb[pt_inds]
    center_s = flat_center[pt_inds]
    stride_s = flat_strides[pt_inds]

    # ---- subheads ----
    sub = model.apply(
        variables, center_s, obj_emb_s, key, value, x2d_small,
        x2d_mask_small, stride_s, s_img_inds, s_labels, batch.img_flips,
        batch.img_shapes, method=model.subheads)

    # ---- dim loss (reference :862-867) ----
    dim_targets = dim_coder.encode(s_b3d[:, :3], s_labels)
    losses['loss_dim'] = smooth_l1_loss_mod(
        sub.dim_enc, dim_targets, beta=1.0, weight=s_weights[:, None],
        reduction='sum') / (s_total * 3) * cfg.loss.dim

    # ---- Monte Carlo pose loss per stage (reference :869-883) ----
    camera = PerspectiveCamera.from_img_shape(
        batch.cam_intrinsic[s_img_inds], batch.ori_shapes[s_img_inds],
        z_min=0.1, allowed_border=200.0)
    norm_factor = jnp.sum(sub.scale * s_weights[:, None]) \
        / jnp.maximum(sub.scale.shape[0] * 2, 1)
    pose_tgt = s_b3d[:, 3:]                           # (S, 4) [x,y,z,ry]
    new_mc_states = []
    for stage_id, (noc, w2d) in enumerate(zip(sub.noc_list, sub.w2d_list)):
        x3d = noc * sub.dim_dec[:, None]
        w2d_scaled = w2d * sub.scale[:, None, :]
        cost_fun = AdaptiveHuberPnPCost(
            relative_delta=cfg.pnp.relative_delta).set_param(
            jax.lax.stop_gradient(sub.x2d), w2d_scaled)
        _, _, _, _, logweights, cost_tgt = pnp.monte_carlo_forward(
            x3d, sub.x2d, w2d_scaled, camera, cost_fun,
            rng=jax.random.fold_in(k_pnp, stage_id), pose_init=pose_tgt,
            force_init_solve=True)
        loss_pose, new_mc = monte_carlo_pose_loss(
            logweights, cost_tgt, norm_factor,
            ema.pose_norm_factor[stage_id], momentum=0.01, training=True,
            axis_name=axis_name, weight=s_weights, avg_factor=float(s_total),
            loss_weight=1.0)
        new_mc_states.append(new_mc)
        losses[f'loss_pose_{stage_id}'] = loss_pose * cfg.loss.pose

    # ---- 3D score + derivative regularization (reference :885-927) ----
    noc, w2d = sub.noc_list[-1], sub.w2d_list[-1]
    cost_fun_det = AdaptiveHuberPnPCost(
        relative_delta=cfg.pnp.relative_delta).set_param(
        jax.lax.stop_gradient(sub.x2d),
        w2d * jax.lax.stop_gradient(sub.scale)[:, None, :])
    cost_fun_det = cost_fun_det.replace(
        delta=jax.lax.stop_gradient(cost_fun_det.delta))
    pose_opt, _, _, pose_opt_plus = pnp(
        noc * jax.lax.stop_gradient(sub.dim_dec)[:, None],
        sub.x2d,
        w2d * jax.lax.stop_gradient(sub.scale)[:, None, :],
        camera, cost_fun_det, rng=jax.random.fold_in(k_pnp, 99),
        with_pose_opt_plus=True)
    te = jnp.linalg.norm(
        pose_opt[:, [0, 2]] - s_b3d[:, [3, 5]], axis=1)
    losses['ate'] = jnp.sum(te * s_weights) / jnp.maximum(
        jnp.sum(s_valid), 1)
    score_targets = jnp.clip(
        (-jnp.log2(jnp.maximum(te, 1e-12)) + 2.5) / 4.0, 0.0, 1.0)
    score_targets = jax.lax.stop_gradient(score_targets)
    bce = (jax.nn.softplus(-sub.score_pred) * score_targets
           + jax.nn.softplus(sub.score_pred) * (1.0 - score_targets))
    losses['loss_score'] = weight_reduce_loss(
        bce, s_uweights, 'sum') / s_total * cfg.loss.score
    losses['loss_reg_pos'] = smooth_l1_loss_mod(
        jnp.linalg.norm(pose_opt_plus[:, :3] - s_b3d[:, 3:6], axis=-1), -1,
        beta=cfg.loss.reg_pos_beta, weight=s_weights,
        reduction='sum') / s_total * cfg.loss.reg_pos
    losses['loss_reg_orient'] = cosine_angle_loss(
        pose_opt_plus[:, 3], s_b3d[:, 6], weight=s_weights,
        reduction='sum') / s_total * cfg.loss.reg_orient

    # ---- auxiliary dense losses over GT RoIs (reference :929-1025) ----
    new_proj_ema = ema.proj_mean_inv_std
    rh, rw = cfg.train.roi_shape
    # active = GT slots referenced by any valid sample
    act_onehot = (s_gt_inds[:, None] == jnp.arange(g_total)[None, :]) \
        & s_valid[:, None]                            # (S, G)
    act_mask = jnp.any(act_onehot, axis=0) & gt_valid_f
    num_act = jnp.sum(act_mask.astype(flat_cls.dtype))
    # normalized sample->GT mixing weights (reference sample_to_act)
    s2a = (act_onehot * s_weights[:, None]).T          # (G, S)
    s2a = s2a / jnp.maximum(jnp.sum(s2a, axis=-1, keepdims=True), 1e-12)

    x2d_roi, key_roi, value_roi = model.apply(
        variables, gt_img_inds, gt_boxes_f, batch.img_dense_x2d, key, value,
        (rh, rw), method=model.extract_rois)
    noc_roi, logstd_roi = model.apply(
        variables, value_roi, gt_flips_f, method=model.roi_regr)
    # (G, 1, rh*rw, 2)
    x2d_tgt = x2d_roi.reshape(g_total, 1, rh * rw, 2)

    dim_dec_act = jax.lax.stop_gradient(s2a @ sub.dim_dec)   # (G, 3)
    x3d_roi = noc_roi * dim_dec_act[:, None, None, :]
    heads = noc_roi.shape[1]
    x2d_proj = project_to_image(
        x3d_roi.reshape(g_total, heads * rh * rw, 3), gt_b3d_f[:, 3:],
        batch.cam_intrinsic[gt_img_inds], batch.ori_shapes[gt_img_inds],
        z_min=0.5, allowed_border=200.0
    ).reshape(g_total, heads, rh * rw, 2)
    proj_error = proj_coder.encode(
        x2d_proj - x2d_tgt, gt_b3d_f[:, None, 5:6], gt_b3d_f[:, None, :3],
        batch.cam_intrinsic[gt_img_inds][:, 0, 0, None, None]
    ).reshape(g_total, heads, rh, rw, 2)

    head_dim = model.embed_dims // heads
    query_act = (s2a @ sub.query.reshape(s_total, -1)).reshape(
        g_total, heads, 1, head_dim)
    attn = (query_act @ key_roi.reshape(
        g_total, rh * rw, heads, head_dim).transpose(0, 2, 3, 1)
    ).reshape(g_total, heads, rh, rw) / jnp.sqrt(
        jnp.asarray(head_dim, flat_cls.dtype))
    # cross-RoI normalization: inactive rois get unique ids so they never
    # mix into the active mixtures
    roi_ids_eff = jnp.where(act_mask, gt_img_inds,
                            n_img + jnp.arange(g_total))
    attn_hwc = jnp.moveaxis(attn, 1, -1)               # (G, rh, rw, heads)
    attn_ls = logsoftmax_across_rois(attn_hwc, gt_boxes_f, roi_ids_eff,
                                     extra_axis=-1)
    attn_ls = jnp.moveaxis(attn_ls, -1, 1)             # (G, heads, rh, rw)

    if cfg.loss.proj > 0:
        loss_proj_raw, new_proj_ema = mvd_gaussian_mixture_nll_loss(
            proj_error, 0,
            logstd=jnp.moveaxis(
                logstd_roi.reshape(g_total, heads, rh, rw, 2), 0, 0),
            logmixweight=attn_ls,
            mean_inv_std=ema.proj_mean_inv_std,
            roi_boxes=gt_boxes_f, roi_img_ids=roi_ids_eff,
            axis_name=axis_name,
            weight=act_mask[:, None, None].astype(flat_cls.dtype),
            reduction='sum')
        num_act_r = num_act
        if axis_name is not None:
            num_act_r = jax.lax.pmean(num_act, axis_name)
        losses['loss_proj'] = loss_proj_raw / (
            jnp.maximum(num_act_r, 1.0) * rh * rw) * cfg.loss.proj

    if cfg.with_loss_regr and batch.gt_x3d is not None:
        gt_x3d_f = flat(batch.gt_x3d)                 # (G, P, 3)
        gt_x2d_f = flat(batch.gt_x2d)
        pts_mask_f = flat(batch.gt_pts_mask)          # (G, P)
        # scatter lidar points into roi bins (reference :998-1021)
        x2d_start = x2d_roi[:, 0, 0, :]               # (G, 2)
        x2d_range = x2d_roi[:, -1, -1, :] - x2d_start
        rel = jnp.clip((gt_x2d_f - x2d_start[:, None])
                       / jnp.maximum(x2d_range[:, None], 1e-6), 0.0, 1.0)
        bins = jnp.round(rel * (jnp.asarray([rw, rh]) - 1)).astype(jnp.int32)
        bin_idx = bins[..., 1] * rw + bins[..., 0]    # (G, P)
        onehot_bins = jax.nn.one_hot(bin_idx, rh * rw,
                                     dtype=flat_cls.dtype) \
            * pts_mask_f[..., None]
        x3d_sum = jnp.einsum('gpc,gpb->gbc', gt_x3d_f, onehot_bins)
        cnt = jnp.sum(onehot_bins, axis=1)            # (G, rh*rw)
        x3d_tgt = x3d_sum / jnp.maximum(cnt, 1.0)[..., None]
        tgt_w = jnp.minimum(cnt, 1.0)
        max_dim = jnp.max(gt_b3d_f[:, :3], axis=-1)
        # safe norm: the diff is exactly zero on inactive slots, where the
        # norm's 0/0 gradient would poison the whole backward pass
        diff_sq = jnp.sum(jnp.square(x3d_roi - x3d_tgt[:, None]), axis=-1)
        regr_err = jnp.sqrt(jnp.maximum(diff_sq, 1e-24)) / jnp.maximum(
            max_dim[:, None, None], 1e-6)
        x3d_w = jax.nn.softmax(
            attn.reshape(g_total, heads, rh * rw), axis=1) \
            * tgt_w[:, None, :] * act_mask[:, None, None]
        w_sum = jnp.sum(x3d_w)
        if axis_name is not None:
            w_sum = jax.lax.pmean(w_sum, axis_name)
        losses['loss_regr'] = smooth_l1_loss_mod(
            regr_err, -1, beta=cfg.loss.regr_beta, weight=x3d_w,
            reduction='sum') / jnp.maximum(w_sum, 1e-4) * cfg.loss.regr

    # ---- velo & attr losses (reference :1027-1042) ----
    if cfg.pred_velo:
        velo_t = flat(batch.gt_velo)[s_gt_inds]
        nan_mask = jnp.isnan(velo_t)
        velo_t = jnp.where(nan_mask, 0.0, velo_t)
        velo_w = s_weights[:, None] * (~nan_mask)
        vw_sum = jnp.maximum(jnp.sum(velo_w), 1.0)
        if axis_name is not None:
            vw_sum = jax.lax.pmean(vw_sum, axis_name)
        losses['loss_velo'] = smooth_l1_loss_mod(
            sub.velo, velo_t, beta=1.0, weight=velo_w,
            reduction='sum') / vw_sum * cfg.loss.velo
    if cfg.pred_attr:
        attr_t = flat(batch.gt_attr)[s_gt_inds]
        logp = jax.nn.log_softmax(sub.attr, axis=-1)
        ce = -jnp.take_along_axis(logp, attr_t[:, None], axis=-1)[:, 0]
        losses['loss_attr'] = weight_reduce_loss(
            ce, s_weights, 'sum') / s_total * cfg.loss.attr

    new_ema = HeadEMAState(pose_norm_factor=tuple(new_mc_states),
                           proj_mean_inv_std=new_proj_ema)
    total = sum(v for k, v in losses.items()
                if k.startswith('loss_'))
    losses['norm_factor'] = new_mc_states[-1].norm_factor
    return total, (losses, new_model_state['batch_stats'], new_ema)


class DetTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: HeadEMAState
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx, num_stages: int = 1):
        params = variables['params']
        return cls(params=params,
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params),
                   ema=HeadEMAState.create(num_stages),
                   step=jnp.zeros((), jnp.int32))


def _sampling_offsets_mask(params):
    """Pytree of bools: True on leaves under a 'sampling_offsets' module."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, 'key', getattr(k, 'name', None)) ==
            'sampling_offsets' for k in path),
        params)


def make_optimizer(cfg: DetConfig, steps_per_epoch: int = 0):
    """AdamW, reference recipe (configs/epropnp_det_basic.py:227-241 +
    runner/hooks/optimizer.py:14-38):

    - base lr 1e-4, weight decay 1e-4;
    - step-LR x0.1 after epochs ``cfg.train.lr_steps`` (=[10, 11]) when
      ``steps_per_epoch`` > 0 (0 = constant lr, e.g. synthetic studies
      that measure per-step convergence);
    - ``sampling_offsets`` parameters at lr_mult 0.1 (paramwise_cfg) —
      applied as a masked post-scale of the AdamW update, which scales
      both the Adam step and the decoupled weight decay exactly like a
      torch param group with group lr = 0.1 * lr;
    - global-norm gradient clip at max_norm 5.0 (the released configs
      put every parameter in the single default clip group).
    """
    if steps_per_epoch > 0 and cfg.train.lr_steps:
        lr = optax.piecewise_constant_schedule(
            cfg.train.lr,
            {int(e) * steps_per_epoch: cfg.train.lr_gamma
             for e in cfg.train.lr_steps})
    else:
        lr = cfg.train.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(lr, weight_decay=cfg.train.weight_decay),
        optax.masked(optax.scale(cfg.train.sampling_offsets_lr_mult),
                     _sampling_offsets_mask))


def make_train_step(model, cfg: DetConfig, tx,
                    axis_name: Optional[str] = None):
    def train_step(state: DetTrainState, batch: DetBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: compute_losses(model, cfg, p, state.batch_stats,
                                     batch, state.ema, rng,
                                     axis_name=axis_name),
            has_aux=True)
        (_, (losses, new_bs, new_ema)), grads = grad_fn(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
        grad_norm = optax.global_norm(grads)
        # per-leaf finiteness, not isfinite(grad_norm): the norm's sum of
        # squares overflows f32 for huge-but-finite gradients
        leaves = [jnp.all(jnp.isfinite(g))
                  for g in jax.tree_util.tree_leaves(grads)]
        ok = leaves[0]
        for l in leaves[1:]:
            ok = ok & l
        # NaN/Inf gradients are zeroed (reference OptimizerHookMod :31-33)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        select = functools.partial(
            jax.tree_util.tree_map, lambda a, b: jnp.where(ok, a, b))
        new_state = state.replace(
            params=select(new_params, state.params),
            batch_stats=new_bs,
            opt_state=select(new_opt, state.opt_state),
            ema=new_ema,
            step=state.step + 1)
        losses['grad_norm'] = grad_norm
        return new_state, losses

    return train_step
