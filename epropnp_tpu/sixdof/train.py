"""Functional training step for the 6DoF suite.

One jitted function runs: CDPN forward -> correspondence construction
(x3d = noc * dim, x2d crop grid, legacy-softmax w2d) -> AMIS Monte Carlo
PnP -> losses -> RMSprop update with NaN-gradient skip. Data-parallel
training shards the batch over a 1-D mesh; gradient/EMA sync is ``pmean``.

Reference recipe: EPro-PnP-6DoF/lib/train.py:136-243 (see docstrings below
for the per-block citations).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.cdpn import CDPN
from ..models.losses.monte_carlo_pose_loss import (
    MonteCarloPoseLossState,
    monte_carlo_pose_loss,
)
from ..ops.pnp import (
    AdaptiveHuberPnPCost,
    EProPnP6DoF,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)
from ..ops.rotation_conversions import matrix_to_quaternion
from .config import SixDoFConfig


def build_epropnp(cfg: SixDoFConfig) -> EProPnP6DoF:
    """Training PnP stack. Reference: lib/train.py:47-57."""
    p = cfg.pnp
    return EProPnP6DoF(
        mc_samples=p.mc_samples,
        num_iter=p.num_iter,
        solver=LMSolver(
            dof=6,
            num_iter=p.lm_num_iter,
            use_pallas=p.use_pallas,
            init_solver=RSLMSolver(
                dof=6,
                num_points=p.rs_num_points,
                num_proposals=p.rs_num_proposals,
                num_iter=p.rs_num_iter,
                use_pallas=p.use_pallas,
                fast_sampling=p.use_pallas)))


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    mc_state: MonteCarloPoseLossState
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx):
        params = variables['params']
        return cls(
            params=params,
            batch_stats=variables.get('batch_stats', {}),
            opt_state=tx.init(params),
            mc_state=MonteCarloPoseLossState.create(),
            step=jnp.zeros((), jnp.int32))


def make_optimizer(cfg: SixDoFConfig, steps_per_epoch: int = 1):
    """RMSprop with per-branch LR groups and step-decay schedule.

    Reference: lib/model.py:35-105 (param groups) + tools/main.py step decay.
    """
    t = cfg.train

    def sched(base_lr):
        if not t.lr_epoch_step:
            return base_lr
        bounds = {e * steps_per_epoch: t.lr_factor for e in t.lr_epoch_step}
        return optax.piecewise_constant_schedule(base_lr, bounds)

    def branch(base_lr):
        return optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=sched(base_lr), decay=t.alpha, eps=t.epsilon,
            momentum=t.momentum)

    def label_fn(params):
        return {k: {'backbone': 'backbone', 'rot_head': 'rot_head',
                    'trans_head': 'trans_head'}.get(k, 'rot_head')
                for k in params}

    tx = optax.multi_transform(
        {'backbone': branch(t.lr_backbone),
         'rot_head': branch(t.lr_rot_head),
         'trans_head': branch(t.lr_trans_head)},
        label_fn)
    if t.clip_grad_norm is not None:
        # The reference 6DoF recipe only SKIPS steps whose grad norm is
        # NaN (lib/train.py:232-243); huge-but-finite Monte Carlo loss
        # spikes (the learned weight scale is unbounded) pass through and
        # can poison training late. Global-norm clipping — the Det
        # suite's OptimizerHookMod behavior — is offered as an opt-in.
        tx = optax.chain(optax.clip_by_global_norm(t.clip_grad_norm), tx)
    return tx


class Batch(NamedTuple):
    """One training batch (device arrays, NHWC images).

    Produced by the LineMOD pipeline (``datasets/lm.py``); semantics follow
    the reference ``__getitem__`` (lib/datasets/lm.py:289-346).
    """
    inp: jnp.ndarray          # (bs, 256, 256, 3) normalized rgb crop
    target_coor: jnp.ndarray  # (bs, 64, 64, 3) GT noc maps
    loss_msk: jnp.ndarray     # (bs, 64, 64, 3) coord-loss mask
    trans_local: jnp.ndarray  # (bs, 3) trans-head target [cx_delta, cy_delta, d]
    pose: jnp.ndarray         # (bs, 3, 4) GT [R|t]
    c_box: jnp.ndarray        # (bs, 2) crop center
    s_box: jnp.ndarray        # (bs,) crop scale
    dim: jnp.ndarray          # (bs, 3) per-class |min extents|


def build_correspondences(noc, w2d, scale, batch: Batch, cam_intrinsic,
                          out_res: int, sample_inds=None):
    """Dense maps -> (x3d, x2d, w2d) point sets + camera bounds.

    Reference: lib/train.py:136-174. ``sample_inds`` (bs, k) selects the
    random point subset (None keeps all out_res^2 points, the test path).
    """
    bs = noc.shape[0]
    assert noc.shape[1] == out_res and noc.shape[2] == out_res, (
        f'dense map resolution {noc.shape[1:3]} != cfg out_res={out_res}; '
        'check DataIterConfig.inp_res/out_res against the batch images')
    x3d = noc * batch.dim[:, None, None, :]                    # (bs, h, w, 3)

    s = jnp.floor(batch.s_box)  # reference casts to int64
    wh_begin = batch.c_box - s[:, None] / 2.0                  # (bs, 2)
    wh_unit = s / out_res                                      # (bs,)

    wh_arange = jnp.arange(out_res, dtype=noc.dtype)
    y, x = jnp.meshgrid(wh_arange, wh_arange, indexing='ij')
    x2d = jnp.stack(
        [wh_begin[:, 0, None, None] + x * wh_unit[:, None, None],
         wh_begin[:, 1, None, None] + y * wh_unit[:, None, None]],
        axis=-1)                                               # (bs, h, w, 2)

    n = out_res * out_res
    x3d = x3d.reshape(bs, n, 3)
    x2d = x2d.reshape(bs, n, 2)
    w2d = w2d.reshape(bs, n, 2)
    if sample_inds is not None:
        take = lambda a: jnp.take_along_axis(  # noqa: E731
            a, sample_inds[..., None], axis=1)
        x3d, x2d, w2d = take(x3d), take(x2d), take(w2d)
        n = sample_inds.shape[1]

    # Legacy softmax: exp(w2d - mean - log N) * scale (lib/train.py:163-167).
    w2d = jnp.exp(
        w2d - jnp.mean(w2d, axis=1, keepdims=True) - math.log(n)
    ) * scale[:, None, :]

    allowed_border = 30.0 * wh_unit
    camera = PerspectiveCamera(
        cam_mats=jnp.broadcast_to(cam_intrinsic, (bs, 3, 3)),
        z_min=0.01,
        lb=wh_begin - allowed_border[:, None],
        ub=wh_begin + (out_res - 1) * wh_unit[:, None]
            + allowed_border[:, None])
    return x3d, x2d, w2d, camera


def pose_gt_from_batch(batch: Batch):
    """(bs, 3, 4) [R|t] -> (bs, 7) [t, q]. Reference: lib/train.py:152-155."""
    rot_quat = matrix_to_quaternion(batch.pose[:, :, :3])
    return jnp.concatenate([batch.pose[:, :, 3], rot_quat], axis=-1)


class LossOutputs(NamedTuple):
    loss: jnp.ndarray
    loss_rot: jnp.ndarray
    loss_trans: jnp.ndarray
    loss_mc: jnp.ndarray
    loss_t: jnp.ndarray
    loss_r: jnp.ndarray
    norm_factor: jnp.ndarray


def compute_losses(model: CDPN, epropnp: EProPnP6DoF, cfg: SixDoFConfig,
                   params, batch_stats, batch: Batch, cam_intrinsic, rng,
                   mc_state: MonteCarloPoseLossState,
                   axis_name: Optional[str] = None):
    """Forward + all 6DoF losses. Returns (loss, aux dict)."""
    k_sample, k_mc = jax.random.split(rng)

    def fwd(variables, inp):
        return model.apply(variables, inp, train=True,
                           mutable=['batch_stats'])

    if cfg.network.remat:
        # recompute CDPN activations in backward (NetworkConfig.remat)
        fwd = jax.checkpoint(fwd)
    outs, new_model_state = fwd(
        {'params': params, 'batch_stats': batch_stats}, batch.inp)
    bs = batch.inp.shape[0]
    out_res = cfg.dataiter.out_res

    # random 1/8 point subsample (lib/train.py:157-162)
    n_dense = out_res * out_res
    sample_inds = jax.vmap(
        lambda k: jax.random.choice(
            k, n_dense, (cfg.dataiter.sample_points,), replace=False)
    )(jax.random.split(k_sample, bs))

    scale = outs.scale
    if cfg.train.w2d_scale_max is not None:
        # soft cap keeps the gradient alive (see config.w2d_scale_max)
        scale = jnp.minimum(scale, cfg.train.w2d_scale_max)
    x3d, x2d, w2d, camera = build_correspondences(
        outs.noc, outs.w2d, scale, batch, cam_intrinsic, out_res,
        sample_inds)
    pose_gt = pose_gt_from_batch(batch)

    cost_fun = AdaptiveHuberPnPCost(
        relative_delta=cfg.pnp.relative_delta).set_param(x2d, w2d)
    _, _, pose_opt_plus, _, pose_sample_logweights, cost_tgt = \
        epropnp.monte_carlo_forward(
            x3d, x2d, w2d, camera, cost_fun, rng=k_mc, pose_init=pose_gt,
            force_init_solve=True, with_pose_opt_plus=True)

    # Monte Carlo loss (lib/train.py:182-183); norm_factor = mean scale
    loss_mc, new_mc_state = monte_carlo_pose_loss(
        pose_sample_logweights, cost_tgt,
        jnp.mean(jax.lax.stop_gradient(scale)), mc_state,
        momentum=0.01, training=True, axis_name=axis_name)

    # derivative regularization (lib/train.py:185-193)
    dist_t = jnp.linalg.norm(pose_opt_plus[:, :3] - pose_gt[:, :3], axis=-1)
    beta = 0.05
    loss_t = jnp.mean(jnp.where(
        dist_t < beta, 0.5 * jnp.square(dist_t) / beta, dist_t - 0.5 * beta))
    dot_quat = jnp.sum(pose_opt_plus[:, 3:] * pose_gt[:, 3:], axis=-1)
    loss_r = jnp.mean((1.0 - jnp.square(dot_quat)) * 2.0)

    # masked L1 coordinate regression (lib/train.py:195-196)
    loss_rot = jnp.mean(jnp.abs(
        batch.loss_msk * outs.noc - batch.loss_msk * batch.target_coor))

    # trans head L2 (lib/train.py:203-204; torch MSELoss = mean square)
    loss_trans = jnp.mean(jnp.square(outs.trans - batch.trans_local))

    w = cfg.loss
    loss = (w.rot_loss_weight * loss_rot
            + w.trans_loss_weight * loss_trans
            + w.mc_loss_weight * loss_mc
            + w.t_loss_weight * loss_t
            + w.r_loss_weight * loss_r)
    aux = LossOutputs(loss, loss_rot, loss_trans, loss_mc, loss_t, loss_r,
                      new_mc_state.norm_factor)
    return loss, (aux, new_model_state['batch_stats'], new_mc_state)


def make_train_step(model: CDPN, epropnp: EProPnP6DoF, cfg: SixDoFConfig, tx,
                    cam_intrinsic, axis_name: Optional[str] = None):
    """Build the jitted train step.

    Mirrors the reference's backward pass: computes the global gradient norm
    and skips the optimizer step when it is non-finite
    (lib/train.py:232-243).
    """

    def train_step(state: TrainState, batch: Batch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: compute_losses(
                model, epropnp, cfg, p, state.batch_stats, batch,
                cam_intrinsic, rng, state.mc_state, axis_name),
            has_aux=True)
        (_, (aux, new_batch_stats, new_mc_state)), grads = grad_fn(
            state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_batch_stats = jax.lax.pmean(new_batch_stats, axis_name)

        grad_norm = optax.global_norm(grads)
        # per-leaf finiteness, not isfinite(grad_norm): the norm's sum of
        # squares overflows f32 for huge-but-finite gradients
        leaves = [jnp.all(jnp.isfinite(g))
                  for g in jax.tree_util.tree_leaves(grads)]
        ok = leaves[0]
        for l in leaves[1:]:
            ok = ok & l
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        # NaN skip: keep old params/opt_state when the grad norm is not finite
        select = functools.partial(jax.tree_util.tree_map,
                                   lambda a, b: jnp.where(ok, a, b))
        new_state = state.replace(
            params=select(new_params, state.params),
            batch_stats=new_batch_stats,
            opt_state=select(new_opt_state, state.opt_state),
            mc_state=new_mc_state,
            step=state.step + 1)
        metrics = aux._asdict()
        metrics['grad_norm'] = grad_norm
        return new_state, metrics

    return train_step
