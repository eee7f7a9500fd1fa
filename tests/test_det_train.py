"""Full Det-suite training step on a miniature detector (end-to-end smoke).

Exercises the whole reference pipeline (deform_pnp_head.py:743-1044) at toy
scale: VolumeCenter targets, FCOS losses, object sampling, deformable
attention + per-point transformer correspondences, AMIS Monte Carlo pose
loss, score/derivative-regularization losses from a deterministic solve,
auxiliary RoI reprojection + coordinate regression losses, velo/attr
losses, AdamW update.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epropnp_tpu.det import train as dtrain
from epropnp_tpu.det.config import (
    DetConfig, DetLossWeights, DetPnPConfig, DetTrainConfig)
from epropnp_tpu.models.detectors.epropnp_det import EProPnPDet

H = W = 64
NCLS = 3
GMAX = 4
PMAX = 16


def tiny_cfg():
    return DetConfig(
        num_classes=NCLS,
        backbone_depth=18,
        embed_dims=32,
        num_heads=4,
        num_points=4,
        strides=(4, 8, 16, 32),
        output_stride=4,
        with_loss_regr=True,
        num_attrs=4,
        pnp=DetPnPConfig(mc_samples=16, num_iter=2, lm_num_iter=2,
                         rs_num_points=8, rs_num_proposals=4, rs_num_iter=1),
        train=DetTrainConfig(num_obj_samples_per_img=4, roi_shape=(8, 8),
                             max_gt_per_img=GMAX))


def tiny_model(cfg):
    return EProPnPDet(
        num_classes=cfg.num_classes,
        backbone_depth=cfg.backbone_depth,
        backbone_dcn_stages=(),
        embed_dims=cfg.embed_dims,
        num_heads=cfg.num_heads,
        num_points=cfg.num_points,
        strides=cfg.strides,
        output_stride=cfg.output_stride,
        num_attrs=cfg.num_attrs,
        dcn_on_last_conv=False,
        detector_cfg=dict(
            feat_channels=32, emb_channels=cfg.embed_dims,
            cls_branch=(32,), centerness_branch=(16,), offset_branch=(32,),
            emb_branch=(32,),
            # FCOS runs on strides 8..32 (detector derives
            # det_lvl_range from strides like the reference configs)
            regress_ranges=((-1, 16), (16, 32), (32, 1e8))))


def make_batch(seed=0, n_img=2):
    r = np.random.default_rng(seed)
    K = np.array([[60., 0., W / 2], [0., 60., H / 2], [0., 0., 1.]])
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dense = np.stack([xs, ys], -1)[None].repeat(n_img, 0)

    # GT boxes in front of the camera projecting inside the image
    g3d = np.zeros((n_img, GMAX, 7), np.float32)
    g2d = np.zeros((n_img, GMAX, 4), np.float32)
    mask = np.zeros((n_img, GMAX), bool)
    velo = r.normal(0, 1, (n_img, GMAX, 2)).astype(np.float32)
    x3dp = np.zeros((n_img, GMAX, PMAX, 3), np.float32)
    x2dp = np.zeros((n_img, GMAX, PMAX, 2), np.float32)
    pmask = np.zeros((n_img, GMAX, PMAX), bool)
    for i in range(n_img):
        for g in range(2):  # two valid GT per image
            t = np.array([r.uniform(-1, 1), r.uniform(-0.3, 0.3),
                          r.uniform(5, 9)])
            dims = r.uniform(1.0, 2.5, 3)
            g3d[i, g] = [*dims, *t, r.uniform(-np.pi, np.pi)]
            uv = K @ t
            c = uv[:2] / uv[2]
            half = 60 * dims[[0, 1]].max() / t[2] / 2
            g2d[i, g] = [c[0] - half, c[1] - half, c[0] + half, c[1] + half]
            g2d[i, g, 0::2] = g2d[i, g, 0::2].clip(0, W - 1)
            g2d[i, g, 1::2] = g2d[i, g, 1::2].clip(0, H - 1)
            mask[i, g] = True
            pts = r.uniform(-0.5, 0.5, (PMAX, 3)) * dims
            x3dp[i, g] = pts
            cam = pts @ np.eye(3) + t
            uvp = cam @ K.T
            x2dp[i, g] = uvp[:, :2] / uvp[:, 2:]
            pmask[i, g] = True
    return dtrain.DetBatch(
        img=jnp.asarray(r.normal(size=(n_img, H, W, 3)), jnp.float32),
        cam_intrinsic=jnp.asarray(np.tile(K, (n_img, 1, 1)), jnp.float32),
        img_shapes=jnp.full((n_img, 2), float(H)),
        ori_shapes=jnp.full((n_img, 2), float(H)),
        img_flips=jnp.asarray([i % 2 == 1 for i in range(n_img)]),
        img_dense_x2d=jnp.asarray(dense, jnp.float32),
        img_dense_x2d_mask=jnp.ones((n_img, H, W, 1), jnp.float32),
        gt_bboxes=jnp.asarray(g2d),
        gt_bboxes_3d=jnp.asarray(g3d),
        gt_labels=jnp.asarray(r.integers(0, NCLS, (n_img, GMAX))),
        gt_mask=jnp.asarray(mask),
        gt_velo=jnp.asarray(velo),
        gt_attr=jnp.asarray(r.integers(0, 4, (n_img, GMAX))),
        gt_x3d=jnp.asarray(x3dp),
        gt_x2d=jnp.asarray(x2dp),
        gt_pts_mask=jnp.asarray(pmask),
    )


def test_det_train_step_end_to_end():
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch.img, (H, W))
    tx = dtrain.make_optimizer(cfg)
    state = dtrain.DetTrainState.create(variables, tx)
    step = jax.jit(dtrain.make_train_step(model, cfg, tx))

    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    expected = {'loss_cls', 'loss_rp', 'loss_centerness', 'loss_pose_0',
                'loss_dim', 'loss_score', 'loss_reg_pos', 'loss_reg_orient',
                'loss_proj', 'loss_regr', 'loss_velo', 'loss_attr', 'ate',
                'norm_factor', 'grad_norm'}
    assert expected <= set(losses.keys()), losses.keys()
    for k, v in losses.items():
        assert np.all(np.isfinite(np.asarray(v))), (k, v)
    # parameters moved, EMA buffers updated
    moved = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.any(a != b)), state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(moved))
    assert float(new_state.ema.pose_norm_factor[0].norm_factor) != 1.0
    assert float(new_state.ema.proj_mean_inv_std) != 1.0
    assert int(new_state.step) == 1


def test_det_train_step_remat_matches_plain():
    """remat_dense (jax.checkpoint over the dense forward) must be a pure
    memory/compute trade: losses and the updated parameters are bitwise-
    comparable to the plain step at f32 tolerance."""
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = make_batch(seed=3)
    variables = model.init(jax.random.PRNGKey(0), batch.img, (H, W))
    tx = dtrain.make_optimizer(cfg)
    state = dtrain.DetTrainState.create(variables, tx)

    outs = {}
    for name, c in (('plain', cfg),
                    ('remat', dataclasses.replace(cfg, remat_dense=True))):
        step = jax.jit(dtrain.make_train_step(model, c, tx))
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        outs[name] = (jax.device_get(losses),
                      jax.device_get(new_state.params))
    for k, a in outs['plain'][0].items():
        b = outs['remat'][0][k]
        # grad_norm sums squares over every leaf — checkpoint recompute
        # reorders fusions, so it wobbles at f32 lsb scale
        rtol = 1e-2 if k == 'grad_norm' else 1e-5
        np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-6, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
        outs['plain'][1], outs['remat'][1])


def test_optimizer_reference_recipe():
    """Reference optimizer fidelity (configs/epropnp_det_basic.py:226-241):
    sampling_offsets updates at lr_mult 0.1, step-LR x0.1 after epochs
    [10, 11], defaults lr=1e-4 / clip=5.0."""
    import numpy as np
    import jax.numpy as jnp
    from epropnp_tpu.det.config import DetConfig

    cfg = DetConfig()
    assert cfg.train.lr == 1e-4
    assert cfg.train.grad_clip == 5.0
    assert cfg.train.lr_steps == (10, 11)

    params = {'head': {'sampling_offsets': {'kernel': jnp.ones((4,))},
                       'linear': {'kernel': jnp.ones((4,))}}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    spe = 2  # boundaries at optimizer steps 20 and 22
    tx = dtrain.make_optimizer(cfg, steps_per_epoch=spe)
    state = tx.init(params)
    mags = []
    for _ in range(25):
        updates, state = tx.update(grads, state, params)
        mags.append((
            float(jnp.abs(updates['head']['linear']['kernel'][0])),
            float(jnp.abs(updates['head']['sampling_offsets']['kernel'][0])),
        ))
    # lr_mult: sampling_offsets update is 0.1x the default group, always
    for d, s in mags:
        assert s == pytest.approx(0.1 * d, rel=1e-5)
    # step decay: epoch 10 boundary (step 20) drops lr 10x, epoch 11
    # (step 22) another 10x
    assert mags[19][0] == pytest.approx(10 * mags[21][0], rel=0.05)
    assert mags[21][0] == pytest.approx(10 * mags[23][0], rel=0.05)
    # constant-lr mode for per-step studies
    tx0 = dtrain.make_optimizer(cfg, steps_per_epoch=0)
    s0 = tx0.init(params)
    for _ in range(25):
        u0, s0 = tx0.update(grads, s0, params)
    assert float(jnp.abs(u0['head']['linear']['kernel'][0])) == \
        pytest.approx(mags[0][0], rel=0.05)


def test_det_train_loop_eval_hook(tmp_path):
    """Driver-level eval hook (reference evaluation = dict(interval=1,
    metric='NDS'), configs/epropnp_det_basic.py:223-225): train_loop must
    invoke eval_fn(state, epoch) every eval_interval epochs after the
    checkpoint of that epoch, and log its scalar metrics."""
    from epropnp_tpu.det import main as dmain

    cfg = dataclasses.replace(
        tiny_cfg(), train=dataclasses.replace(tiny_cfg().train, epochs=2))
    calls = []

    def eval_fn(state, epoch):
        calls.append((int(state.step), epoch))
        return {'NDS': 0.5 + 0.1 * epoch, 'note': 'non-scalar ok'}

    def factory(epoch):
        return iter([make_batch(seed=10 + epoch)])

    state = dmain.train_loop(
        cfg, factory, steps_per_epoch=1, save_dir=str(tmp_path),
        img_hw=(H, W), prefetch=0, log_interval=1,
        eval_fn=eval_fn, eval_interval=1)
    # one call per epoch, AFTER that epoch's step (state.step advanced)
    assert calls == [(1, 0), (2, 1)]
    assert int(state.step) == 2
    # checkpoints of both epochs exist alongside the evals
    assert (tmp_path / 'checkpoint_001.msgpack').exists()
    assert (tmp_path / 'latest.msgpack').exists()
