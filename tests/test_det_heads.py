"""FPN + FCOSEmbHead + deform conv + losses + coders (shapes & behavior)."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.core.bbox_3d.coders import (
    DistDimProjErrorCoder, MultiClassLogDimCoder)
from epropnp_tpu.models.dense_heads.fcos_emb_head import (
    FCOSEmbHead, level_points)
from epropnp_tpu.models.losses.det_losses import (
    mvd_gaussian_mixture_nll_loss, sigmoid_focal_loss, smooth_l1_loss_mod)
from epropnp_tpu.models.necks.fpn import FPN
from epropnp_tpu.ops.deform_conv import DeformConv


def test_fpn_shapes():
    fpn = FPN(in_channels=(32, 64, 128, 256), out_channels=32, num_outs=6)
    feats = tuple(
        jnp.zeros((2, 64 // (2 ** i), 64 // (2 ** i), c))
        for i, c in enumerate((32, 64, 128, 256)))
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert len(outs) == 6
    sizes = [o.shape[1] for o in outs]
    assert sizes == [64, 32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 32 for o in outs)


def test_deform_conv_zero_offsets_matches_standard_conv():
    """With zero offset/mask weights, DCN == 3x3 conv with mod-weight 1."""
    dc = DeformConv(features=8, use_modulation=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 10, 4)),
                    jnp.float32)
    params = dc.init(jax.random.PRNGKey(0), x)
    out = dc.apply(params, x)
    assert out.shape == (1, 10, 10, 8)
    # reference: same kernel applied as standard conv (zero-pad borders)
    kernel = np.asarray(params['params']['kernel']).reshape(3, 3, 4, 8)
    import jax.lax as lax
    ref = lax.conv_general_dilated(
        np.asarray(x), kernel, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_stride2_zero_offsets_matches_standard_conv():
    """Stride-2 DCN (the first blocks of the reference's DCN stages,
    fallback_on_stride=False) with zero offsets == stride-2 3x3 conv
    with torch padding=1 geometry."""
    dc = DeformConv(features=8, strides=2, use_modulation=False)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 12, 10, 4)),
                    jnp.float32)
    params = dc.init(jax.random.PRNGKey(0), x)
    out = dc.apply(params, x)
    assert out.shape == (2, 6, 5, 8)
    kernel = np.asarray(params['params']['kernel']).reshape(3, 3, 4, 8)
    import jax.lax as lax
    ref = lax.conv_general_dilated(
        np.asarray(x), kernel, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_stride2_fused_matches_jnp():
    """The Pallas gather-contract path at stride 2 == the jnp path
    (interpret mode on CPU), with modulation and nonzero offsets."""
    import epropnp_tpu.ops.pallas_dcn as pallas_dcn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 12, 10, 4)), jnp.float32)
    dc_ref = DeformConv(features=8, strides=2, fused=False)
    params = dc_ref.init(jax.random.PRNGKey(3), x)
    # nonzero offsets/mask so the sampling path is exercised
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.3, a.dtype),
        params)
    ref = dc_ref.apply(params, x)
    old = pallas_dcn.INTERPRET
    pallas_dcn.INTERPRET = True
    try:
        fused = DeformConv(features=8, strides=2, fused=True).apply(
            params, x)
    finally:
        pallas_dcn.INTERPRET = old
    assert fused.shape == ref.shape == (1, 6, 5, 8)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def make_head(num_classes=4, dcn=False):
    return FCOSEmbHead(
        num_classes=num_classes, feat_channels=32, stacked_convs=2,
        strides=(8, 16), regress_ranges=((-1, 64), (64, 1e8)),
        emb_channels=16, cls_branch=(32,), centerness_branch=(16,),
        offset_branch=(32,), emb_branch=(32,), dcn_on_last_conv=dcn)


def test_fcos_emb_head_forward_and_preds():
    head = make_head()
    feats = (jnp.zeros((2, 16, 16, 32)), jnp.zeros((2, 8, 8, 32)))
    params = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(params, feats)
    assert outs[0].cls_score.shape == (2, 16, 16, 4)
    assert outs[0].center.shape == (2, 16, 16, 2)
    assert outs[1].obj_emb.shape == (2, 8, 8, 16)
    assert outs[0].points.shape == (256, 2)

    preds = head.get_preds(
        outs, extra_maps=[[o.obj_emb for o in outs],
                          [o.center for o in outs]],
        max_obj_per_img=8, min_fcos_score=0.0)
    assert preds['img_inds'].shape == (16,)
    assert preds['gathered'][0].shape == (16, 16)
    assert preds['gathered'][1].shape == (16, 2)
    assert preds['points'].shape == (16, 2)


def test_fcos_targets_assign_to_nearest_center():
    head = make_head(num_classes=3)
    pts = [level_points(16, 16, 8), level_points(8, 8, 16)]
    # one GT box centered at (60, 60), size 40 -> assigned on level 0
    gt_boxes = jnp.asarray([[[40., 40., 80., 80.], [0.] * 4]])
    gt_labels = jnp.asarray([[1, 0]])
    gt_mask = jnp.asarray([[True, False]])
    centers2d = jnp.asarray([[[60., 60.], [0., 0.]]])
    labels, ctr, gt_inds = head.get_targets(
        pts, gt_boxes, gt_labels, gt_mask, centers2d)
    labels = np.asarray(labels[0])
    pos = labels < 3
    assert pos.sum() > 0
    assert np.all(labels[pos] == 1)
    # centerness peaks at the point closest to the center
    ctr0 = np.asarray(ctr[0])
    all_pts = np.asarray(jnp.concatenate(pts))
    best = np.argmax(np.where(pos, ctr0, -1))
    d = np.linalg.norm(all_pts[pos] - [60, 60], axis=-1)
    assert np.isclose(np.linalg.norm(all_pts[best] - [60, 60]), d.min())
    # padded (masked) GT never assigned
    assert np.all(np.asarray(gt_inds[0])[pos] == 0)


def test_fcos_loss_finite_and_positive():
    head = make_head(num_classes=3)
    r = np.random.default_rng(0)
    n, g = 320, 4
    flat_cls = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    flat_center = jnp.asarray(r.uniform(0, 128, (n, 2)), jnp.float32)
    flat_ctr = jnp.asarray(r.normal(size=(n,)), jnp.float32)
    labels = jnp.asarray(r.integers(0, 4, n))
    gt_inds = jnp.asarray(r.integers(0, g, n))
    ctr_t = jnp.asarray(r.random(n), jnp.float32)
    centers2d = jnp.asarray(r.uniform(0, 128, (g, 2)), jnp.float32)
    gt_boxes = jnp.asarray(
        np.concatenate([r.uniform(0, 64, (g, 2)),
                        r.uniform(64, 128, (g, 2))], -1), jnp.float32)
    losses = head.loss(flat_cls, flat_center, flat_ctr, labels, gt_inds,
                       ctr_t, centers2d, gt_boxes)
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, v)


def test_mvd_loss_ema_and_finiteness():
    r = np.random.default_rng(0)
    shape = (3, 2, 4, 4)
    pred = jnp.asarray(r.normal(size=shape + (2,)), jnp.float32)
    logstd = jnp.asarray(r.normal(size=shape + (2,)) * 0.1, jnp.float32)
    logmix = jax.nn.log_softmax(
        jnp.asarray(r.normal(size=shape), jnp.float32), axis=1)
    loss, new_ema = mvd_gaussian_mixture_nll_loss(
        pred, 0, logstd, logmix, jnp.asarray(1.0))
    assert np.isfinite(float(loss))
    assert float(new_ema) != 1.0
    # eval mode: EMA unchanged
    _, ema2 = mvd_gaussian_mixture_nll_loss(
        pred, 0, logstd, logmix, jnp.asarray(1.0), training=False)
    assert float(ema2) == 1.0


def test_coders_roundtrip():
    pc = DistDimProjErrorCoder()
    r = np.random.default_rng(0)
    diff = jnp.asarray(r.normal(size=(5, 8, 2)), jnp.float32)
    dist = jnp.asarray(r.uniform(5, 50, (5, 1)), jnp.float32)
    dims = jnp.asarray(r.uniform(1, 4, (5, 3)), jnp.float32)
    focal = jnp.full((5, 1), 500.0)
    enc = pc.encode(diff, dist, dims, focal)
    dec = pc.decode(enc, dist, dims, focal)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(diff), atol=1e-5)

    dc = MultiClassLogDimCoder()
    dims = jnp.asarray(r.uniform(0.5, 10, (6, 3)), jnp.float32)
    labels = jnp.asarray(r.integers(0, 10, 6))
    enc = dc.encode(dims, labels)
    dec = dc.decode(enc, labels)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dims), rtol=1e-5)


def test_focal_loss_matches_torch():
    import pytest
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    r = np.random.default_rng(1)
    logits = r.normal(size=(20, 5)).astype(np.float32)
    labels = r.integers(0, 5, 20)
    onehot = np.eye(5, dtype=np.float32)[labels]
    ours = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(onehot),
                                    reduction='mean'))
    t = torch.tensor(logits)
    y = torch.tensor(onehot)
    p = torch.sigmoid(t)
    ce = F.binary_cross_entropy_with_logits(t, y, reduction='none')
    p_t = p * y + (1 - p) * (1 - y)
    a_t = 0.25 * y + 0.75 * (1 - y)
    ref = float((a_t * (1 - p_t) ** 2 * ce).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
