"""Level-packed composite towers: layout + exact-parity tests.

The packed path must be output-identical (up to conv-tiling float
associativity) to the per-level path: same params, same inputs, per-level
GroupNorm statistics, no cross-level contamination through convs or
deformable sampling.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epropnp_tpu.models.dense_heads.fcos_emb_head import FCOSEmbHead
from epropnp_tpu.ops.deform_conv import DeformConv
from epropnp_tpu.ops.level_pack import (
    pack_levels, plan_level_packing, unpack_levels)


def _pyramid(seed=0, c=16, shapes=((16, 40), (8, 20), (4, 10), (2, 5)),
             n=2, dtype=np.float32):
    r = np.random.default_rng(seed)
    return [jnp.asarray(r.normal(size=(n, h, w, c)), dtype)
            for h, w in shapes]


def test_plan_layout_geometry():
    shapes = [(84, 200), (42, 100), (21, 50), (11, 25), (6, 13)]
    lay = plan_level_packing(shapes)
    # all regions disjoint with >= gap separation, inside canvas
    H, W = lay.canvas_hw
    # a 3x3 conv reads a 1-pixel ring: dilating every region by 1 must
    # produce disjoint boxes (gap >= 2 guarantees it)
    grid = np.zeros((H, W), np.int32)
    for (h, w), (y, x) in zip(lay.shapes, lay.origins):
        assert y + h <= H and x + w <= W
        grid[max(y - 1, 0):y + h + 1, max(x - 1, 0):x + w + 1] += 1
    assert grid.max() == 1, 'levels closer than the 2-px gap'
    assert lay.waste() < 0.25
    # the v1b serving pyramid packs into ~1.5x the finest level
    assert H <= 84 + 2 + 42 + 2 + 11 and W == 200


def test_pack_unpack_roundtrip():
    feats = _pyramid()
    lay = plan_level_packing([(f.shape[1], f.shape[2]) for f in feats])
    comp = pack_levels(feats, lay)
    back = unpack_levels(comp, lay)
    for f, b in zip(feats, back):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(b))
    # gaps are zero
    comp_np = np.asarray(comp)
    mask = np.asarray(lay.mask)[..., 0]
    assert np.all(comp_np[:, mask == 0] == 0)


def test_deform_conv_packed_parity():
    """Packed DeformConv == per-level DeformConv with shared params."""
    feats = _pyramid(seed=3)
    lay = plan_level_packing([(f.shape[1], f.shape[2]) for f in feats])
    conv = DeformConv(features=8, fused=False)
    var = conv.init(jax.random.PRNGKey(0), feats[0])
    # give the zero-init offset conv nonzero weights so offsets flow
    r = np.random.default_rng(1)
    var = jax.tree.map(
        lambda p: jnp.asarray(r.normal(scale=0.1, size=p.shape), p.dtype),
        var)
    per_level = [conv.apply(var, f) for f in feats]
    comp = pack_levels(feats, lay)
    packed = conv.apply(var, comp, layout=lay)
    for ref, (h, w), (y, x) in zip(per_level, lay.shapes, lay.origins):
        got = packed[:, y:y + h, x:x + w, :]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fcos_head_packed_gradient_parity():
    """Gradients through the packed forward match the per-level path."""
    shapes = ((8, 20), (4, 10), (2, 5))
    feats = _pyramid(seed=9, c=16, shapes=shapes, n=1)
    kw = dict(num_classes=3, in_channels=16, feat_channels=16,
              emb_channels=8, strides=(8, 16, 32),
              regress_ranges=((-1, 48), (48, 96), (96, 1e8)),
              cls_branch=(16,), centerness_branch=(8,),
              offset_branch=(16,), emb_branch=(16,))
    head_ref = FCOSEmbHead(**kw)
    head_pk = FCOSEmbHead(level_packed=True, **kw)
    var = head_ref.init(jax.random.PRNGKey(0), tuple(feats))
    r = np.random.default_rng(4)
    var = jax.tree.map(
        lambda p: jnp.asarray(r.normal(scale=0.1, size=p.shape), p.dtype),
        var)

    def loss(head):
        def f(params):
            outs = head.apply({'params': params}, tuple(feats))
            return sum(jnp.sum(o.cls_score ** 2) + jnp.sum(o.obj_emb ** 2)
                       + jnp.sum(o.center ** 2) for o in outs)
        return f

    g_ref = jax.grad(loss(head_ref))(var['params'])
    g_pk = jax.grad(loss(head_pk))(var['params'])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_pk)}
    for k, v in flat_r:
        key = jax.tree_util.keystr(k)
        # conv-tiling float accumulation order differs on the composite
        # canvas; observed worst-case ~2e-3 relative on O(1e2) grads
        np.testing.assert_allclose(
            np.asarray(flat_p[key]), np.asarray(v),
            rtol=5e-3, atol=1e-4, err_msg=key)


@pytest.mark.slow
def test_det_train_step_with_packed_towers():
    """One full Det train step with level_packed_towers on: finite losses.

    The packed path is training-safe (gradient parity pinned above);
    this exercises the whole-step plumbing (targets, sampler, PnP,
    optimizer) through the composite-canvas towers.
    """
    import epropnp_tpu.det.train as dtrain
    import test_det_train as tdt
    cfg = tdt.tiny_cfg()
    model_kw = dict(
        num_classes=cfg.num_classes, backbone_depth=cfg.backbone_depth,
        backbone_dcn_stages=(), embed_dims=cfg.embed_dims,
        num_heads=cfg.num_heads, num_points=cfg.num_points,
        strides=cfg.strides, output_stride=cfg.output_stride,
        num_attrs=cfg.num_attrs, dcn_on_last_conv=True,
        level_packed_towers=True,
        detector_cfg=dict(
            feat_channels=32, emb_channels=cfg.embed_dims,
            cls_branch=(32,), centerness_branch=(16,), offset_branch=(32,),
            emb_branch=(32,),
            regress_ranges=((-1, 16), (16, 32), (32, 1e8))))
    from epropnp_tpu.models.detectors.epropnp_det import EProPnPDet
    model = EProPnPDet(**model_kw)
    batch = tdt.make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch.img,
                           (tdt.H, tdt.W))
    tx = dtrain.make_optimizer(cfg)
    state = dtrain.DetTrainState.create(variables, tx)
    step = jax.jit(dtrain.make_train_step(model, cfg, tx))
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    vals = {k: float(np.ravel(v)[0]) for k, v in
            jax.device_get(losses).items()}
    bad = [k for k, v in vals.items() if not np.isfinite(v)]
    assert not bad, f'non-finite losses with packed towers: {bad}'


def test_detector_dense_packed_parity():
    """EProPnPDet.det_dense with level_packed_towers on == off."""
    from epropnp_tpu.models.detectors.epropnp_det import EProPnPDet
    kw = dict(num_classes=3, backbone_depth=18, backbone_dcn_stages=(),
              embed_dims=32, num_heads=4, num_points=4,
              strides=(4, 8, 16, 32), output_stride=4, num_attrs=4,
              dcn_on_last_conv=True,
              detector_cfg=dict(feat_channels=32, emb_channels=32,
                                cls_branch=(32,), centerness_branch=(16,),
                                offset_branch=(32,), emb_branch=(32,),
                                regress_ranges=((-1, 16), (16, 32),
                                                (32, 1e8))))
    model = EProPnPDet(**kw)
    model_pk = EProPnPDet(level_packed_towers=True, **kw)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)),
                      jnp.float32)
    var = model.init(jax.random.PRNGKey(0), img, (64, 64))
    ref_outs, ref_key, ref_val = model.apply(
        var, img, (64, 64), method=model.det_dense)
    got_outs, got_key, got_val = model_pk.apply(
        var, img, (64, 64), method=model_pk.det_dense)
    np.testing.assert_allclose(np.asarray(got_key), np.asarray(ref_key),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_val), np.asarray(ref_val),
                               rtol=1e-5, atol=1e-5)
    for lo_r, lo_g in zip(ref_outs, got_outs):
        np.testing.assert_allclose(np.asarray(lo_g.cls_score),
                                   np.asarray(lo_r.cls_score),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(lo_g.obj_emb),
                                   np.asarray(lo_r.obj_emb),
                                   rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize('offset_cls_agnostic', [True, False])
def test_fcos_head_packed_parity(offset_cls_agnostic):
    """Full FCOSEmbHead: packed forward == per-level forward."""
    shapes = ((16, 40), (8, 20), (4, 10), (2, 5))
    feats = _pyramid(seed=5, c=32, shapes=shapes)
    kw = dict(num_classes=4, in_channels=32, feat_channels=32,
              emb_channels=16, strides=(8, 16, 32, 64),
              regress_ranges=((-1, 48), (48, 96), (96, 192), (192, 1e8)),
              cls_branch=(32,), centerness_branch=(16,),
              offset_branch=(32,), emb_branch=(32,),
              offset_cls_agnostic=offset_cls_agnostic)
    head_ref = FCOSEmbHead(**kw)
    head_pk = FCOSEmbHead(level_packed=True, **kw)
    var = head_ref.init(jax.random.PRNGKey(0), tuple(feats))
    # randomize so DCN offsets/modulation and GN scales are nontrivial
    r = np.random.default_rng(2)
    var = jax.tree.map(
        lambda p: jnp.asarray(r.normal(scale=0.1, size=p.shape), p.dtype),
        var)
    # identical param trees (packed path defines the same modules)
    var_pk = head_pk.init(jax.random.PRNGKey(0), tuple(feats))
    assert jax.tree.structure(var) == jax.tree.structure(var_pk)

    ref = head_ref.apply(var, tuple(feats))
    got = head_pk.apply(var, tuple(feats))
    assert len(ref) == len(got)
    for lo_r, lo_g in zip(ref, got):
        for name in ('cls_score', 'center', 'centerness', 'obj_emb',
                     'points'):
            np.testing.assert_allclose(
                np.asarray(getattr(lo_g, name)),
                np.asarray(getattr(lo_r, name)),
                rtol=3e-5, atol=3e-5, err_msg=name)
