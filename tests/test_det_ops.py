"""Det-suite ops: bilinear sampling (torch grid_sample parity), positional
encoding, group linear, deformable attention, cross-RoI logsumexp."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epropnp_tpu.ops.bilinear_sample import (
    batched_bilinear_sample, bilinear_sample, bilinear_sample_packed)
from epropnp_tpu.ops.group_linear import GroupLinear
from epropnp_tpu.ops.positional_encoding import dense_posenc, points_to_enc
from epropnp_tpu.ops.inter_roi_ops import logsumexp_across_rois


def test_bilinear_sample_matches_torch_grid_sample():
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    r = np.random.default_rng(0)
    h, w, c = 13, 17, 4
    feat = r.normal(size=(h, w, c)).astype(np.float32)
    # sample points, including out-of-range ones
    pts = r.uniform(-3, 20, (50, 2)).astype(np.float32)  # [x, y] pixels

    for padding in ('border', 'zeros'):
        ours = np.asarray(bilinear_sample(
            jnp.asarray(feat), jnp.asarray(pts), padding))
        # torch grid_sample with align_corners=False: grid g -> pixel
        # ((g+1)*size-1)/2, so g = (2*pix+1)/size - 1
        gx = (2 * pts[:, 0] + 1) / w - 1
        gy = (2 * pts[:, 1] + 1) / h - 1
        grid = torch.tensor(np.stack([gx, gy], -1))[None, :, None, :]
        inp = torch.tensor(feat).permute(2, 0, 1)[None]
        ref = F.grid_sample(inp, grid, mode='bilinear', padding_mode=padding,
                            align_corners=False)[0, :, :, 0].T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_sample_packed_matches_reference_impl():
    """Patch-row gather formulation == 4-corner formulation, everywhere."""
    r = np.random.default_rng(2)
    h, w, c = 11, 19, 6
    feat = r.normal(size=(h, w, c)).astype(np.float32)
    # dense coverage: interior, exact corners/edges, just-outside, far-out
    pts = np.concatenate([
        r.uniform(-3, 25, (200, 2)),
        np.array([[0, 0], [w - 1, h - 1], [-1, -1], [w, h],
                  [-0.5, 3.2], [w - 0.5, h - 0.5], [3.0, 7.0],
                  [-20, 5], [5, 40]], np.float64),
    ]).astype(np.float32)
    for padding in ('border', 'zeros'):
        want = np.asarray(bilinear_sample(
            jnp.asarray(feat), jnp.asarray(pts), padding))
        got = np.asarray(bilinear_sample_packed(
            jnp.asarray(feat), jnp.asarray(pts), padding))
        np.testing.assert_allclose(got, want, atol=1e-5)
    # extra leading dims (the DCN taps axis) + bf16 bitcast gather path
    crd = jnp.asarray(r.uniform(-2, 22, (5, 7, 9, 2)), jnp.float32)
    want = np.asarray(bilinear_sample(jnp.asarray(feat), crd, 'zeros'))
    got = np.asarray(bilinear_sample_packed(jnp.asarray(feat), crd, 'zeros'))
    np.testing.assert_allclose(got, want, atol=1e-5)
    fb = jnp.asarray(feat, jnp.bfloat16)
    want = np.asarray(bilinear_sample(fb, crd, 'zeros').astype(jnp.float32))
    got = np.asarray(
        bilinear_sample_packed(fb, crd, 'zeros').astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_batched_bilinear_sample_indexes_correct_image():
    r = np.random.default_rng(1)
    feats = jnp.asarray(r.normal(size=(3, 8, 8, 2)).astype(np.float32))
    coords = jnp.asarray(np.tile(np.array([[3.0, 4.0]], np.float32),
                                 (6, 1))[:, None, :])
    img_inds = jnp.asarray([0, 1, 2, 0, 1, 2])
    out = batched_bilinear_sample(feats, img_inds, coords)
    single = [np.asarray(bilinear_sample(feats[i], coords[0]))
              for i in range(3)]
    for k in range(6):
        np.testing.assert_allclose(np.asarray(out[k]), single[k % 3],
                                   atol=1e-6)


def test_points_to_enc_shapes_and_range():
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 640, (5, 7, 2)),
                      jnp.float32)
    sizes = jnp.broadcast_to(jnp.asarray([480.0, 640.0]), (5, 7, 2))
    enc = points_to_enc(pts, sizes, num_feats=64)
    assert enc.shape == (5, 7, 128)
    assert np.all(np.abs(np.asarray(enc)) <= 1.0 + 1e-6)
    d = dense_posenc(4, 6, 480, 640, num_feats=32, stride=8)
    assert d.shape == (4, 6, 64)


def test_group_linear_is_blockdiagonal():
    gl = GroupLinear(in_features=16, out_features=8, groups=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)),
                    jnp.float32)
    params = gl.init(jax.random.PRNGKey(0), x)
    out = gl.apply(params, x)
    assert out.shape == (3, 8)
    # group 0 output depends only on group 0 inputs
    x2 = x.at[:, 4:].set(0.0)
    out2 = gl.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out[:, :2]),
                               np.asarray(out2[:, :2]), atol=1e-6)


def test_deformable_attention_sampler_forward():
    from epropnp_tpu.ops.deformable_attention import (
        DeformableAttentionSampler)
    num_img, h, w, embed = 2, 16, 16, 64
    heads, pts = 4, 8
    num_obj = 6
    r = np.random.default_rng(0)
    sampler = DeformableAttentionSampler(
        embed_dims=embed, num_heads=heads, num_points=pts, stride=4,
        ffn_dim=128)
    args = (
        jnp.asarray(r.normal(size=(num_obj, heads, 1, embed // heads)),
                    jnp.float32),
        jnp.asarray(r.normal(size=(num_obj, embed)), jnp.float32),
        jnp.asarray(r.normal(size=(num_img, h, w, embed)), jnp.float32),
        jnp.asarray(r.normal(size=(num_img, h, w, embed)), jnp.float32),
        jnp.asarray(r.uniform(0, 64, (num_img, h, w, 2)), jnp.float32),
        jnp.ones((num_img, h, w, 1), jnp.float32),
        jnp.asarray(r.uniform(0, 64, (num_obj, 2)), jnp.float32),
        jnp.full((num_obj,), 4.0, jnp.float32),
        jnp.asarray([0, 0, 0, 1, 1, 1]),
    )
    params = sampler.init(jax.random.PRNGKey(0), *args)
    out = sampler.apply(params, *args)
    assert out.output.shape == (num_obj, embed)
    assert out.v_samples.shape == (num_obj, heads, embed // heads, pts)
    assert out.a_samples.shape == (num_obj, heads, 1, pts)
    assert out.x2d_samples.shape == (num_obj, heads, 2, pts)
    assert np.all(np.isfinite(np.asarray(out.output)))


def test_logsumexp_across_rois():
    # two fully-overlapping identical rois in the same image:
    # out = logsumexp(x, x) = x + log(2); a third roi in another image
    # stays untouched.
    rh = rw = 4
    x = np.random.default_rng(0).normal(
        size=(3, rh, rw, 1)).astype(np.float32)
    x[1] = x[0]
    boxes = jnp.asarray([[0., 0., 8., 8.], [0., 0., 8., 8.],
                         [0., 0., 8., 8.]])
    ids = jnp.asarray([0, 0, 1])
    out = np.asarray(logsumexp_across_rois(jnp.asarray(x), boxes, ids))
    np.testing.assert_allclose(out[0], x[0] + np.log(2.0), atol=1e-5)
    np.testing.assert_allclose(out[1], x[0] + np.log(2.0), atol=1e-5)
    np.testing.assert_allclose(out[2], x[2], atol=1e-6)


def test_logsumexp_across_rois_partial_overlap():
    # roi1 right half overlaps roi0 left half; non-overlap region unchanged
    rh = rw = 8
    x = np.zeros((2, rh, rw, 1), np.float32)
    boxes = jnp.asarray([[4., 0., 12., 8.], [0., 0., 8., 8.]])
    ids = jnp.asarray([0, 0])
    out = np.asarray(logsumexp_across_rois(jnp.asarray(x), boxes, ids))
    # left half of roi0 lies inside roi1 -> logsumexp(0,0)=log2
    np.testing.assert_allclose(out[0, :, :rw // 2 - 1, 0], np.log(2.0),
                               atol=1e-5)
    # right half of roi0 outside roi1 -> unchanged 0
    np.testing.assert_allclose(out[0, :, rw // 2 + 1:, 0], 0.0, atol=1e-6)


# ------------------------------------------ reference torch-module oracles

def test_group_linear_matches_torch_reference():
    """Randomized-weight parity vs the reference GroupLinear
    (EPro-PnP-Det/epropnp_det/ops/group_linear.py:29-42)."""
    from ref_loader import load_reference_det_op
    ref = load_reference_det_op('group_linear')
    if ref is None:
        pytest.skip('reference checkout / torch unavailable')
    import torch
    g, din, dout, bs = 8, 64, 40, 12
    t_mod = ref.GroupLinear(in_features=din, out_features=dout, groups=g)
    r = np.random.default_rng(3)
    with torch.no_grad():
        t_mod.weight.copy_(torch.from_numpy(
            r.normal(size=(g, dout // g, din // g)).astype(np.float32)))
        t_mod.bias.copy_(torch.from_numpy(
            r.normal(size=(g, dout // g)).astype(np.float32)))
    x = r.normal(size=(bs, din)).astype(np.float32)
    want = t_mod(torch.from_numpy(x)).detach().numpy()

    gl = GroupLinear(in_features=din, out_features=dout, groups=g)
    params = gl.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params['params']['weight'] = jnp.asarray(
        t_mod.weight.detach().numpy())
    params['params']['bias'] = jnp.asarray(t_mod.bias.detach().numpy())
    got = np.asarray(gl.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # leading batch dims match the reference's (*, in_features) contract
    x3 = r.normal(size=(2, 5, din)).astype(np.float32)
    want3 = t_mod(torch.from_numpy(x3)).detach().numpy()
    got3 = np.asarray(gl.apply(params, jnp.asarray(x3)))
    np.testing.assert_allclose(got3, want3, atol=2e-5)


def test_logsumexp_across_rois_matches_torch_reference():
    """Parity vs the reference's per-pair affine_grid/grid_sample loop
    (EPro-PnP-Det/epropnp_det/ops/inter_roi_ops.py:19-82) on a mixed
    scene: overlapping pairs, a triple overlap, a lone RoI, and RoIs
    split across two images."""
    from ref_loader import load_reference_det_op
    ref = load_reference_det_op('inter_roi_ops')
    if ref is None:
        pytest.skip('reference checkout / torch unavailable')
    import torch
    rh = rw = 7
    chn = 3
    r = np.random.default_rng(7)
    boxes = np.asarray([
        [0., 0., 16., 16.],     # img 0: overlaps the next two
        [8., 4., 24., 20.],     # img 0
        [4., 8., 20., 24.],     # img 0 (triple overlap region exists)
        [40., 40., 56., 56.],   # img 0: lone, must pass through
        [0., 0., 16., 16.],     # img 1: same box, different image
        [10., 0., 26., 16.],    # img 1
    ], np.float32)
    ids = np.asarray([0, 0, 0, 0, 1, 1], np.int32)
    x = r.normal(size=(len(boxes), rh, rw, chn)).astype(np.float32)

    t_rois = torch.from_numpy(
        np.concatenate([ids[:, None].astype(np.float32), boxes], axis=1))
    t_in = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NHWC -> NCHW
    want = ref.logsumexp_across_rois(t_in, t_rois).numpy()
    want = want.transpose(0, 2, 3, 1)

    got = np.asarray(logsumexp_across_rois(
        jnp.asarray(x), jnp.asarray(boxes), jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # softmax wrapper parity too (inter_roi_ops.py:99-107)
    want_sm = ref.softmax_across_rois(t_in, t_rois).numpy()
    want_sm = want_sm.transpose(0, 2, 3, 1)
    from epropnp_tpu.ops.inter_roi_ops import softmax_across_rois
    got_sm = np.asarray(softmax_across_rois(
        jnp.asarray(x), jnp.asarray(boxes), jnp.asarray(ids)))
    np.testing.assert_allclose(got_sm, want_sm, atol=1e-4)
