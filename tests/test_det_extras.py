"""TTA inference, MC scoring/orientation density, visualizers, CBGS, API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epropnp_tpu.det import test as dtest
from test_det_train import tiny_cfg, tiny_model, make_batch, H, W


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch.img, (H, W))
    return cfg, model, batch, variables


def test_tta_inference(setup):
    cfg, model, batch, variables = setup
    infer = jax.jit(dtest.make_tta_inference_fn(
        model, cfg, max_obj_per_img=8, min_fcos_score=0.0))
    img_flip = batch.img[:, :, ::-1]
    x2d_flip = batch.img_dense_x2d[:, :, ::-1]
    res = infer(variables, batch.img, img_flip, batch.cam_intrinsic,
                batch.img_shapes, batch.ori_shapes, batch.img_dense_x2d,
                x2d_flip, batch.img_dense_x2d_mask, jax.random.PRNGKey(2))
    assert res.bbox_3d.shape == (16, 7)
    valid = np.asarray(res.valid)
    for name in ('bbox_3d', 'scores_3d'):
        v = np.asarray(getattr(res, name))
        assert np.all(np.isfinite(v[valid])), name


def test_mc_scoring_and_orient_density(setup):
    cfg, model, batch, variables = setup
    from epropnp_tpu.ops.pnp import (
        AdaptiveHuberPnPCost, PerspectiveCamera)
    r = np.random.default_rng(0)
    n, pts = 4, 16
    x3d = jnp.asarray(r.uniform(-.5, .5, (n, pts, 3)), jnp.float32)
    pose = jnp.asarray(
        np.concatenate([r.uniform(-1, 1, (n, 2)), r.uniform(5, 9, (n, 1)),
                        r.uniform(-3, 3, (n, 1))], -1), jnp.float32)
    camera = PerspectiveCamera(
        cam_mats=jnp.broadcast_to(batch.cam_intrinsic[0], (n, 3, 3)))
    from epropnp_tpu.ops.pnp.common import evaluate_pnp
    x2d, _ = camera.project(x3d, pose)
    w2d = jnp.full((n, pts, 2), 1.0 / pts)
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(x2d, w2d)
    out = dtest.mc_score_and_orient_density(
        cfg, x3d, x2d, w2d, camera, cost_fun, pose, jax.random.PRNGKey(0),
        mc_scoring_ratio=0.5, orient_bins=32)
    assert out['score_3d'].shape == (n,)
    assert np.all(np.isfinite(np.asarray(out['score_3d'])))
    ol = np.asarray(out['orient_logprob'])
    assert ol.shape == (n, 32)
    # circular density integrates to ~1
    integral = np.exp(ol).sum(axis=1) * (2 * np.pi / 32)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-3)
    # density should peak near the true yaw
    peak = np.argmax(ol, axis=1) * (2 * np.pi / 32)
    true = np.mod(np.asarray(pose[:, 3]), 2 * np.pi)
    d = np.abs(peak - true)
    d = np.minimum(d, 2 * np.pi - d)
    assert np.all(d < 0.5), (peak, true)


def test_visualizers_smoke():
    cv2 = pytest.importorskip('cv2')
    from epropnp_tpu.visualization import (
        draw_box_3d_pred, draw_correspondence_points, show_bev)
    from epropnp_tpu.visualization.orient_density import (
        draw_orient_density, draw_so3_density)
    img = np.zeros((240, 320, 3), np.uint8)
    K = np.array([[300., 0, 160], [0, 300., 120], [0, 0, 1]])
    boxes = np.array([[2., 1.5, 1., 0., 0.5, 8., 0.4],
                      [1., 1., 1., -2., 0.5, 12., -0.8]])
    out = draw_box_3d_pred(img, boxes, K, labels=np.array([0, 3]))
    assert out.shape == img.shape and out.sum() > 0
    bev = show_bev(boxes, labels=np.array([0, 3]),
                   pose_samples=[np.random.default_rng(0).normal(
                       [0, 0.5, 8, 0], 0.3, (64, 4)) for _ in range(2)])
    assert bev.shape == (600, 600, 3)
    pts_img = draw_correspondence_points(
        img, np.random.default_rng(1).uniform(0, 200, (32, 2)),
        np.random.default_rng(2).random((32, 2)))
    assert pts_img.sum() > 0
    od = draw_orient_density(np.log(np.ones(64) / 64))
    assert od.shape == (256, 256, 3)
    q = np.random.default_rng(3).normal(size=(128, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    so3 = draw_so3_density(q, np.random.default_rng(4).random(128))
    assert so3.shape == (256, 512, 3)


def test_show_result_views(tmp_path):
    cv2 = pytest.importorskip('cv2')
    from epropnp_tpu.visualization import show_result
    img = np.zeros((240, 320, 3), np.uint8)
    K = np.array([[300., 0, 160], [0, 300., 120], [0, 0, 1]])
    # two classes: class 0 has two detections, class 1 empty
    b3d = [np.array([[2., 1.5, 1., 0., 0.5, 8., 0.4, 0.9],
                     [1., 1., 1., -2., 0.5, 12., -0.8, 0.1]]),
           np.zeros((0, 8))]
    b2d = [np.array([[60., 40., 200., 180., 0.9],
                     [10., 10., 40., 40., 0.1]]), np.zeros((0, 5))]
    extras = dict(
        pose_samples=[np.random.default_rng(0).normal(
            [0, 0.5, 8, 0], 0.3, (64, 4)) for _ in range(2)],
        score=np.random.default_rng(1).random((240, 320)) * 0.2,
        x2d=np.random.default_rng(2).uniform(0, 200, (64, 2)),
        w2d=np.random.default_rng(3).random((64, 2)),
        orient_logprob=[np.log(np.ones((2, 32)) / 32), np.zeros((0, 32))],
        num_heads=8)
    out_file = str(tmp_path / 'res.jpg')
    rendered = show_result(
        img, b2d, b3d, K, score_thr=0.3,
        views=('2d', '3d', 'bev', 'score', 'pts', 'orient'),
        extras=extras, class_names=['car', 'truck'], out_file=out_file)
    assert set(rendered) == {'2d', '3d', 'bev', 'score', 'pts'}
    for name, im in rendered.items():
        assert im.dtype == np.uint8 and im.ndim == 3, name
    # low-score detection filtered: only one wireframe drawn
    assert rendered['3d'].sum() > 0
    assert (tmp_path / 'res_3d.jpg').exists()
    assert (tmp_path / 'res_bev.png').exists()
    # orient view writes per-detection density plots (score>=thr only)
    orient_dir = tmp_path / 'res_orient'
    assert orient_dir.is_dir()
    assert (orient_dir / 'car_00.png').exists()
    assert not (orient_dir / 'car_01.png').exists()


def test_cbgs_wrapper_balances():
    from epropnp_tpu.det.main import CBGSWrapper

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    # class 0 appears in 8 samples, class 1 in 2 -> wrapper upsamples cls 1
    sample_classes = [[0]] * 8 + [[1]] * 2
    w = CBGSWrapper(Toy(), sample_classes)
    counts = np.bincount([1 if w[i] >= 8 else 0 for i in range(len(w))])
    assert counts[1] > 0  # minority class got replicated
    ratio = counts[1] / max(counts[0], 1)
    assert ratio > 2 / 8  # more balanced than the raw 2:8


def test_detector_rejects_unsupported_strides():
    """setup() validates the pyramid up front with a clear message
    instead of a bare KeyError deep inside Flax setup."""
    import jax
    import jax.numpy as jnp
    import pytest
    from epropnp_tpu.det.api import build_detector
    from epropnp_tpu.det.config import DetConfig

    cfg = DetConfig(strides=(16, 32, 64))
    model = build_detector(cfg)
    with pytest.raises(ValueError, match='strides must start at 4'):
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3)), (64, 64))
