"""LineMOD pipeline transforms on synthetic images (no dataset required)."""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from epropnp_tpu.sixdof import dataset as ds  # noqa: E402
from epropnp_tpu.sixdof import ref_constants as ref  # noqa: E402
from epropnp_tpu.sixdof.config import DataIterConfig, SixDoFConfig  # noqa: E402


def test_zoom_in_center_crop_identity():
    im = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    patch, c_h, c_w, s = ds.zoom_in(im, (50, 50), 50, 50)
    np.testing.assert_array_equal(patch, im[25:75, 25:75])
    assert (c_h, c_w, s) == (50, 50, 50)


def test_zoom_in_out_of_bounds_pads_zero():
    im = np.full((40, 40), 7, np.uint8)
    patch, *_ = ds.zoom_in(im, (0, 0), 20, 20, channel=1)
    assert patch[0, 0] == 0  # padded region
    assert patch[-1, -1] == 7  # in-image region
    # fully outside -> all zeros
    patch, *_ = ds.zoom_in(im, (-100, -100), 20, 20, channel=1)
    assert np.all(patch == 0)


def test_xywh_to_cs_and_dzi_bounds():
    box = (100.0, 80.0, 50.0, 40.0)
    c, s = ds.xywh_to_cs(box, 1.5, s_max=640)
    np.testing.assert_allclose(c, [125.0, 100.0])
    assert s == 75.0
    rng = np.random.default_rng(0)
    for _ in range(50):
        c, s = ds.xywh_to_cs_dzi(box, 1.5, s_max=640, rng=rng)
        # center stays within +-25% of box dims, scale within +-25%
        assert 125.0 - 0.25 * 50 <= c[0] <= 125.0 + 0.25 * 50
        assert 100.0 - 0.25 * 40 <= c[1] <= 100.0 + 0.25 * 40
        assert 75.0 * 0.75 <= s <= 75.0 * 1.25


def test_trans_local_encoding_matches_decode():
    """build_sample's trans_local inverts through test.decode_trans_head."""
    import jax.numpy as jnp
    from epropnp_tpu.sixdof import test as test_lib
    from epropnp_tpu.sixdof.train import Batch

    cfg = SixDoFConfig(dataiter=DataIterConfig(inp_res=64, out_res=16))
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    pose = np.concatenate(
        [np.eye(3), np.array([[0.05], [-0.03], [0.9]])], axis=1)
    box = np.array([280.0, 200.0, 80.0, 60.0])
    sample = ds.build_sample(cfg, 'ape', rgb, None, None, pose, box,
                             np.ones(3), split='test', denoise=False)
    batch = Batch(inp=None, target_coor=None, loss_msk=None, trans_local=None,
                  pose=None, c_box=jnp.asarray(sample.c_box[None]),
                  s_box=jnp.asarray(np.array([sample.s_box], np.float32)),
                  dim=None)
    t_dec = test_lib.decode_trans_head(
        jnp.asarray(sample.trans_local[None]), batch,
        jnp.asarray(box[None, 2:], jnp.float32),
        jnp.asarray(ref.CAMERA_MATRIX, jnp.float32), cfg.dataiter.out_res)
    np.testing.assert_allclose(np.asarray(t_dec)[0], pose[:, 3], atol=1e-4)


def test_change_bg_keeps_foreground():
    rgb = np.full((40, 40, 3), 100, np.uint8)
    msk = np.zeros((40, 40), np.uint8)
    msk[10:20, 10:20] = 1
    bg = np.full((40, 40, 3), 7, np.uint8)
    out = ds.change_bg(rgb, msk, bg)
    assert np.all(out[15, 15] == 100)
    assert np.all(out[0, 0] == 7)


def test_norm_coor_and_loss_mask_shapes():
    cfg = SixDoFConfig(dataiter=DataIterConfig(inp_res=64, out_res=16))
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    coor = rng.uniform(-0.05, 0.05, (480, 640, 3)).astype(np.float32)
    msk = (rng.random((480, 640)) > 0.5).astype(np.uint8)
    pose = np.concatenate(
        [np.eye(3), np.array([[0.0], [0.0], [1.0]])], axis=1)
    box = np.array([300.0, 220.0, 60.0, 50.0])
    sample = ds.build_sample(cfg, 'cat', rgb, coor, msk, pose, box,
                             np.array([0.05, 0.05, 0.05]), split='train',
                             rng=np.random.default_rng(0))
    assert sample.inp.shape == (64, 64, 3)
    assert sample.target_coor.shape == (16, 16, 3)
    assert sample.loss_msk.shape == (16, 16, 3)
    assert sample.inp.dtype == np.float32 and sample.inp.max() <= 1.0
    # normalized coords scaled by 1/0.05 = 20
    assert np.abs(sample.target_coor).max() <= 1.0 + 1e-5
