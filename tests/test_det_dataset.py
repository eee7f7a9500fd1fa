"""nuScenes dataset layer: quaternion boxes, fusion, pipelines, submission."""

import json
import numpy as np
import pytest

from epropnp_tpu.det import nuscenes_dataset as nus
from epropnp_tpu.det import pipelines as pl


def test_quat_roundtrip_and_box_transform():
    r = np.random.default_rng(0)
    for _ in range(10):
        q = r.normal(size=4)
        q /= np.linalg.norm(q)
        m = nus.quat_to_mat(q)
        q2 = nus.mat_to_quat(m)
        assert abs(abs(np.dot(q, q2)) - 1.0) < 1e-8
    # rotating a box and its inverse restores the center
    box = nus.NusBox(np.array([1., 2., 3.]), np.ones(3),
                     np.array([1., 0., 0., 0.]), 0, 0.9, np.zeros(3), '')
    q = nus.quat_about_axis([0, 0, 1], 0.7)
    box.rotate(q)
    q_inv = q * np.array([1, -1, -1, -1])
    box.rotate(q_inv)
    np.testing.assert_allclose(box.center, [1., 2., 3.], atol=1e-12)


def test_bbox_3d_to_box_nus_geometry():
    """A camera-frame box converts so that its BEV yaw is consistent."""
    row = np.array([4.0, 1.5, 2.0,   # l h w
                    1.0, 0.5, 10.0,  # x y z (camera frame, y down)
                    0.3, 0.9,        # ry score
                    1.0, -0.5] + [0.0] * 9)
    box = nus.bbox_3d_to_box_nus(row, label=0)
    np.testing.assert_allclose(box.center, [1.0, 0.5, 10.0])
    np.testing.assert_allclose(box.wlh, [2.0, 4.0, 1.5])
    assert box.attr_name in nus.CLS2ATTR['car']
    # rotation must be a valid rotation matrix
    m = box.rotation_matrix
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-9)


def test_multicam_fusion_dedupes_cross_camera():
    # same physical box seen by two cameras -> one detection after fusion
    row = np.array([4.0, 1.5, 2.0, 0.0, 1.0, 10.0, 0.0, 0.9,
                    0.0, 0.0] + [0.0] * 9)
    row2 = row.copy()
    row2[7] = 0.8  # lower score duplicate
    # physical camera->ego rotation: cam z (forward) -> ego x, cam x -> -ego y
    cam2ego = nus.mat_to_quat(np.array(
        [[0., 0., 1.], [-1., 0., 0.], [0., -1., 0.]]))
    ident = dict(sensor2ego_rotation=cam2ego,
                 sensor2ego_translation=[0, 0, 0],
                 ego2global_rotation=[1, 0, 0, 0],
                 ego2global_translation=[0, 0, 0])
    cam1 = dict(bbox_3d_results=[np.stack([row])] + [np.zeros((0, 19))] * 9,
                **ident)
    cam2 = dict(bbox_3d_results=[np.stack([row2])] + [np.zeros((0, 19))] * 9,
                **ident)
    boxes = nus.multicam_fusion([cam1, cam2])
    assert len(boxes) == 1
    assert boxes[0].score == 0.9
    # far-away box filtered by class range
    row_far = row.copy()
    row_far[5] = 80.0
    cam3 = dict(bbox_3d_results=[np.stack([row_far])]
                + [np.zeros((0, 19))] * 9, **ident)
    assert len(nus.multicam_fusion([cam3])) == 0


def test_format_submission(tmp_path):
    box = nus.bbox_3d_to_box_nus(
        np.array([4., 1.5, 2., 0., 1., 10., 0., .9, 0., 0.] + [0.] * 9), 0)
    path = nus.format_submission(
        [dict(boxes=[box], sample_token='tok123')],
        str(tmp_path / 'res.json'))
    data = json.load(open(path))
    assert 'tok123' in data['results']
    e = data['results']['tok123'][0]
    assert e['detection_name'] == 'car'
    assert len(e['rotation']) == 4 and len(e['size']) == 3


def test_dataset_accepts_multiple_ann_files(tmp_path):
    """trainval configs pass [train, val] pickles (reference
    coord_regr_trainval.py:206-207)."""
    import pickle
    infos_a = [dict(token='a', annotations=[])]
    infos_b = [dict(token='b', annotations=[]),
               dict(token='c', annotations=[])]
    pa, pb = tmp_path / 'a.pkl', tmp_path / 'b.pkl'
    pa.write_bytes(pickle.dumps(infos_a))
    pb.write_bytes(pickle.dumps(infos_b))
    assert len(nus.NuScenes3DDataset(str(pa))) == 1
    ds = nus.NuScenes3DDataset([str(pa), str(pb)])
    assert len(ds) == 3
    assert [i['token'] for i in ds.data_infos] == ['a', 'b', 'c']


def test_pipeline_transforms_keep_coordinate_values():
    cv2 = pytest.importorskip('cv2')
    r = np.random.default_rng(0)
    sample = dict(
        img=r.integers(0, 255, (100, 160, 3)).astype(np.uint8),
        cam_intrinsic=np.eye(3),
        gt_bboxes=np.array([[10., 10., 50., 60.]], np.float32))
    sample = pl.load_image_3d(sample)
    x2d0 = sample['img_dense_x2d'].copy()
    assert np.allclose(x2d0[5, 7], [7., 5.])
    sample = pl.resize_3d(sample, 0.5)
    # resized map still holds ORIGINAL coordinates (values interpolated)
    assert sample['img'].shape[:2] == (50, 80)
    assert sample['img_dense_x2d'].shape[:2] == (50, 80)
    assert sample['img_dense_x2d'][:, :, 0].max() > 150  # original x range
    sample = pl.random_flip_3d(sample, np.random.default_rng(1), prob=1.0)
    assert sample['flip']
    # after flip, x coordinates decrease left to right
    assert sample['img_dense_x2d'][0, 0, 0] > sample['img_dense_x2d'][0, -1, 0]
    sample = pl.normalize_img(sample)
    sample = pl.pad_3d(sample, 32)
    ph, pw = sample['pad_shape']
    assert ph % 32 == 0 and pw % 32 == 0
    assert sample['img_dense_x2d_mask'][-1, -1, 0] == 0.0  # padded region


def test_collate_det_batch_shapes():
    r = np.random.default_rng(0)
    samples = []
    for i in range(2):
        s = dict(img=r.integers(0, 255, (64, 64, 3)).astype(np.uint8),
                 cam_intrinsic=np.eye(3),
                 gt_bboxes=np.array([[1., 1., 20., 20.]], np.float32),
                 gt_bboxes_3d=r.normal(size=(1, 7)).astype(np.float32),
                 gt_labels=np.array([2]),
                 gt_velo=np.array([[0.1, 0.2]], np.float32),
                 gt_attr=np.array([1]))
        samples.append(pl.default_pipeline(s, np.random.default_rng(i),
                                           training=False))
    batch = pl.collate_det_batch(samples, max_gt=4)
    assert batch.img.shape == (2, 64, 64, 3)
    assert batch.gt_bboxes.shape == (2, 4, 4)
    assert bool(batch.gt_mask[0, 0]) and not bool(batch.gt_mask[0, 1])
    assert np.isnan(np.asarray(batch.gt_velo[0, 1])).all()  # padded slot


def test_crop_3d_reference_geometry():
    """Crop3D with the released crop_box (0, 228, 1600, 900):
    1600x900 -> 1600x672; boxes offset+clipped; dense map values keep
    ORIGINAL coordinates (transforms.py:84-186, basic.py:173,190)."""
    cv2 = pytest.importorskip('cv2')
    r = np.random.default_rng(0)
    sample = dict(
        img=r.integers(0, 255, (900, 1600, 3)).astype(np.uint8),
        cam_intrinsic=np.eye(3),
        gt_bboxes=np.array([[100., 300., 200., 500.],   # fully inside
                            [50., 0., 150., 120.]],      # entirely in sky
                           np.float32),
        gt_labels=np.array([1, 2]),
        gt_bboxes_3d=r.normal(size=(2, 7)).astype(np.float32),
        truncation=np.array([0.0, 0.0], np.float32))
    sample = pl.load_image_3d(sample)
    out = pl.crop_3d(sample, pl.REFERENCE_CROP_BOX,
                     trunc_ignore_thres=0.8)
    assert out is not None
    assert out['img'].shape[:2] == (672, 1600)
    assert out['img_dense_x2d'].shape[:2] == (672, 1600)
    # dense map still carries original pixel coords: row 0 is original 228
    assert np.allclose(out['img_dense_x2d'][0, 7], [7., 228.])
    # sky-only box dropped, aligned fields filtered together
    assert out['gt_bboxes'].shape == (1, 4)
    assert np.allclose(out['gt_bboxes'][0], [100., 72., 200., 272.])
    assert out['gt_labels'].tolist() == [1]
    assert out['gt_bboxes_3d'].shape == (1, 7)


def test_crop_3d_truncation_relabel():
    """A box cut by the crop edge beyond the visible-area threshold is
    moved to gt_bboxes_ignore (transforms.py:119-147); the stored
    truncation un-discounts its pre-crop area."""
    sample = dict(
        img=np.zeros((100, 100, 3), np.uint8),
        gt_bboxes=np.array([[0., 30., 40., 90.],    # mostly kept
                            [0., 20., 30., 52.]],   # only 12/32 rows kept
                           np.float32),
        gt_labels=np.array([0, 1]),
        # the second box is also half-truncated pre-crop, so its visible
        # fraction of the FULL object is 0.375 * 0.5 < (1 - 0.8) -> ignore
        truncation=np.array([0.0, 0.5], np.float32))
    sample = pl.load_image_3d(sample)
    out = pl.crop_3d(sample, (0, 40, 100, 100), trunc_ignore_thres=0.8)
    assert out is not None
    assert out['gt_labels'].tolist() == [0]
    assert len(out['gt_bboxes_ignore']) == 1
    # no valid GT left -> sample skipped in training
    s2 = pl.load_image_3d(dict(
        img=np.zeros((100, 100, 3), np.uint8),
        gt_bboxes=np.array([[0., 0., 30., 30.]], np.float32),
        gt_labels=np.array([0])))
    assert pl.crop_3d(s2, (0, 40, 100, 100), -1.0) is None
    assert pl.crop_3d(s2, (0, 40, 100, 100), -1.0,
                      allow_negative_crop=True) is not None


def test_random_and_min_iou_crops():
    r = np.random.default_rng(3)
    def mk():
        s = dict(img=np.arange(64 * 64 * 3, dtype=np.uint8
                               ).reshape(64, 64, 3) % 255,
                 gt_bboxes=np.array([[20., 20., 44., 44.]], np.float32),
                 gt_labels=np.array([5]),
                 gt_bboxes_3d=np.ones((1, 7), np.float32))
        return pl.load_image_3d(s)
    out = pl.random_crop_3d(mk(), r, (48, 48), allow_negative_crop=True)
    assert out['img'].shape[:2] == (48, 48)
    assert out['img_dense_x2d'].shape[:2] == (48, 48)
    for _ in range(5):
        out = pl.min_iou_random_crop_3d(mk(), r)
        h, w = out['img'].shape[:2]
        assert out['img_dense_x2d'].shape[:2] == (h, w)
        if len(out['gt_bboxes']):
            b = out['gt_bboxes']
            assert (b[:, 2] <= w + 1e-5).all() and (b[:, 3] <= h + 1e-5).all()
            assert len(out['gt_labels']) == len(b)
            assert len(out['gt_bboxes_3d']) == len(b)
