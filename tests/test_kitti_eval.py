"""KITTI AP evaluation sanity tests."""

import numpy as np

from epropnp_tpu.det import kitti_eval as ke


def make_anno(boxes3d, names, scores=None, bbox_h=50.0):
    n = len(names)
    boxes3d = np.asarray(boxes3d, np.float32).reshape(n, 7)
    anno = dict(
        name=np.asarray(names),
        bbox=np.tile([0., 0., 100., bbox_h], (n, 1)).astype(np.float32)
        + np.arange(n)[:, None] * 200,
        dimensions=boxes3d[:, :3],
        location=boxes3d[:, 3:6],
        rotation_y=boxes3d[:, 6],
        occluded=np.zeros(n),
        truncated=np.zeros(n),
    )
    if scores is not None:
        anno['score'] = np.asarray(scores, np.float32)
    return anno


def test_perfect_detections_ap_100():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1],
             [4., 1.5, 2., 8., 1., 20., -0.4]]
    gt = [make_anno(boxes, ['Car', 'Car'])]
    dt = [make_anno(boxes, ['Car', 'Car'], scores=[0.9, 0.8])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('3d', 'bev'))
    assert res['Car_3d_easy'] > 99.0
    assert res['Car_bev_moderate'] > 99.0


def test_missed_and_false_positives_reduce_ap():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1],
             [4., 1.5, 2., 8., 1., 20., -0.4]]
    gt = [make_anno(boxes, ['Car', 'Car'])]
    # only one detected + one far-off false positive
    dt_boxes = [boxes[0], [4., 1.5, 2., 50., 1., 90., 0.0]]
    dt = [make_anno(dt_boxes, ['Car', 'Car'], scores=[0.9, 0.85])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('3d',))
    assert 0.0 < res['Car_3d_easy'] < 60.0


def test_wrong_class_not_matched():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1]]
    gt = [make_anno(boxes, ['Car'])]
    dt = [make_anno(boxes, ['Pedestrian'], scores=[0.9])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('3d',))
    assert res['Car_3d_easy'] == 0.0


def test_difficulty_filtering_small_boxes():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1]]
    gt = [make_anno(boxes, ['Car'])]
    gt[0]['occluded'] = np.array([2.0])  # hard only
    dt = [make_anno(boxes, ['Car'], scores=[0.9])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('3d',))
    assert res['Car_3d_easy'] == 0.0       # no easy GT at all
    assert res['Car_3d_hard'] > 99.0
