"""Devkit-free nuScenes detection metrics: hand-computed fixtures.

Pins the self-contained detection_cvpr_2019 implementation
(epropnp_tpu/det/nuscenes_eval.py) against analytically derived values,
and runs the full dataset.evaluate() fallback path end-to-end. The
reference delegates all of this to the external devkit
(/root/reference/EPro-PnP-Det/epropnp_det/datasets/nuscenes3d_dataset.py:240-280).
"""

import os
import pickle

import numpy as np
import pytest

from epropnp_tpu.det import nuscenes_dataset as nus
from epropnp_tpu.det.nuscenes_eval import (
    accumulate, attr_acc, calc_ap, calc_tp, cummean, evaluate_detection,
    filter_bike_racks, filter_boxes_by_range, point_in_box,
    quaternion_yaw, scale_iou, velocity_l2, yaw_diff)


def box(x, y, name='car', score=None, size=(2., 4., 1.5), yaw=0.0,
        velocity=(0., 0.), attr='vehicle.moving', num_pts=1, z=0.0):
    q = [np.cos(yaw / 2), 0., 0., np.sin(yaw / 2)]  # about +z
    d = dict(translation=[float(x), float(y), float(z)],
             size=list(size), rotation=[float(v) for v in q],
             velocity=list(velocity), detection_name=name,
             attribute_name=attr, num_pts=num_pts)
    if score is not None:
        d['detection_score'] = float(score)
    return d


# ------------------------------------------------------------ unit pieces

def test_quaternion_yaw():
    for yaw in (0.0, 0.5, -2.2, np.pi):
        q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
        diff = (quaternion_yaw(q) - yaw + np.pi) % (2 * np.pi) - np.pi
        assert abs(diff) < 1e-9


def test_scale_iou_aligned_boxes():
    # (w,l,h) (1,2,2) vs (2,2,2): inter 4, union 8+4-4=8 -> iou .5
    a = box(0, 0, size=(1, 2, 2))
    b = box(0, 0, size=(2, 2, 2))
    assert scale_iou(a, b) == pytest.approx(0.5)
    assert scale_iou(a, a) == pytest.approx(1.0)


def test_yaw_diff_periods():
    a, b = box(0, 0, yaw=0.0), box(0, 0, yaw=np.pi - 0.2)
    assert yaw_diff(a, b) == pytest.approx(np.pi - 0.2)
    # barrier-style half period: pi-0.2 ~ -0.2 mod pi
    assert yaw_diff(a, b, period=np.pi) == pytest.approx(0.2)


def test_velocity_and_attr():
    gt = box(0, 0, velocity=(1.0, 2.0))
    pr = box(0, 0, velocity=(4.0, 6.0))
    assert velocity_l2(gt, pr) == pytest.approx(5.0)
    assert attr_acc(gt, pr) == 1.0
    pr2 = box(0, 0, attr='vehicle.parked')
    assert attr_acc(gt, pr2) == 0.0
    assert np.isnan(attr_acc(box(0, 0, attr=''), pr))


def test_cummean_nan_handling():
    out = cummean(np.array([1.0, np.nan, 3.0]))
    assert out == pytest.approx([1.0, 1.0, 2.0])
    assert cummean(np.array([np.nan, np.nan])) == pytest.approx([1.0, 1.0])


def test_range_filter_and_numpts():
    frames = {'t': [box(10, 0), box(60, 0), box(5, 0, num_pts=0)]}
    ego = {'t': (0.0, 0.0)}
    out = filter_boxes_by_range(frames, ego, is_gt=True)
    assert len(out['t']) == 1 and out['t'][0]['translation'][0] == 10


# ------------------------------------------------- hand-computed AP / TP

def test_point_in_box_rotated():
    # rack at (10, 0), size w=1 (y), l=4 (x), h=2, rotated 90deg about z:
    # in world coords the long axis now runs along +y
    rack = dict(translation=[10.0, 0.0, 0.0], size=[1.0, 4.0, 2.0],
                rotation=[np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    assert point_in_box([10.0, 1.8, 0.0], rack)       # along rotated length
    assert not point_in_box([11.8, 0.0, 0.0], rack)   # outside rotated width
    assert not point_in_box([10.0, 1.8, 1.5], rack)   # above the box
    assert point_in_box([10.3, -1.9, -0.9], rack)


def test_bike_rack_filter_semantics():
    rack = dict(translation=[10.0, 0.0, 0.0], size=[4.0, 4.0, 2.0],
                rotation=[1.0, 0.0, 0.0, 0.0])
    frames = {'t': [
        box(10, 0, name='bicycle'),       # inside rack -> dropped
        box(10, 1, name='motorcycle'),    # inside rack -> dropped
        box(10, 0, name='car'),           # non-bike class kept
        box(30, 0, name='bicycle'),       # outside rack -> kept
    ], 'u': [box(10, 0, name='bicycle')]}  # sample without racks: kept
    out = filter_bike_racks(frames, {'t': [rack]})
    assert [b['detection_name'] for b in out['t']] == ['car', 'bicycle']
    assert out['t'][1]['translation'][0] == 30
    assert len(out['u']) == 1


def test_bike_rack_filter_in_evaluate_detection():
    # one bicycle GT inside a rack + a matching prediction: with the rack
    # both disappear (no GT -> zero-AP no_predictions path); without it
    # the prediction matches perfectly
    gt = {'t': [box(10, 0, name='bicycle', attr='')]}
    pred = {'t': [box(10, 0, name='bicycle', score=0.9, attr='')]}
    rack = dict(translation=[10.0, 0.0, 0.0], size=[4.0, 4.0, 2.0],
                rotation=[1.0, 0.0, 0.0, 0.0])
    with_rack = evaluate_detection(pred, gt, classes=['bicycle'],
                                   bikerack_frames={'t': [rack]})
    without = evaluate_detection(pred, gt, classes=['bicycle'])
    assert with_rack['mean_ap'] == 0.0
    assert without['mean_ap'] > 0.9


def test_perfect_predictions_give_nds_one():
    gt = {'s1': [box(0, 0), box(10, 0)],
          's2': [box(-5, 3)]}
    preds = {t: [dict(b, detection_score=0.9) for b in bs]
             for t, bs in gt.items()}
    m = evaluate_detection(preds, gt, classes=('car',))
    assert m['mean_ap'] == pytest.approx(1.0)
    for v in m['tp_errors'].values():
        assert v == pytest.approx(0.0, abs=1e-12)
    assert m['nd_score'] == pytest.approx(1.0)


def test_hand_computed_ap_and_ate():
    """One TP (0.5 m off) + one far FP on 2 GT.

    recall never exceeds 0.5; precision curve on the 101-point grid is
    1.0 below recall 0.5 (left clamp), 0.5 exactly at 0.5 (duplicate-x
    interp keeps the later point), 0 beyond. With the 0.1 floors:
    AP = (39 * 0.9 + 0.4) / (90 * 0.9) = 35.5/81.
    The matched pred is 0.5 m off -> ATE = 0.5 exactly, at every
    threshold that still matches it.
    """
    gt = {'s1': [box(0, 0), box(10, 0)]}
    preds = {'s1': [box(0.5, 0, score=0.9), box(30, 0, score=0.8)]}
    md = accumulate(gt, preds, 'car', dist_th=1.0)
    assert calc_ap(md) == pytest.approx(35.5 / 81)
    md2 = accumulate(gt, preds, 'car', dist_th=2.0)
    assert calc_tp(md2, 'trans_err') == pytest.approx(0.5)
    # both metrics flow through the top level too
    m = evaluate_detection(preds, gt, classes=('car',))
    assert m['label_aps']['car']['1.0'] == pytest.approx(35.5 / 81)
    assert m['tp_errors']['mATE'] == pytest.approx(0.5)


def test_matching_is_greedy_by_score_and_unique():
    # two preds near ONE gt: only the higher-scored one may match
    gt = {'s1': [box(0, 0)]}
    preds = {'s1': [box(0.2, 0, score=0.9), box(0.1, 0, score=0.5)]}
    md = accumulate(gt, preds, 'car', dist_th=2.0)
    # tp=[1,0] fp=[0,1]: rec=[1,1] prec=[1,.5]
    assert md.precision[100] == pytest.approx(0.5)
    assert md.precision[50] == pytest.approx(1.0)


def test_no_gt_class_yields_zero_ap_unit_tp():
    gt = {'s1': [box(0, 0, name='car')]}
    preds = {'s1': [box(0, 0, name='truck', score=0.9)]}
    md = accumulate(gt, preds, 'truck', dist_th=2.0)
    assert calc_ap(md) == 0.0
    assert calc_tp(md, 'trans_err') == 1.0


def test_class_metric_exclusions_and_nds_formula():
    gt = {'s1': [box(0, 0, name='traffic_cone', attr=''),
                 box(8, 0, name='car')]}
    preds = {'s1': [box(0.3, 0, name='traffic_cone', score=0.9, attr=''),
                    box(8.2, 0, name='car', score=0.8)]}
    m = evaluate_detection(preds, gt, classes=('car', 'traffic_cone'))
    assert np.isnan(m['label_tp_errors']['traffic_cone']['orient_err'])
    assert np.isnan(m['label_tp_errors']['traffic_cone']['vel_err'])
    assert np.isnan(m['label_tp_errors']['traffic_cone']['attr_err'])
    # NDS recomputable from the returned pieces
    expected = (5 * m['mean_ap'] + sum(
        max(0.0, 1.0 - v) for v in m['tp_errors'].values())) / 10
    assert m['nd_score'] == pytest.approx(expected)


def test_barrier_half_period_orientation():
    gt = {'s1': [box(0, 0, name='barrier', yaw=0.0, attr='')]}
    preds = {'s1': [box(0.1, 0, name='barrier', yaw=np.pi - 0.1,
                        score=0.9, attr='')]}
    m = evaluate_detection(preds, gt, classes=('barrier',))
    assert m['label_tp_errors']['barrier']['orient_err'] == \
        pytest.approx(0.1, abs=1e-6)


# -------------------------------------------- dataset fallback end-to-end

def _ident_calib():
    return dict(sensor2ego_rotation=[1., 0., 0., 0.],
                sensor2ego_translation=[0., 0., 0.],
                ego2global_rotation=[1., 0., 0., 0.],
                ego2global_translation=[0., 0., 0.])


def test_dataset_self_contained_evaluate(tmp_path):
    """Full evaluate() fallback: fusion -> submission -> NDS without devkit.

    One frame, 6 cameras with identity calibration; camera 0 sees one
    GT car; the model 'detects' it well. The camera-frame KITTI row is
    [l,h,w,x,y,z,ry,score,vx,vz]; GT annotations carry the nuScenes
    camera-frame center/wlh/quaternion the converter writes.
    """
    cam2nus_q = nus.mat_to_quat(nus.KITTI2NUS_ROT.T.astype(np.float64))
    # GT: car at camera-frame z=10 (in front), KITTI yaw 0
    ann = dict(category='car', bbox=[100., 100., 200., 200.],
               translation=[1.0, 0.5, 10.0], size=[2.0, 4.0, 1.5],
               rotation=[float(v) for v in cam2nus_q],
               velocity=[0.0, 0.0], attribute='vehicle.parked',
               visibility=4, truncation=0.0, ann_token='gt0', num_pts=25)
    infos = []
    for cam in range(nus.NUM_CAMS):
        infos.append(dict(img_path=f'c{cam}.jpg', cam_id=cam,
                          sample_token='frame0',
                          annotations=[ann] if cam == 0 else [],
                          **_ident_calib()))
    ann_file = tmp_path / 'infos.pkl'
    with open(ann_file, 'wb') as f:
        pickle.dump(infos, f)
    ds = nus.NuScenes3DDataset(str(ann_file))

    # detection: same box, slightly perturbed, score .9, camera 0 only
    row = np.array([4.0, 1.5, 2.0, 1.1, 0.5, 10.2, 0.0, 0.9, 0.0, 0.0])
    empty = [np.zeros((0, 10)) for _ in range(len(nus.CLASSES))]
    results = []
    for cam in range(nus.NUM_CAMS):
        per_cls = [np.stack([row])] + empty[1:] if cam == 0 else empty
        results.append(dict(bbox_3d_results=per_cls))

    metrics = ds.evaluate(results, str(tmp_path))
    if 'note' not in metrics or 'self-contained' not in metrics['note']:
        pytest.skip('official devkit present: fallback not exercised')
    assert os.path.exists(metrics['result_path'])
    # the car is matched at every threshold -> AP 1.0 for car
    assert metrics['label_aps']['car']['0.5'] == pytest.approx(1.0)
    # with identity calibration the camera axes ARE the global axes, so
    # BEV distance sees only the 0.1 x offset (the 0.2 sits on global z)
    assert metrics['label_tp_errors']['car']['trans_err'] == \
        pytest.approx(0.1, abs=1e-6)
    # classes absent from GT contribute ATE 1.0 (devkit behavior)
    assert metrics['tp_errors']['mATE'] == pytest.approx(
        (0.1 + 9.0) / 10.0, abs=1e-6)
    assert metrics['label_tp_errors']['car']['scale_err'] == \
        pytest.approx(0.0, abs=1e-9)
    assert 0.0 < metrics['nd_score'] <= 1.0


def test_build_global_gt_dedups_cross_camera(tmp_path):
    ann = dict(category='car', bbox=[0., 0., 50., 50.],
               translation=[0.0, 0.0, 10.0], size=[2.0, 4.0, 1.5],
               rotation=[1., 0., 0., 0.], velocity=[1.0, 0.0],
               attribute='vehicle.moving', visibility=4, truncation=0.0,
               ann_token='dup', num_pts=5)
    infos = [dict(img_path=f'c{c}.jpg', cam_id=c, sample_token='f0',
                  annotations=[ann], **_ident_calib())
             for c in range(2)]
    with open(tmp_path / 'i.pkl', 'wb') as f:
        pickle.dump(infos, f)
    ds = nus.NuScenes3DDataset(str(tmp_path / 'i.pkl'))
    gt_frames, ego = ds.build_global_gt()
    assert len(gt_frames['f0']) == 1
    assert ego['f0'] == [0.0, 0.0]
    assert gt_frames['f0'][0]['num_pts'] == 5
