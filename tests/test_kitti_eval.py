"""KITTI AP evaluation sanity tests."""

import numpy as np
import pytest

from epropnp_tpu.det import kitti_eval as ke


def make_anno(boxes3d, names, scores=None, bbox_h=50.0, alpha=None):
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
    if alpha is not None:
        anno['alpha'] = np.asarray(alpha, np.float32)
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


def test_aos_perfect_orientation_equals_ap():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1],
             [4., 1.5, 2., 8., 1., 20., -0.4]]
    gt = [make_anno(boxes, ['Car', 'Car'], alpha=[0.3, -1.2])]
    dt = [make_anno(boxes, ['Car', 'Car'], scores=[0.9, 0.8],
                    alpha=[0.3, -1.2])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('bbox',))
    assert res['Car_aos_easy'] == res['Car_bbox_easy'] > 99.0


def test_aos_opposite_orientation_half_similarity():
    # alpha off by pi -> similarity (1+cos(pi))/2 = 0 per TP
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1]]
    gt = [make_anno(boxes, ['Car'], alpha=[0.0])]
    dt = [make_anno(boxes, ['Car'], scores=[0.9], alpha=[np.pi])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('bbox',))
    assert res['Car_bbox_easy'] > 99.0
    assert res['Car_aos_easy'] < 1e-6
    # and off by pi/2 -> similarity 0.5 -> AOS = AP / 2
    dt2 = [make_anno(boxes, ['Car'], scores=[0.9], alpha=[np.pi / 2])]
    res2 = ke.kitti_eval(gt, dt2, classes=('Car',), metrics=('bbox',))
    assert res2['Car_aos_easy'] == pytest.approx(
        res2['Car_bbox_easy'] / 2, rel=1e-6)


def test_aos_gate_on_sentinel_alpha():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1]]
    gt = [make_anno(boxes, ['Car'], alpha=[0.0])]
    dt = [make_anno(boxes, ['Car'], scores=[0.9], alpha=[-10.0])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('bbox',))
    assert 'Car_aos_easy' not in res  # reference gate eval.py:820-825


def test_coco_style_sweep_bounds_fixed_threshold():
    """coco AP averages IoU 0.5..0.95: <= AP@0.5 and >= AP@0.95."""
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1],
             [4., 1.5, 2., 8., 1., 20., -0.4]]
    # detections slightly offset -> high but not perfect IoU
    dt_boxes = [[4., 1.5, 2., 0.25, 1., 10., 0.1],
                [4., 1.5, 2., 8.25, 1., 20., -0.4]]
    gt = [make_anno(boxes, ['Car', 'Car'])]
    dt = [make_anno(dt_boxes, ['Car', 'Car'], scores=[0.9, 0.8])]
    coco = ke.kitti_eval_coco_style(gt, dt, classes=('Car',),
                                    metrics=('3d',))
    lo = ke.eval_class(gt, dt, 'Car', 0, '3d', 0.5)['ap']
    hi = ke.eval_class(gt, dt, 'Car', 0, '3d', 0.95)['ap']
    assert hi <= coco['Car_coco_3d_easy'] <= lo
    assert coco['Car_coco_3d_easy'] == pytest.approx(np.mean([
        ke.eval_class(gt, dt, 'Car', 0, '3d', float(t))['ap']
        for t in np.linspace(0.5, 0.95, 10)]))


def _brute_force_sweep(gt_annos, dt_annos, cls, diff, metric, min_overlap,
                       thresholds):
    """Re-match at each threshold (the pre-vectorization algorithm)."""
    tps, fps, sims = [], [], []
    for thr in thresholds:
        tp = fp = 0
        sim = 0.0
        for gt, dt in zip(gt_annos, dt_annos):
            gt_care, gt_ig, dt_care = ke._clean(gt, dt, cls, diff)
            ov = ke._overlap(gt, dt, metric)
            sc = np.asarray(dt['score'])
            keep = dt_care & (sc >= thr)
            ts, sm, fs = ke._match_image(
                ov, gt_care, gt_ig, keep, sc, min_overlap,
                np.asarray(gt.get('alpha', np.zeros(len(gt['name'])))),
                np.asarray(dt.get('alpha', np.zeros(len(dt['name'])))))
            tp += len(ts)
            fp += len(fs)
            sim += float(sm.sum())
        tps.append(tp)
        fps.append(fp)
        sims.append(sim)
    return np.array(tps), np.array(fps), np.array(sims)


def test_vectorized_sweep_matches_brute_force():
    """Suffix property: one pass + cumsums == re-matching per threshold."""
    r = np.random.default_rng(3)
    gt_annos, dt_annos = [], []
    for _ in range(6):
        n_gt, n_dt = r.integers(1, 5), r.integers(0, 6)
        gb = np.column_stack([
            r.uniform(3, 5, n_gt), r.uniform(1.2, 1.8, n_gt),
            r.uniform(1.5, 2.2, n_gt), r.uniform(-20, 20, n_gt),
            np.ones(n_gt), r.uniform(8, 40, n_gt),
            r.uniform(-np.pi, np.pi, n_gt)])
        gt_annos.append(make_anno(gb, ['Car'] * n_gt,
                                  alpha=r.uniform(-np.pi, np.pi, n_gt)))
        db = gb[r.integers(0, n_gt, n_dt)] + \
            r.normal(0, 0.4, (n_dt, 7)) * [0, 0, 0, 1, 0, 1, 0.2]
        dt_annos.append(make_anno(db, ['Car'] * n_dt,
                                  scores=r.uniform(0, 1, n_dt),
                                  alpha=r.uniform(-np.pi, np.pi, n_dt)))
    res = ke.eval_class(gt_annos, dt_annos, 'Car', 2, '3d', 0.5,
                        compute_aos=True)
    thr = res['thresholds']
    if len(thr) == 0:
        pytest.skip('degenerate draw: no TPs')
    tp_bf, fp_bf, sim_bf = _brute_force_sweep(
        gt_annos, dt_annos, 'Car', 2, '3d', 0.5, thr)
    denom = np.maximum(tp_bf + fp_bf, 1)
    prec_bf = tp_bf / denom
    orient_bf = sim_bf / denom
    for i in range(len(prec_bf) - 2, -1, -1):
        prec_bf[i] = max(prec_bf[i], prec_bf[i + 1])
        orient_bf[i] = max(orient_bf[i], orient_bf[i + 1])
    np.testing.assert_allclose(res['precision'], prec_bf, atol=1e-12)
    np.testing.assert_allclose(res['orientation'], orient_bf, atol=1e-12)


def test_difficulty_filtering_small_boxes():
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1]]
    gt = [make_anno(boxes, ['Car'])]
    gt[0]['occluded'] = np.array([2.0])  # hard only
    dt = [make_anno(boxes, ['Car'], scores=[0.9])]
    res = ke.kitti_eval(gt, dt, classes=('Car',), metrics=('3d',))
    assert res['Car_3d_easy'] == 0.0       # no easy GT at all
    assert res['Car_3d_hard'] > 99.0


def test_short_gt_ignored_not_counted():
    """GT with bbox height <= MIN_HEIGHT[difficulty] must be ignored:
    removed from total_gt AND absorbing its detection as neither TP nor FP
    (reference clean_data, kitti_utils/eval.py:57-67)."""
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1],
             [4., 1.5, 2., 8., 1., 20., -0.4]]
    gt = [make_anno(boxes, ['Car', 'Car'])]
    # second GT too short for every difficulty (height 20 < 25)
    gt[0]['bbox'][1, 3] = gt[0]['bbox'][1, 1] + 20.0
    dt = [make_anno(boxes, ['Car', 'Car'], scores=[0.9, 0.8])]
    res = ke.eval_class(gt[0:1], dt, 'Car', 2, '3d', 0.5)
    # only 1 valid GT; its detection matches; the short GT's detection is
    # absorbed (not an FP) -> precision 1 at full recall -> AP 100
    assert res['ap'] > 99.0


def test_neighbor_class_gt_absorbs_detection():
    """A Car detection on a Van GT is ignored, not a false positive
    (reference clean_data neighbor-class rule, eval.py:49-54)."""
    boxes = [[4., 1.5, 2., 0., 1., 10., 0.1],
             [4., 1.5, 2., 8., 1., 20., -0.4]]
    gt = [make_anno(boxes, ['Car', 'Van'])]
    # the Van-overlapping detection scores HIGHER than the true one, so if
    # it counted as FP it would depress precision at every threshold
    dt = [make_anno(boxes, ['Car', 'Car'], scores=[0.9, 0.95])]
    res = ke.eval_class(gt, dt, 'Car', 0, '3d', 0.5)
    assert res['ap'] > 99.0
    # sanity: a truly wrong-class GT (Pedestrian) does NOT absorb -> FP
    gt2 = [make_anno(boxes, ['Car', 'Pedestrian'])]
    res2 = ke.eval_class(gt2, dt, 'Car', 0, '3d', 0.5)
    assert res2['ap'] < res['ap']
