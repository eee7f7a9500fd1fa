"""KITTI-style 3D detection AP evaluation (pure numpy + native IoU).

Replaces the reference's numba-JIT/numba-CUDA suite
(EPro-PnP-Det/epropnp_det/core/evaluation/kitti_utils/eval.py, 847 LoC +
rotate_iou.py): per-class, per-difficulty average precision over 2D bbox /
BEV / 3D IoU matching with the standard 40-recall-point interpolation.
Host-side by design; rotated overlaps use the native C++ op.

Annotation dict format (per image): ``name`` (n,) str, ``bbox`` (n, 4),
``dimensions`` (n, 3) [l, h, w], ``location`` (n, 3), ``rotation_y`` (n,),
``score`` (n,) (detections only), ``occluded``/``truncated`` for GT.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..ops.iou3d import boxes_iou_3d, rotated_iou_matrix

# KITTI difficulty thresholds: min bbox height / max occlusion / max trunc
DIFFICULTY = {
    0: dict(min_height=40, max_occlusion=0, max_truncation=0.15),   # easy
    1: dict(min_height=25, max_occlusion=1, max_truncation=0.30),   # moderate
    2: dict(min_height=25, max_occlusion=2, max_truncation=0.50),   # hard
}


def _clean(gt: Dict, dt: Dict, cls_name: str, difficulty: int):
    """Per-image GT/DT filtering -> (gt_care, gt_ignore, dt_care masks)."""
    d = DIFFICULTY[difficulty]
    gt_names = np.asarray(gt['name'])
    gt_same = gt_names == cls_name
    h = gt['bbox'][:, 3] - gt['bbox'][:, 1]
    valid = (gt.get('occluded', np.zeros(len(gt_names)))
             <= d['max_occlusion']) \
        & (gt.get('truncated', np.zeros(len(gt_names)))
           <= d['max_truncation'])
    gt_care = gt_same & valid
    # ignored: same class but filtered by difficulty, or 'DontCare'
    gt_ignore = (gt_same & ~valid) | (gt_names == 'DontCare')
    dt_names = np.asarray(dt['name'])
    dt_h = dt['bbox'][:, 3] - dt['bbox'][:, 1]
    dt_care = (dt_names == cls_name) & (dt_h >= d['min_height'])
    return gt_care, gt_ignore, dt_care


def _overlap(gt: Dict, dt: Dict, metric: str) -> np.ndarray:
    """(num_dt, num_gt) overlap matrix for one image."""
    if len(dt['name']) == 0 or len(gt['name']) == 0:
        return np.zeros((len(dt['name']), len(gt['name'])), np.float32)
    if metric == 'bbox':
        db, gb = dt['bbox'], gt['bbox']
        x1 = np.maximum(db[:, None, 0], gb[None, :, 0])
        y1 = np.maximum(db[:, None, 1], gb[None, :, 1])
        x2 = np.minimum(db[:, None, 2], gb[None, :, 2])
        y2 = np.minimum(db[:, None, 3], gb[None, :, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a_d = (db[:, 2] - db[:, 0]) * (db[:, 3] - db[:, 1])
        a_g = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
        return inter / np.maximum(a_d[:, None] + a_g[None] - inter, 1e-8)

    def rows(ann):
        loc, dim, ry = ann['location'], ann['dimensions'], ann['rotation_y']
        return np.concatenate([dim, loc, ry[:, None]], -1).astype(np.float32)

    if metric == 'bev':
        def bev(ann):
            r = rows(ann)
            return np.stack([r[:, 3], r[:, 5], r[:, 0], r[:, 2], r[:, 6]],
                            -1)
        return rotated_iou_matrix(bev(dt), bev(gt))
    if metric == '3d':
        return boxes_iou_3d(rows(dt), rows(gt))
    raise ValueError(metric)


def _assign(overlap, gt_care, gt_ignore, dt_care, dt_scores, min_overlap,
            score_thresh):
    """Greedy TP assignment at one score threshold -> (tp, fp, fn)."""
    num_dt, num_gt = overlap.shape
    dt_alive = dt_care & (dt_scores >= score_thresh)
    assigned = np.zeros(num_gt, bool)
    tp = fp = 0
    order = np.argsort(-dt_scores)
    for di in order:
        if not dt_alive[di]:
            continue
        ovs = overlap[di]
        best, best_gt = min_overlap, -1
        for gi in range(num_gt):
            if assigned[gi] or not gt_care[gi]:
                continue
            if ovs[gi] >= best:
                best, best_gt = ovs[gi], gi
        if best_gt >= 0:
            assigned[best_gt] = True
            tp += 1
        else:
            # matched an ignored gt? then neither tp nor fp
            ig = False
            for gi in range(num_gt):
                if gt_ignore[gi] and ovs[gi] >= min_overlap:
                    ig = True
                    break
            if not ig:
                fp += 1
    fn = int(np.sum(gt_care & ~assigned))
    return tp, fp, fn


def eval_class(gt_annos: List[Dict], dt_annos: List[Dict], cls_name: str,
               difficulty: int, metric: str, min_overlap: float,
               n_points: int = 40) -> Dict:
    """AP of one (class, difficulty, metric) setting over the dataset.

    Reference: kitti_utils/eval.py eval_class :455 (40-point recall
    interpolation, score-threshold sweep).
    """
    per_img = []
    all_scores = []
    total_gt = 0
    for gt, dt in zip(gt_annos, dt_annos):
        gt_care, gt_ignore, dt_care = _clean(gt, dt, cls_name, difficulty)
        ov = _overlap(gt, dt, metric)
        scores = np.asarray(dt.get('score', np.zeros(len(dt['name']))))
        per_img.append((ov, gt_care, gt_ignore, dt_care, scores))
        total_gt += int(gt_care.sum())
        # scores of TP candidates for threshold selection
        for di in np.nonzero(dt_care)[0]:
            if len(gt_care) and np.any(ov[di][gt_care] >= min_overlap):
                all_scores.append(scores[di])
    if total_gt == 0:
        return dict(ap=0.0, precision=np.zeros(n_points + 1),
                    recall=np.zeros(n_points + 1))
    all_scores = np.sort(np.asarray(all_scores))[::-1]
    # score thresholds at the evenly spaced recall points 1/n .. 1
    # (R40 convention; unreached recall points contribute zero precision)
    thresholds = []
    r_step = 1.0 / n_points
    current = r_step
    for i, s in enumerate(all_scores):
        recall = (i + 1) / total_gt
        while recall >= current - 1e-9 and len(thresholds) < n_points:
            thresholds.append(s)
            current += r_step
    thresholds = np.asarray(thresholds)

    precision = np.zeros(len(thresholds))
    recall = np.zeros(len(thresholds))
    for ti, thr in enumerate(thresholds):
        tp = fp = fn = 0
        for ov, gt_care, gt_ignore, dt_care, scores in per_img:
            t, f, n = _assign(ov, gt_care, gt_ignore, dt_care, scores,
                              min_overlap, thr)
            tp += t
            fp += f
            fn += n
        precision[ti] = tp / max(tp + fp, 1)
        recall[ti] = tp / max(tp + fn, 1)
    # interpolated AP: max precision at recall >= r, averaged over ALL
    # n_points recall positions (missing ones are zero)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap = float(np.sum(precision)) / n_points * 100.0
    return dict(ap=ap, precision=precision, recall=recall,
                thresholds=thresholds)


def kitti_eval(gt_annos: List[Dict], dt_annos: List[Dict],
               classes: Sequence[str] = ('Car', 'Pedestrian', 'Cyclist'),
               metrics: Sequence[str] = ('bbox', 'bev', '3d'),
               min_overlaps: Dict[str, Dict[str, float]] = None) -> Dict:
    """Full evaluation table. Reference: kitti_utils/eval.py:652."""
    if min_overlaps is None:
        min_overlaps = {
            'Car': {'bbox': 0.7, 'bev': 0.7, '3d': 0.7},
            'Pedestrian': {'bbox': 0.5, 'bev': 0.5, '3d': 0.5},
            'Cyclist': {'bbox': 0.5, 'bev': 0.5, '3d': 0.5},
        }
    out = {}
    for cls in classes:
        for metric in metrics:
            for diff, diff_name in zip((0, 1, 2),
                                       ('easy', 'moderate', 'hard')):
                res = eval_class(gt_annos, dt_annos, cls, diff, metric,
                                 min_overlaps.get(cls, {}).get(metric, 0.5))
                out[f'{cls}_{metric}_{diff_name}'] = res['ap']
    return out
