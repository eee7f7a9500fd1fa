"""Multi-view detection visualization: the framework's ``show_result``.

TPU-framework counterpart of the reference detector's rich result
renderer (EPro-PnP-Det/epropnp_det/models/detectors/epropnp_det.py:81-198),
which composes up to six views of one image's detections:

- ``'2d'``     axis-aligned 2D boxes with class label + score text
- ``'3d'``     projected 3D wireframes (score-thresholded)
- ``'bev'``    bird's-eye-view footprints, optionally with Monte Carlo
               pose-sample scatter and GT footprints
- ``'score'``  dense 3D-score map overlaid on the image
- ``'pts'``    deformable correspondence points colored per head
- ``'orient'`` per-detection yaw density curves (matplotlib)

All rendering is host-side numpy/cv2 over the ragged per-image
per-class arrays that ``det.test.results_to_numpy`` produces — the
device never participates, matching the reference where show_result is
a post-processing convenience, not part of the compiled graph.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .deformable_point_vis import draw_correspondence_points
from .image_bev_vis import PALETTE, draw_box_3d_pred, show_bev


def _flatten_per_class(per_class: Sequence[np.ndarray]):
    """Ragged per-class list -> (boxes, labels) concatenated arrays."""
    boxes, labels = [], []
    for c, arr in enumerate(per_class):
        arr = np.atleast_2d(np.asarray(arr))
        if arr.size == 0:
            continue
        boxes.append(arr)
        labels.append(np.full(arr.shape[0], c, np.int64))
    if not boxes:
        return np.zeros((0, 8)), np.zeros((0,), np.int64)
    return np.concatenate(boxes, axis=0), np.concatenate(labels)


def _draw_2d(img, bbox_2d_per_class, class_names, score_thr, thickness):
    """2D-box view (reference delegates to mmdet's imshow_det_bboxes —
    epropnp_det.py:143-157; same content drawn with cv2 here)."""
    out = img.copy()
    boxes, labels = _flatten_per_class(bbox_2d_per_class)
    for box, lab in zip(boxes, labels):
        x1, y1, x2, y2, score = box[:5]
        if score < score_thr:
            continue
        color = PALETTE[int(lab) % len(PALETTE)]
        cv2.rectangle(out, (int(x1), int(y1)), (int(x2), int(y2)), color,
                      thickness)
        name = (class_names[int(lab)] if class_names is not None
                else str(int(lab)))
        cv2.putText(out, f'{name} {score:.2f}', (int(x1), max(int(y1) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
    return out


def _draw_score_map(img, score_map):
    """Dense-score overlay: 0.8 * score + 0.2 * img (epropnp_det.py:159-164)."""
    score = np.asarray(score_map, np.float32)
    if score.ndim == 3:  # (num_cls, h, w) -> sum over classes
        score = score.sum(axis=0)
    score = score[:img.shape[0], :img.shape[1]]
    score = np.clip(score * 256.0, 0, 255).astype(np.uint8)
    return (score[..., None] * 0.8 + img * 0.2).astype(np.uint8)


def _draw_orient(out_dir, bbox_2d_per_class, orient_logprob_per_class,
                 img, class_names, score_thr):
    """Per-detection yaw-density plots + image patches
    (epropnp_det.py:172-198)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    os.makedirs(out_dir, exist_ok=True)
    for c, (boxes, logprobs) in enumerate(
            zip(bbox_2d_per_class, orient_logprob_per_class)):
        boxes = np.atleast_2d(np.asarray(boxes))
        for i, box in enumerate(boxes):
            if box.shape[-1] > 4 and box[4] < score_thr:
                continue
            name = (class_names[c] if class_names is not None else str(c))
            stem = os.path.join(out_dir, f'{name}_{i:02d}')
            x1, y1, x2, y2 = np.round(box[:4]).astype(np.int64)
            patch = img[max(y1, 0):max(y2, 0), max(x1, 0):max(x2, 0)]
            if patch.size:
                cv2.imwrite(stem + '.jpg', patch)
            lp = np.asarray(logprobs[i])
            bins = lp.shape[-1]
            xs = np.linspace(0, 2 * (bins - 1) / bins, bins)
            plt.figure(figsize=(4, 2))
            plt.plot(xs, np.exp(lp))
            plt.xlim([0, 2])
            plt.gca().set_ylim(bottom=0)
            plt.xticks([0, 0.5, 1, 1.5, 2],
                       ['0', r'$\pi$/2', r'$\pi$', r'3$\pi$/2', r'2$\pi$'])
            plt.gca().xaxis.grid(True)
            plt.xlabel('Yaw')
            plt.ylabel('Density')
            plt.tight_layout()
            plt.savefig(stem + '.png')
            plt.close()


def show_result(img: np.ndarray,
                bbox_2d_results: Sequence[np.ndarray],
                bbox_3d_results: Sequence[np.ndarray],
                cam_intrinsic: np.ndarray,
                gt_bboxes_3d: Optional[np.ndarray] = None,
                gt_labels: Optional[np.ndarray] = None,
                score_thr: float = 0.3,
                views: Sequence[str] = ('2d', '3d', 'bev'),
                extras: Optional[Dict[str, np.ndarray]] = None,
                class_names: Optional[Sequence[str]] = None,
                thickness: int = 2,
                bev_range: float = 55.0,
                out_file: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Render the requested views of one image's detections.

    Args:
        img: (h, w, 3) BGR uint8 original image.
        bbox_2d_results: per-class list of (m, 5) [x1 y1 x2 y2 score].
        bbox_3d_results: per-class list of (m, 8+) [l h w x y z ry score ...].
        extras: optional dict with any of
            ``'pose_samples'`` (per-detection (s, 4+) arrays for the BEV
            scatter), ``'score'`` dense score map for the 'score' view,
            ``'x2d'``/``'w2d'`` per-detection correspondence samples for
            the 'pts' view, ``'orient_logprob'`` per-class list of
            (m, bins) yaw log-densities for the 'orient' view, and
            ``'num_heads'`` for point coloring.
        out_file: if given, each view is written next to it with a view
            suffix (`<stem>_3d.jpg`, `<stem>_bev.png`, ...) matching the
            reference's file layout.

    Returns:
        Dict view-name -> rendered (h', w', 3) uint8 image ('orient'
        writes files only and is omitted unless out_file is set).
    """
    if cv2 is None:  # pragma: no cover
        raise ImportError('show_result requires cv2')
    extras = extras or {}
    img = np.asarray(img)
    boxes3d, labels3d = _flatten_per_class(bbox_3d_results)
    keep = boxes3d[:, 7] >= score_thr if boxes3d.shape[0] else \
        np.zeros(0, bool)
    rendered: Dict[str, np.ndarray] = {}

    if '2d' in views:
        rendered['2d'] = _draw_2d(img, bbox_2d_results, class_names,
                                  score_thr, thickness)
    if '3d' in views:
        rendered['3d'] = draw_box_3d_pred(
            img, boxes3d[keep], cam_intrinsic, labels=labels3d[keep],
            thickness=thickness)
    if 'bev' in views:
        samples = extras.get('pose_samples')
        if samples is not None:
            samples = [np.asarray(s) for k, s in zip(keep, samples) if k]
        rendered['bev'] = show_bev(
            boxes3d[keep], labels=labels3d[keep], pose_samples=samples,
            gt_bboxes_3d=gt_bboxes_3d, view_range=bev_range)
    if 'score' in views and 'score' in extras:
        rendered['score'] = _draw_score_map(img, extras['score'])
    if 'pts' in views and 'x2d' in extras:
        x2d = np.asarray(extras['x2d']).reshape(-1, 2)
        w2d = extras.get('w2d')
        if w2d is not None:
            w2d = np.asarray(w2d).reshape(-1, 2)
        rendered['pts'] = draw_correspondence_points(
            img, x2d, w2d, num_heads=int(extras.get('num_heads', 8)))

    if out_file is not None:
        stem = os.path.splitext(out_file)[0]
        suffix = {'2d': '_2d.jpg', '3d': '_3d.jpg', 'bev': '_bev.png',
                  'score': '_score.jpg', 'pts': '_pts.jpg'}
        for name, image in rendered.items():
            cv2.imwrite(stem + suffix[name], image)
        if 'orient' in views and 'orient_logprob' in extras:
            _draw_orient(stem + '_orient', bbox_2d_results,
                         extras['orient_logprob'], img, class_names,
                         score_thr)
    return rendered
