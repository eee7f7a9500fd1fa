"""Image + bird's-eye-view visualization of 3D detections (host-side).

Reference: EPro-PnP-Det/epropnp_det/core/visualizer/image_bev_vis.py
(show_bev :35, draw_box_3d_pred :120). numpy/cv2 reimplementation: 3D box
wireframes projected with frustum z-clipping, and a BEV canvas with box
footprints, optional Monte Carlo pose-sample scatter, and camera FoV rays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# per-class draw colors (BGR), roughly matching the reference palette
PALETTE = [(70, 130, 255), (60, 180, 90), (220, 90, 60), (240, 160, 40),
           (160, 60, 220), (50, 200, 220), (140, 140, 140), (30, 220, 160),
           (200, 60, 160), (90, 90, 230)]

_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]
_UNIT = np.array(
    [[0.5, 0.5, 0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5], [-0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5], [0.5, -0.5, -0.5], [-0.5, -0.5, -0.5],
     [-0.5, -0.5, 0.5]], np.float64)


def _corners(bbox_3d):
    l, h, w, x, y, z, ry = bbox_3d[:7]
    c, s = np.cos(ry), np.sin(ry)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (_UNIT * [l, h, w]) @ rot.T + [x, y, z]


def draw_box_3d_pred(img: np.ndarray, bboxes_3d: np.ndarray, cam_k: np.ndarray,
                     labels: Optional[np.ndarray] = None, z_clip: float = 0.1,
                     thickness: int = 2) -> np.ndarray:
    """Draw 3D wireframes onto an image (BGR uint8, modified copy)."""
    out = img.copy()
    for i, box in enumerate(np.atleast_2d(bboxes_3d)):
        color = PALETTE[int(labels[i]) % len(PALETTE)] \
            if labels is not None else PALETTE[0]
        corners = _corners(box)
        for a, b in _EDGES:
            pa, pb = corners[a], corners[b]
            # z-clip the segment against the near plane
            za, zb = pa[2], pb[2]
            if za < z_clip and zb < z_clip:
                continue
            if za < z_clip or zb < z_clip:
                t = (z_clip - za) / (zb - za)
                p_clip = pa + t * (pb - pa)
                if za < z_clip:
                    pa = p_clip
                else:
                    pb = p_clip
            ua = cam_k @ pa
            ub = cam_k @ pb
            ua = (ua[:2] / ua[2]).astype(int)
            ub = (ub[:2] / ub[2]).astype(int)
            cv2.line(out, tuple(ua), tuple(ub), color, thickness,
                     cv2.LINE_AA)
    return out


def show_bev(bboxes_3d: np.ndarray, labels: Optional[np.ndarray] = None,
             pose_samples: Optional[Sequence[np.ndarray]] = None,
             gt_bboxes_3d: Optional[np.ndarray] = None,
             view_range: float = 55.0, canvas_px: int = 600,
             cam_fov_deg: float = 70.0) -> np.ndarray:
    """Render a BEV canvas (camera at the bottom center, z up the canvas)."""
    canvas = np.full((canvas_px, canvas_px, 3), 245, np.uint8)
    scale = canvas_px / view_range

    def to_px(xz):
        u = canvas_px / 2 + xz[..., 0] * scale
        v = canvas_px - xz[..., 1] * scale
        return np.stack([u, v], axis=-1).astype(int)

    # camera FoV rays
    half = np.radians(cam_fov_deg / 2)
    origin = to_px(np.zeros(2))
    for ang in (-half, half):
        tip = to_px(np.array([np.sin(ang), np.cos(ang)]) * view_range * 2)
        cv2.line(canvas, tuple(origin), tuple(tip), (200, 200, 200), 1,
                 cv2.LINE_AA)

    def draw_footprint(box, color, thickness=2):
        l, _, w, x, _, z, ry = box[:7]
        c, s = np.cos(ry), np.sin(ry)
        pts = np.array([[l / 2, w / 2], [l / 2, -w / 2], [-l / 2, -w / 2],
                        [-l / 2, w / 2]])
        rot = np.array([[c, s], [-s, c]])
        xz = pts @ rot.T + [x, z]
        px = to_px(xz)
        cv2.polylines(canvas, [px.reshape(-1, 1, 2)], True, color,
                      thickness, cv2.LINE_AA)
        # heading tick
        head = to_px(np.array([[x, z], [x + np.cos(ry) * l / 2 * 1.4,
                                        z - np.sin(ry) * l / 2 * 1.4]]))
        cv2.line(canvas, tuple(head[0]), tuple(head[1]), color, 1,
                 cv2.LINE_AA)

    if gt_bboxes_3d is not None:
        for box in np.atleast_2d(gt_bboxes_3d):
            draw_footprint(box, (180, 180, 180), 1)
    if pose_samples is not None:
        for i, samples in enumerate(pose_samples):
            color = PALETTE[int(labels[i]) % len(PALETTE)] \
                if labels is not None else PALETTE[0]
            pts = to_px(np.asarray(samples)[:, [0, 2]])
            inside = ((pts >= 0) & (pts < canvas_px)).all(-1)
            canvas[pts[inside, 1], pts[inside, 0]] = color
    for i, box in enumerate(np.atleast_2d(bboxes_3d)):
        color = PALETTE[int(labels[i]) % len(PALETTE)] \
            if labels is not None else PALETTE[0]
        draw_footprint(box, color)
    return canvas
