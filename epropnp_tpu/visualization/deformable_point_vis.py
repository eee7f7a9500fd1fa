"""Visualize sampled correspondence points per attention head.

Reference: EPro-PnP-Det/epropnp_det/core/visualizer/deformable_point_vis.py
(:34): scatter the deformable-attention sample locations onto the image,
one color per head, with marker size proportional to the correspondence
weight.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

HEAD_COLORS = [(255, 99, 71), (60, 179, 113), (65, 105, 225), (255, 165, 0),
               (186, 85, 211), (0, 206, 209), (250, 128, 114),
               (154, 205, 50)]


def draw_correspondence_points(img: np.ndarray, x2d: np.ndarray,
                               w2d: Optional[np.ndarray] = None,
                               num_heads: int = 8,
                               max_radius: int = 6) -> np.ndarray:
    """
    Args:
        img: (h, w, 3) BGR uint8.
        x2d: (num_points, 2) sample locations (heads interleaved as
            consecutive blocks of num_points // num_heads).
        w2d: optional (num_points, 2) weights controlling marker size.
    """
    out = img.copy()
    n = x2d.shape[0]
    per_head = max(n // num_heads, 1)
    if w2d is not None:
        w = np.mean(np.asarray(w2d), axis=-1)
        w = w / max(w.max(), 1e-12)
    else:
        w = np.ones(n)
    for i, (x, y) in enumerate(np.asarray(x2d)):
        head = min(i // per_head, num_heads - 1)
        r = max(1, int(round(w[i] * max_radius)))
        cv2.circle(out, (int(round(x)), int(round(y))), r,
                   HEAD_COLORS[head % len(HEAD_COLORS)], -1, cv2.LINE_AA)
    return out
