"""Host-side data pipeline for the Det suite (numpy/cv2).

Covers the reference pipeline stages
(EPro-PnP-Det/epropnp_det/datasets/pipelines/): image loading with the
dense original-coordinate map ``img_dense_x2d`` (loading.py:104-117),
Resize3D / RandomFlip3D / Pad3D keeping dense fields consistent
(transforms.py:18-300 — geometric correction happens in the head via the
x2d map and the flip flag, so the transforms only move PIXELS, never the
coordinate VALUES), normalization, and fixed-shape collation into
``DetBatch``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


def gen_img_dense_x2d(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W, 2) original pixel coordinates + all-ones mask."""
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    return np.stack([xs, ys], axis=-1), np.ones((h, w, 1), np.float32)


def load_image_3d(sample: Dict) -> Dict:
    """Populate img / cam_intrinsic / dense x2d. Reference: loading.py:82-133."""
    img = sample['img']
    h, w = img.shape[:2]
    x2d, mask = gen_img_dense_x2d(h, w)
    sample.update(
        img_shape=(h, w), ori_shape=(h, w), flip=False,
        img_dense_x2d=x2d, img_dense_x2d_mask=mask)
    return sample


def resize_3d(sample: Dict, scale: float) -> Dict:
    """Resize image + dense fields (values untouched). Ref: transforms.py."""
    img = sample['img']
    h, w = img.shape[:2]
    nh, nw = int(round(h * scale)), int(round(w * scale))
    sample['img'] = cv2.resize(img, (nw, nh),
                               interpolation=cv2.INTER_LINEAR)
    sample['img_dense_x2d'] = cv2.resize(
        sample['img_dense_x2d'], (nw, nh), interpolation=cv2.INTER_LINEAR)
    sample['img_dense_x2d_mask'] = cv2.resize(
        sample['img_dense_x2d_mask'], (nw, nh),
        interpolation=cv2.INTER_LINEAR)[..., None]
    sample['img_shape'] = (nh, nw)
    sample['scale_factor'] = scale
    if 'gt_bboxes' in sample and len(sample['gt_bboxes']):
        sample['gt_bboxes'] = sample['gt_bboxes'] * scale
    return sample


def random_flip_3d(sample: Dict, rng: np.random.Generator,
                   prob: float = 0.5) -> Dict:
    """Horizontal flip: pixels move, coordinate values stay; the head
    corrects geometry via the flip flag. Reference: transforms.py flip."""
    if rng.random() >= prob:
        return sample
    sample['img'] = sample['img'][:, ::-1].copy()
    sample['img_dense_x2d'] = sample['img_dense_x2d'][:, ::-1].copy()
    sample['img_dense_x2d_mask'] = \
        sample['img_dense_x2d_mask'][:, ::-1].copy()
    sample['flip'] = True
    if 'gt_bboxes' in sample and len(sample['gt_bboxes']):
        w = sample['img_shape'][1]
        b = sample['gt_bboxes'].copy()
        b[:, [0, 2]] = w - sample['gt_bboxes'][:, [2, 0]]
        sample['gt_bboxes'] = b
    return sample


def normalize_img(sample: Dict, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> Dict:
    sample['img'] = (sample['img'].astype(np.float32) - mean) / std
    return sample


def pad_3d(sample: Dict, size_divisor: int = 32) -> Dict:
    """Zero-pad image + dense fields to a stride multiple; mask the pad."""
    h, w = sample['img_shape']
    ph = int(np.ceil(h / size_divisor)) * size_divisor
    pw = int(np.ceil(w / size_divisor)) * size_divisor
    for k in ('img', 'img_dense_x2d', 'img_dense_x2d_mask'):
        a = sample[k]
        out = np.zeros((ph, pw) + a.shape[2:], a.dtype)
        out[:h, :w] = a
        sample[k] = out
    sample['pad_shape'] = (ph, pw)
    return sample


def default_pipeline(sample: Dict, rng: Optional[np.random.Generator] = None,
                     scale: float = 1.0, flip_prob: float = 0.5,
                     size_divisor: int = 32, training: bool = True) -> Dict:
    sample = load_image_3d(sample)
    if scale != 1.0:
        sample = resize_3d(sample, scale)
    if training and flip_prob > 0:
        sample = random_flip_3d(sample, rng or np.random.default_rng(),
                                flip_prob)
    sample = normalize_img(sample)
    return pad_3d(sample, size_divisor)


def collate_det_batch(samples: List[Dict], max_gt: int,
                      max_pts: int = 0):
    """Stack pipeline outputs into a fixed-shape ``DetBatch``."""
    import jax.numpy as jnp
    from .train import DetBatch
    n = len(samples)
    hw = samples[0]['img'].shape[:2]
    g2d = np.zeros((n, max_gt, 4), np.float32)
    g3d = np.zeros((n, max_gt, 7), np.float32)
    glab = np.zeros((n, max_gt), np.int32)
    gmask = np.zeros((n, max_gt), bool)
    gvelo = np.full((n, max_gt, 2), np.nan, np.float32)
    gattr = np.full((n, max_gt), len(
        samples[0].get('attributes', range(9))) - 1, np.int32)
    with_pts = max_pts > 0 and 'gt_x3d' in samples[0]
    if with_pts:
        x3dp = np.zeros((n, max_gt, max_pts, 3), np.float32)
        x2dp = np.zeros((n, max_gt, max_pts, 2), np.float32)
        pmask = np.zeros((n, max_gt, max_pts), bool)
    for i, s in enumerate(samples):
        k = min(len(s.get('gt_bboxes', [])), max_gt)
        if k:
            g2d[i, :k] = s['gt_bboxes'][:k]
            g3d[i, :k] = s['gt_bboxes_3d'][:k]
            glab[i, :k] = s['gt_labels'][:k]
            gmask[i, :k] = True
            if 'gt_velo' in s:
                gvelo[i, :k] = s['gt_velo'][:k]
            if 'gt_attr' in s:
                gattr[i, :k] = s['gt_attr'][:k]
            if with_pts:
                for g in range(k):
                    p = min(len(s['gt_x3d'][g]), max_pts)
                    if p:
                        x3dp[i, g, :p] = s['gt_x3d'][g][:p]
                        x2dp[i, g, :p] = s['gt_x2d'][g][:p]
                        pmask[i, g, :p] = True
    return DetBatch(
        img=jnp.asarray(np.stack([s['img'] for s in samples])),
        cam_intrinsic=jnp.asarray(
            np.stack([s['cam_intrinsic'] for s in samples]), jnp.float32),
        img_shapes=jnp.asarray(
            np.array([s['img_shape'] for s in samples], np.float32)),
        ori_shapes=jnp.asarray(
            np.array([s['ori_shape'] for s in samples], np.float32)),
        img_flips=jnp.asarray(np.array([s['flip'] for s in samples])),
        img_dense_x2d=jnp.asarray(
            np.stack([s['img_dense_x2d'] for s in samples])),
        img_dense_x2d_mask=jnp.asarray(
            np.stack([s['img_dense_x2d_mask'] for s in samples])),
        gt_bboxes=jnp.asarray(g2d),
        gt_bboxes_3d=jnp.asarray(g3d),
        gt_labels=jnp.asarray(glab),
        gt_mask=jnp.asarray(gmask),
        gt_velo=jnp.asarray(gvelo),
        gt_attr=jnp.asarray(gattr),
        gt_x3d=jnp.asarray(x3dp) if with_pts else None,
        gt_x2d=jnp.asarray(x2dp) if with_pts else None,
        gt_pts_mask=jnp.asarray(pmask) if with_pts else None,
    )
