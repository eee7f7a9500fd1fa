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


# per-object fields aligned with gt_bboxes rows (reference crop_3d misc
# list, transforms.py:161) — filtered together on every crop
_ALIGNED_GT_FIELDS = ('gt_labels', 'gt_bboxes_3d', 'gt_velo', 'gt_attr',
                      'truncation', 'gt_x3d', 'gt_x2d')
_DENSE_FIELDS = ('img_dense_x2d', 'img_dense_x2d_mask')


def _filter_aligned(sample: Dict, valid: np.ndarray):
    for key in _ALIGNED_GT_FIELDS:
        if key in sample:
            v = sample[key]
            if isinstance(v, list):
                sample[key] = [v[i] for i in np.flatnonzero(valid)]
            elif len(v):
                sample[key] = v[valid]


def crop_3d(sample: Dict, crop_box, trunc_ignore_thres: float = -1.0,
            allow_negative_crop: bool = False) -> Optional[Dict]:
    """Fixed-window crop keeping boxes/dense fields consistent.

    Reference: transforms.py:84-186 (``crop_3d``) + the Crop3D pipeline
    stage; the released configs crop the sky band with
    ``crop_box=(0, 228, 1600, 900)`` in BOTH train and test pipelines
    (configs/epropnp_det_basic.py:173,190), making the effective input
    geometry 1600x672. Coordinate VALUES are untouched (the dense x2d
    map still carries original pixel coordinates; the head corrects
    geometry through it) — only pixels and 2D boxes move.

    With ``trunc_ignore_thres`` > 0, GT whose visible (clipped) area
    falls below ``(1 - thres)`` of its un-truncated full area — the
    stored per-object ``truncation`` un-discounts the pre-crop area —
    is moved to ``gt_bboxes_ignore`` (transforms.py:119-147).

    Returns None when no valid GT remains and ``allow_negative_crop``
    is False (the reference skips such samples).
    """
    x1, y1, x2, y2 = (int(v) for v in crop_box)
    sample['img'] = sample['img'][y1:y2, x1:x2]
    h, w = sample['img'].shape[:2]
    sample['img_shape'] = (h, w)
    for key in _DENSE_FIELDS:
        if key in sample:
            sample[key] = sample[key][y1:y2, x1:x2]

    offset = np.array([x1, y1, x1, y1], np.float32)
    if 'gt_bboxes_ignore' in sample and len(sample['gt_bboxes_ignore']):
        big = np.asarray(sample['gt_bboxes_ignore'], np.float32) - offset
        big[:, 0::2] = np.clip(big[:, 0::2], 0, w)
        big[:, 1::2] = np.clip(big[:, 1::2], 0, h)
        sample['gt_bboxes_ignore'] = big[
            (big[:, 2] > big[:, 0]) & (big[:, 3] > big[:, 1])]

    if 'gt_bboxes' not in sample:
        return sample
    bboxes_ori = np.asarray(sample['gt_bboxes'], np.float32) - offset
    if len(bboxes_ori) == 0:
        return sample if allow_negative_crop else None
    bboxes = bboxes_ori.copy()
    bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, w)
    bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, h)
    valid = (bboxes[:, 2] > bboxes[:, 0]) & (bboxes[:, 3] > bboxes[:, 1])
    if not valid.any() and not allow_negative_crop:
        return None
    if trunc_ignore_thres > 0:
        area_ori = np.prod(bboxes_ori[:, 2:] - bboxes_ori[:, :2], axis=1)
        if 'truncation' in sample and len(sample['truncation']):
            trunc = np.asarray(sample['truncation'], np.float32)
            area_ori = area_ori / np.clip(1.0 - trunc, 1e-4, None)
        area_new = np.prod(bboxes[:, 2:] - bboxes[:, :2], axis=1)
        ignore = valid & (area_new < (1.0 - trunc_ignore_thres) * area_ori)
        valid = valid & ~ignore
        if ignore.any():
            extra = bboxes[ignore]
            prev = sample.get('gt_bboxes_ignore')
            sample['gt_bboxes_ignore'] = (
                np.concatenate([np.asarray(prev, np.float32).reshape(-1, 4),
                                extra]) if prev is not None and len(prev)
                else extra)
    sample['gt_bboxes'] = bboxes[valid]
    _filter_aligned(sample, valid)
    return sample


def random_crop_3d(sample: Dict, rng: np.random.Generator,
                   crop_size: Tuple[int, int],
                   trunc_ignore_thres: float = -1.0,
                   allow_negative_crop: bool = False) -> Optional[Dict]:
    """Random fixed-size crop (reference RandomCrop3D, transforms.py:
    222-253): uniform offset within the margins, then ``crop_3d``."""
    h, w = sample['img'].shape[:2]
    ch, cw = crop_size
    oy = int(rng.integers(0, max(h - ch, 0) + 1))
    ox = int(rng.integers(0, max(w - cw, 0) + 1))
    return crop_3d(sample, (ox, oy, ox + cw, oy + ch),
                   trunc_ignore_thres, allow_negative_crop)


def min_iou_random_crop_3d(sample: Dict, rng: np.random.Generator,
                           min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                           min_crop_size: float = 0.3,
                           max_tries: int = 50) -> Dict:
    """Min-IoU random crop (reference MinIoURandomCrop3D, transforms.py:
    256-341): pick a random mode from (1, *min_ious); mode 1 = no crop;
    else sample patches until every GT overlaps the patch by >= min_iou,
    keep boxes whose CENTER lies inside the patch, clip them to it.
    Deviation (documented): the reference filters only labels/masks by
    the center mask and leaves ``gt_bboxes_3d``/velo/attr misaligned —
    unused by the released configs; here all aligned fields are filtered
    consistently."""
    if 'gt_bboxes' not in sample or len(sample['gt_bboxes']) == 0:
        return sample
    h, w = sample['img'].shape[:2]
    mode = rng.choice(np.array((1.0,) + tuple(min_ious)))
    if mode == 1.0:
        return sample
    boxes = np.asarray(sample['gt_bboxes'], np.float32)
    for _ in range(max_tries):
        nw = rng.uniform(min_crop_size * w, w)
        nh = rng.uniform(min_crop_size * h, h)
        if nh / nw < 0.5 or nh / nw > 2:
            continue
        left, top = rng.uniform(0, w - nw), rng.uniform(0, h - nh)
        patch = np.array([int(left), int(top),
                          int(left + nw), int(top + nh)])
        if patch[2] == patch[0] or patch[3] == patch[1]:
            continue
        ix1 = np.maximum(boxes[:, 0], patch[0])
        iy1 = np.maximum(boxes[:, 1], patch[1])
        ix2 = np.minimum(boxes[:, 2], patch[2])
        iy2 = np.minimum(boxes[:, 3], patch[3])
        inter = (np.clip(ix2 - ix1, 0, None)
                 * np.clip(iy2 - iy1, 0, None))
        union = (np.prod(boxes[:, 2:] - boxes[:, :2], axis=1)
                 + (patch[2] - patch[0]) * (patch[3] - patch[1]) - inter)
        if len(inter) and (inter / np.maximum(union, 1e-9)).min() < mode:
            continue
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2
        center_in = ((centers[:, 0] > patch[0]) & (centers[:, 1] > patch[1])
                     & (centers[:, 0] < patch[2])
                     & (centers[:, 1] < patch[3]))
        if not center_in.any():
            continue
        kept = boxes[center_in].copy()
        kept[:, 2:] = np.minimum(kept[:, 2:], patch[2:])
        kept[:, :2] = np.maximum(kept[:, :2], patch[:2])
        kept -= np.tile(patch[:2], 2).astype(np.float32)
        sample['gt_bboxes'] = kept
        _filter_aligned(sample, center_in)
        if 'gt_bboxes_ignore' in sample and len(sample['gt_bboxes_ignore']):
            big = np.asarray(sample['gt_bboxes_ignore'], np.float32)
            bc = (big[:, :2] + big[:, 2:]) / 2
            bin_ = ((bc[:, 0] > patch[0]) & (bc[:, 1] > patch[1])
                    & (bc[:, 0] < patch[2]) & (bc[:, 1] < patch[3]))
            big = big[bin_].copy()
            big[:, 2:] = np.minimum(big[:, 2:], patch[2:])
            big[:, :2] = np.maximum(big[:, :2], patch[:2])
            sample['gt_bboxes_ignore'] = big - np.tile(
                patch[:2], 2).astype(np.float32)
        sample['img'] = sample['img'][patch[1]:patch[3],
                                      patch[0]:patch[2]]
        sample['img_shape'] = sample['img'].shape[:2]
        for key in _DENSE_FIELDS:
            if key in sample:
                sample[key] = sample[key][patch[1]:patch[3],
                                          patch[0]:patch[2]]
        return sample
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


# the released configs' sky-band crop: 1600x900 -> 1600x672
# (configs/epropnp_det_basic.py:173,190)
REFERENCE_CROP_BOX = (0, 228, 1600, 900)


def default_pipeline(sample: Dict, rng: Optional[np.random.Generator] = None,
                     scale: float = 1.0, flip_prob: float = 0.5,
                     size_divisor: int = 32, training: bool = True,
                     crop_box=None,
                     trunc_ignore_thres: float = 0.8,
                     scale_jitter: Optional[Tuple[float, float]] = None,
                     ) -> Optional[Dict]:
    """Reference stage order (basic.py:162-196): load -> [resize] ->
    flip -> crop -> normalize -> pad. Real-data drivers pass
    ``crop_box=REFERENCE_CROP_BOX`` (the released configs crop BOTH
    train and test inputs to 1600x672); the default None keeps
    synthetic scenes, which are generated at their final geometry,
    uncropped. ``scale_jitter=(lo, hi)`` draws a random resize ratio
    (Resize3D ratio_range). Returns None when the crop leaves no valid
    GT in a training sample (reference ``allow_negative_crop=False``)."""
    sample = load_image_3d(sample)
    rng = rng or np.random.default_rng()
    if scale_jitter is not None and training:
        scale = scale * float(rng.uniform(*scale_jitter))
    if scale != 1.0:
        sample = resize_3d(sample, scale)
    if training and flip_prob > 0:
        sample = random_flip_3d(sample, rng, flip_prob)
    if crop_box is not None:
        box = np.asarray(crop_box, np.float64)
        if scale != 1.0:
            box = box * scale
        sample = crop_3d(sample, box.round().astype(int),
                         trunc_ignore_thres if training else -1.0,
                         allow_negative_crop=not training)
        if sample is None:
            return None
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
