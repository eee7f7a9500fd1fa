"""3D box geometry: projection, corner computation, frustum clipping,
3D->2D boxes, BEV NMS glue (pure JAX, fixed shapes).

Reference: EPro-PnP-Det/epropnp_det/core/bbox_3d/misc.py:15-324. The
reference's data-dependent ``nonzero`` scatter in ``edge_intersection``
becomes a static unrolled masked update over the 12 box edges (identical
write ordering); NMS uses the JAX rotated NMS instead of ``iou3d_cuda``.

Box layout: ``bbox_3d = [l, h, w, x, y, z, ry]`` (camera frame, y down).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bbox_3d.nms import nms_rotated
from ...ops.pnp.common import yaw_to_rot_mat


def gen_unit_noc(num_pts: int, dtype=jnp.float32) -> jnp.ndarray:
    """Fibonacci-sphere unit directions (num_pts, 3). Reference: misc.py:15."""
    indices = jnp.arange(num_pts, dtype=dtype) + 0.5
    phi = jnp.arccos(1.0 - 2.0 * indices / num_pts)
    theta = math.pi * (1.0 + 5.0 ** 0.5) * indices
    return jnp.stack([jnp.cos(theta) * jnp.sin(phi),
                      jnp.sin(theta) * jnp.sin(phi),
                      jnp.cos(phi)], axis=-1)


def project_to_image_r_mat(x3d, r_mat, t_vec, cam_intrinsic, img_shapes,
                           z_min: float = 0.5, allowed_border: float = 200,
                           return_z: bool = False,
                           return_clip_mask: bool = False):
    """Project (*, n, 3) points with border clamping. Ref: misc.py:26-64."""
    proj_r = cam_intrinsic @ r_mat
    proj_t = jnp.einsum('...ij,...j->...i', cam_intrinsic, t_vec)
    xyz = jnp.einsum('...ij,...nj->...ni', proj_r, x3d) + proj_t[..., None, :]
    z = xyz[..., 2:]
    z_clip_mask = z < z_min
    z = jnp.maximum(z, z_min)
    x2d = xyz[..., :2] / z
    x2d_min = -allowed_border - 0.5
    x2d_max = img_shapes[..., None, ::-1] + (allowed_border - 0.5)
    clip_mask = None
    if return_clip_mask:
        oob = (x2d < x2d_min) | (x2d > x2d_max)
        clip_mask = z_clip_mask[..., 0] | jnp.any(oob, axis=-1)
    x2d = jnp.minimum(jnp.maximum(x2d, x2d_min), x2d_max)
    outs = (x2d,)
    if return_z:
        outs = outs + (z,)
    if return_clip_mask:
        outs = outs + (clip_mask,)
    return outs[0] if len(outs) == 1 else outs


def project_to_image(x3d, pose, cam_intrinsic, img_shapes, z_min: float = 0.5,
                     allowed_border: float = 200, return_z: bool = False,
                     return_clip_mask: bool = False):
    """4DoF pose [x, y, z, yaw] variant. Reference: misc.py:67-86."""
    return project_to_image_r_mat(
        x3d, yaw_to_rot_mat(pose[..., 3]), pose[..., :3], cam_intrinsic,
        img_shapes, z_min, allowed_border, return_z, return_clip_mask)


def rot_mat_to_yaw(rot_mat: jnp.ndarray) -> jnp.ndarray:
    """(*, 3, 3) -> (*). Reference: misc.py:117-129."""
    return jnp.arctan2(rot_mat[..., 0, 2] - rot_mat[..., 2, 0],
                       rot_mat[..., 0, 0] + rot_mat[..., 2, 2])


# corner layout & edges of a camera-frame box. Reference: misc.py:155-194.
_EDGE_CORNER_IDX = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
     [0, 4], [1, 5], [2, 6], [3, 7]])
_UNIT_CORNERS = np.array(
    [[0.5, 0.5, 0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5], [-0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5], [0.5, -0.5, -0.5], [-0.5, -0.5, -0.5],
     [-0.5, -0.5, 0.5]], dtype=np.float32)


def compute_box_3d(bbox_3d: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, np.ndarray]:
    """(*, 7) [l, h, w, x, y, z, ry] -> corners (*, 8, 3) + edge index."""
    rot = yaw_to_rot_mat(bbox_3d[..., 6])
    corners = jnp.asarray(_UNIT_CORNERS, bbox_3d.dtype) \
        * bbox_3d[..., None, :3]
    corners = jnp.einsum('...ij,...nj->...ni', rot, corners) \
        + bbox_3d[..., None, 3:6]
    return corners, _EDGE_CORNER_IDX


def edge_intersection(corners, edge_corner_idx, clip_axis, clip_val, op,
                      edge_valid_mask=None):
    """Clip box edges against an axis-aligned half-space.

    Vectorized equivalent of the reference's nonzero-scatter
    (misc.py:197-240): all 12 candidate intersections are computed from the
    entry state and written in edge order (later edges win on conflicting
    corners), keeping shapes static under jit.

    Args:
        corners: (bs, 8, d); clip_val: (bs,); op: 'greater' | 'less'.
    """
    cmp = (jnp.greater if op == 'greater' else jnp.less)
    bs = corners.shape[0]
    e0 = edge_corner_idx[:, 0]
    e1 = edge_corner_idx[:, 1]
    if edge_valid_mask is None:
        edge_valid_mask = jnp.ones((bs, len(e0)), bool)

    corners_inside = cmp(corners[..., clip_axis], clip_val[:, None])  # (bs,8)
    edges_clipped = (corners_inside[:, e0] ^ corners_inside[:, e1]) \
        & edge_valid_mask  # (bs, 12)

    p0 = corners[:, e0, :]                      # (bs, 12, d)
    p1 = corners[:, e1, :]
    a0 = p0[..., clip_axis]
    a1 = p1[..., clip_axis]
    w0 = a1 - clip_val[:, None]
    w1 = clip_val[:, None] - a0
    inv = jnp.clip(1.0 / jnp.where(a1 == a0, 1e-12, a1 - a0), -1e6, 1e6)
    inter = (p0 * w0[..., None] + p1 * w1[..., None]) * inv[..., None]
    # replace the outside endpoint of each clipped edge
    clip_idx = jnp.where(cmp(a0, clip_val[:, None]),
                         jnp.broadcast_to(e1, (bs, len(e1))),
                         jnp.broadcast_to(e0, (bs, len(e0))))  # (bs, 12)

    new_corners = corners
    new_inside = corners_inside
    for e in range(len(e0)):
        onehot = jax.nn.one_hot(clip_idx[:, e], corners.shape[1],
                                dtype=bool)  # (bs, 8)
        write = onehot & edges_clipped[:, e:e + 1]
        new_corners = jnp.where(write[..., None], inter[:, e:e + 1, :],
                                new_corners)
        new_inside = new_inside | write
    edge_valid_mask = edge_valid_mask \
        & new_inside[:, e0] & new_inside[:, e1]
    return new_corners, new_inside, edge_valid_mask


def bboxes_3d_to_2d(bbox_3d, cam_intrinsic, imsize, z_clip: float = 0.1,
                    min_size: float = 4.0, clip: bool = False):
    """(bs, 7) boxes -> (bs, 4) image boxes + validity. Ref: misc.py:238-275."""
    bs = bbox_3d.shape[0]
    if bs == 0:
        return (jnp.zeros((0, 4), bbox_3d.dtype), jnp.zeros((0,), bool))
    corners, edge_idx = compute_box_3d(bbox_3d)
    zc = jnp.full((bs,), z_clip, bbox_3d.dtype)
    corners, in_front, valid = edge_intersection(
        corners, edge_idx, 2, zc, 'greater')
    pts = jnp.einsum('...ni,...ji->...nj', corners, cam_intrinsic)
    pts_2d = pts[..., :2] / jnp.maximum(pts[..., 2:], z_clip) + 0.5
    in_canvas = in_front
    if clip:
        zero = jnp.zeros((bs,), bbox_3d.dtype)
        pts_2d, cx0, valid = edge_intersection(
            pts_2d, edge_idx, 0, zero, 'greater', valid)
        pts_2d, cy0, valid = edge_intersection(
            pts_2d, edge_idx, 1, zero, 'greater', valid)
        pts_2d, cx1, valid = edge_intersection(
            pts_2d, edge_idx, 0, imsize[:, 1], 'less', valid)
        pts_2d, cy1, valid = edge_intersection(
            pts_2d, edge_idx, 1, imsize[:, 0], 'less', valid)
        in_canvas = in_canvas & cx0 & cx1 & cy0 & cy1
    wh = imsize[:, None, ::-1]
    big = jnp.where(in_canvas[..., None], pts_2d,
                    jnp.broadcast_to(wh, pts_2d.shape))
    x0y0 = jnp.maximum(jnp.min(big, axis=1), 0.0)
    small = jnp.where(in_canvas[..., None], pts_2d, 0.0)
    x1y1 = jnp.minimum(jnp.max(small, axis=1), imsize[:, ::-1])
    bbox = jnp.concatenate([x0y0, x1y1], axis=1)
    bbox_valid = jnp.min(x1y1 - x0y0, axis=1) >= min_size
    return bbox, bbox_valid


def xywhr2xyxyr(boxes_xywhr: jnp.ndarray) -> jnp.ndarray:
    """Rotated boxes XYWHR -> XYXYR. Reference: misc.py:278-297."""
    half_w = boxes_xywhr[:, 2] / 2
    half_h = boxes_xywhr[:, 3] / 2
    return jnp.stack([
        boxes_xywhr[:, 0] - half_w, boxes_xywhr[:, 1] - half_h,
        boxes_xywhr[:, 0] + half_w, boxes_xywhr[:, 1] + half_h,
        boxes_xywhr[:, 4]], axis=-1)


def batched_bev_nms(bbox_3d: jnp.ndarray, batch_inds: jnp.ndarray,
                    nms_thr: float = 0.25) -> jnp.ndarray:
    """BEV NMS across classes/images via the coordinate-offset trick.

    Args:
        bbox_3d: (n, 8+) [l, h, w, x, y, z, ry, score, ...].
        batch_inds: (n,) int class/image group id.

    Returns: (n,) bool keep mask. Reference: misc.py:300-324
    (the reference returns gathered boxes; fixed shapes keep a mask here).
    """
    n = bbox_3d.shape[0]
    if n <= 1:
        return jnp.ones((n,), bool)
    bev = jnp.stack([bbox_3d[:, 3], bbox_3d[:, 5], bbox_3d[:, 0],
                     bbox_3d[:, 2], bbox_3d[:, 6]], axis=-1)
    span = jnp.max(bev[:, :2] + bev[:, 2:4]) - jnp.min(bev[:, :2]
                                                       - bev[:, 2:4])
    offset = (span * 2.0) * batch_inds.astype(bev.dtype)
    bev = bev.at[:, :2].add(offset[:, None])
    return nms_rotated(bev, bbox_3d[:, 7], nms_thr)


def batched_bev_nms_per_image(bbox_3d: jnp.ndarray, class_inds: jnp.ndarray,
                              n_img: int,
                              nms_thr: float = 0.25) -> jnp.ndarray:
    """:func:`batched_bev_nms` vmapped over per-image blocks.

    ``bbox_3d (n_img*k, 8+)`` must be image-contiguous (the
    ``FCOSEmbHead.get_preds`` layout); ``class_inds`` groups by class
    WITHIN an image (cross-image suppression is impossible once images
    are separate vmap lanes, and the smaller coordinate offsets also
    keep the offset trick well inside f32 resolution). Replaces one
    O((n_img*k)^2) rotated-IoU matrix with n_img parallel O(k^2) ones.
    """
    k = bbox_3d.shape[0] // n_img
    keep = jax.vmap(lambda b, g: batched_bev_nms(b, g, nms_thr))(
        bbox_3d.reshape(n_img, k, bbox_3d.shape[-1]),
        class_inds.reshape(n_img, k))
    return keep.reshape(-1)
