"""Projected-3D-center targets via analytic ray-box thickness (pure JAX).

The reference renders each GT box with PyTorch3D's mesh rasterizer
(16 faces/pixel, near/far zbuf gathers) to obtain the per-pixel z-thickness
of the box volume, then takes the thickness-weighted pixel centroid as the
"projected 3D center" training target
(core/bbox_3d/center_target.py:18-259). A box pierced by a camera ray has a
closed-form entry/exit (slab test), so the TPU rebuild computes the exact
same z-thickness analytically per (object, output pixel) — no mesh, no
rasterizer, one fused vectorized map. Optional exponential volumetric
occlusion discounts thickness by the total thickness of objects in front
(reference :195-214).

Rays are cast through the dense ``img_dense_x2d`` map (original-image pixel
coordinates of each output cell, flip/crop aware), while centroids are
accumulated in the augmented-image grid — matching the reference's
resampling semantics.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from ...ops.pnp.common import yaw_to_rot_mat
from ...ops.pnp.linalg import inv_3x3


class CenterTargets(NamedTuple):
    centers_2d: jnp.ndarray  # (num_obj, 2)
    bboxes_2d: jnp.ndarray   # (num_obj, 4) rendered boxes (or input boxes)
    valid_mask: jnp.ndarray  # (num_obj,)


def ray_box_thickness(ray_dirs, bboxes_3d, z_min: float = 1e-2):
    """Z-thickness of boxes along camera rays.

    Args:
        ray_dirs: (num_obj, h, w, 3) ray directions with unit z component
            (so parameter = camera z depth).
        bboxes_3d: (num_obj, 7) [l, h, w, x, y, z, ry].

    Returns (thickness, z_near) each (num_obj, h, w).
    """
    rot = yaw_to_rot_mat(bboxes_3d[:, 6])                  # (n, 3, 3)
    t = bboxes_3d[:, 3:6]
    half = bboxes_3d[:, :3] * 0.5
    # into box frame: o_b = -R^T t; d_b = R^T d
    o_b = -jnp.einsum('nji,nj->ni', rot, t)                # (n, 3)
    d_b = jnp.einsum('nji,nhwj->nhwi', rot, ray_dirs)      # (n, h, w, 3)
    safe_d = jnp.where(jnp.abs(d_b) < 1e-9,
                       jnp.where(d_b < 0, -1e-9, 1e-9), d_b)
    t1 = (-half[:, None, None] - o_b[:, None, None]) / safe_d
    t2 = (half[:, None, None] - o_b[:, None, None]) / safe_d
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    t_near = jnp.maximum(t_near, z_min)  # z-clip like the rasterizer
    thickness = jnp.maximum(t_far - t_near, 0.0)
    return thickness, t_near


@dataclasses.dataclass(frozen=True)
class VolumeCenter:
    output_stride: int = 4
    occlusion_factor: float = 0.0
    get_bbox_2d: bool = False
    min_box_size: float = 4.0
    mask_threshold: float = 0.5

    def get_centers_2d(self, bboxes_2d, bboxes_3d, obj_img_inds,
                       img_dense_x2d_small, img_dense_x2d_mask_small,
                       cam_intrinsic, obj_mask=None) -> CenterTargets:
        """
        Args:
            bboxes_2d: (num_obj, 4); bboxes_3d: (num_obj, 7).
            obj_img_inds: (num_obj,) int.
            img_dense_x2d_small: (num_img, h_out, w_out, 2) NHWC original-
                image coordinates; mask: (num_img, h_out, w_out, 1).
            cam_intrinsic: (num_img, 3, 3).
            obj_mask: optional (num_obj,) validity of padded object slots.
        """
        num_obj = bboxes_3d.shape[0]
        h_out, w_out = img_dense_x2d_small.shape[1:3]
        dtype = bboxes_3d.dtype

        x2d = img_dense_x2d_small[obj_img_inds]          # (n, h, w, 2)
        k_inv = inv_3x3(cam_intrinsic)[obj_img_inds]     # (n, 3, 3)
        homo = jnp.concatenate(
            [x2d, jnp.ones_like(x2d[..., :1])], axis=-1)
        rays = jnp.einsum('nij,nhwj->nhwi', k_inv, homo)
        rays = rays / rays[..., 2:]                      # unit z

        thickness, z_near = ray_box_thickness(rays, bboxes_3d)
        pix_mask = img_dense_x2d_mask_small[obj_img_inds, ..., 0]
        thickness = thickness * pix_mask

        if self.occlusion_factor > 0:
            # occlusion = total thickness of same-image boxes closer in z
            same_img = obj_img_inds[:, None] == obj_img_inds[None, :]
            closer = z_near[None] < z_near[:, None]       # j in front of i
            not_self = ~jnp.eye(num_obj, dtype=bool)[..., None, None]
            occ = jnp.sum(jnp.where(
                same_img[..., None, None] & closer & not_self,
                thickness[None], 0.0), axis=1)
            thickness = thickness * jnp.exp(-self.occlusion_factor * occ)

        # centroid over the augmented-image point grid (stride centers)
        ys = jnp.arange(h_out, dtype=dtype) * self.output_stride \
            + self.output_stride / 2
        xs = jnp.arange(w_out, dtype=dtype) * self.output_stride \
            + self.output_stride / 2
        yy, xx = jnp.meshgrid(ys, xs, indexing='ij')
        points = jnp.stack([xx, yy], axis=-1)            # (h, w, 2)

        w_sum = jnp.sum(thickness, axis=(1, 2))          # (n,)
        centers = jnp.sum(thickness[..., None] * points, axis=(1, 2)) \
            / jnp.maximum(w_sum, 1e-12)[..., None]
        valid = w_sum >= 1e-6

        if self.get_bbox_2d:
            hit = thickness > 0
            big = jnp.asarray(
                [w_out * self.output_stride, h_out * self.output_stride],
                dtype)
            x1 = jnp.min(jnp.where(jnp.any(hit, 1), xs - self.output_stride
                                   / 2, big[0]), axis=-1)
            x2 = jnp.max(jnp.where(jnp.any(hit, 1), xs + self.output_stride
                                   / 2, 0.0), axis=-1)
            y1 = jnp.min(jnp.where(jnp.any(hit, 2), ys - self.output_stride
                                   / 2, big[1]), axis=-1)
            y2 = jnp.max(jnp.where(jnp.any(hit, 2), ys + self.output_stride
                                   / 2, 0.0), axis=-1)
            bboxes_2d = jnp.stack([x1, y1, x2, y2], axis=-1)
        valid = valid & jnp.all(
            bboxes_2d[:, 2:] - bboxes_2d[:, :2] >= self.min_box_size,
            axis=-1)
        if obj_mask is not None:
            valid = valid & obj_mask
        return CenterTargets(centers, bboxes_2d, valid)
