"""Batched pinhole camera with analytic pose-tangent Jacobian (pure JAX).

Semantics follow the reference ``epropnp/camera.py``: projection with z
clamping, image-bound clamping, analytic Jacobian of the projected points
w.r.t. the local pose tangent (4DoF yaw column / 6DoF rotation columns), and
zeroing of the Jacobian where clamps were active.

TPU-first deviations: the camera is an immutable pytree dataclass (functional
``replace`` instead of ``set_param``/``reshape_``/``expand_``/``repeat_``
in-place mutation); broadcasting replaces the explicit batch-expansion family.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
from flax import struct

from .common import pose_to_rot_mat, skew


@struct.dataclass
class PerspectiveCamera:
    """Batched pinhole camera.

    Attributes:
        cam_mats: (*, 3, 3) intrinsic matrices.
        z_min: scalar depth clamp (static).
        lb: None | scalar | (*, 2) lower projection bound in [x, y].
        ub: None | scalar | (*, 2) upper projection bound in [x, y].

    Reference: epropnp/camera.py:33-109.
    """

    cam_mats: jnp.ndarray
    lb: Optional[Union[float, jnp.ndarray]] = None
    ub: Optional[Union[float, jnp.ndarray]] = None
    z_min: float = struct.field(pytree_node=False, default=0.1)
    allowed_border: float = struct.field(pytree_node=False, default=200.0)

    @classmethod
    def from_img_shape(cls, cam_mats, img_shape, z_min=0.1, allowed_border=200.0):
        """Build bounds from an image shape (*, 2) in [h, w].

        Reference: epropnp/camera.py:55-62 (``set_param`` with img_shape).
        """
        img_shape = jnp.asarray(img_shape)
        lb = -0.5 - allowed_border
        ub = img_shape[..., ::-1] + (-0.5 + allowed_border)
        return cls(cam_mats=cam_mats, lb=lb, ub=ub, z_min=z_min,
                   allowed_border=allowed_border)

    def project(self, x3d, pose, out_jac: bool = False, clip_jac: bool = True):
        """Project points and (optionally) the analytic pose Jacobian.

        Args:
            x3d: (*, n, 3)
            pose: (*, 4) or (*, 7)

        Returns:
            (x2d_proj (*, n, 2), jac (*, n, 2, dof) | None)

        Reference: epropnp/camera.py:64-109 (project_a/project_b paths fuse
        identically under XLA, so a single path is used).
        """
        rot = pose_to_rot_mat(pose)
        x3d_rot = jnp.einsum('...ni,...ji->...nj', x3d, rot)
        x2dh = jnp.einsum(
            '...ni,...ji->...nj', x3d_rot + pose[..., None, :3], self.cam_mats)
        zcam = jnp.maximum(x2dh[..., 2:3], self.z_min)
        x2d_proj = x2dh[..., :2] / zcam

        lb, ub = self.lb, self.ub
        has_bounds = lb is not None and ub is not None
        if has_bounds:
            lb_b = lb[..., None, :] if isinstance(lb, jnp.ndarray) and lb.ndim > 0 else lb
            ub_b = ub[..., None, :] if isinstance(ub, jnp.ndarray) and ub.ndim > 0 else ub
            x2d_proj = jnp.clip(x2d_proj, lb_b, ub_b)

        if not out_jac:
            return x2d_proj, None

        dof = 4 if pose.shape[-1] == 4 else 6
        # d x2d / d x3d_cam: (*, n, 2, 3)
        zc = zcam[..., None]  # (*, n, 1, 1)
        d_xy = self.cam_mats[..., None, :2, :2] / zc
        d_z = (self.cam_mats[..., None, :2, 2:3] - x2d_proj[..., None]) / zc
        d_x2d_d_x3dcam = jnp.concatenate([d_xy, d_z], axis=-1)
        if dof == 4:
            # d [x3dcam_x, x3dcam_z] / d yaw = [z_rot, -x_rot]
            d_xzcam_d_yaw = jnp.stack(
                [x3d_rot[..., 2], -x3d_rot[..., 0]], axis=-1)[..., None]
            rot_cols = d_x2d_d_x3dcam[..., ::2] @ d_xzcam_d_yaw
        else:
            rot_cols = d_x2d_d_x3dcam @ skew(x3d_rot * 2)
        jac = jnp.concatenate([d_x2d_d_x3dcam, rot_cols], axis=-1)

        if clip_jac:
            clip_mask = zcam == self.z_min
            if has_bounds:
                clip_mask = clip_mask | (x2d_proj == lb_b) | (x2d_proj == ub_b)
            jac = jnp.where(clip_mask[..., None], 0.0, jac)
        return x2d_proj, jac

    @staticmethod
    def get_quaternion_transfrom_mat(quaternions):
        """Map a 3D rotation tangent delta into quaternion 4-space.

        (*, 4) -> (*, 4, 3). Reference: epropnp/camera.py:145-165 (name kept
        for API parity, typo included).
        """
        w, i, j, k = (quaternions[..., n] for n in range(4))
        mat = jnp.stack(
            [i, j, k,
             -w, -k, j,
             k, -w, -i,
             -j, i, -w],
            axis=-1)
        return mat.reshape(quaternions.shape[:-1] + (4, 3))

    get_quaternion_transform_mat = get_quaternion_transfrom_mat

    # -- batch-shape helpers (functional equivalents of reshape_/repeat_) --

    def _map_batched(self, fn):
        return self.replace(
            cam_mats=fn(self.cam_mats, 2),
            lb=fn(self.lb, 1) if isinstance(self.lb, jnp.ndarray) and self.lb.ndim > 0 else self.lb,
            ub=fn(self.ub, 1) if isinstance(self.ub, jnp.ndarray) and self.ub.ndim > 0 else self.ub,
        )

    def reshape(self, *batch_shape):
        return self._map_batched(
            lambda x, ev: x.reshape(batch_shape + x.shape[x.ndim - ev:]))

    def tile(self, reps: int):
        """Tile the leading batch dim ``reps`` times (torch ``repeat(reps, ...)``)."""
        return self._map_batched(
            lambda x, ev: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)))

    def broadcast_to_batch(self, batch_shape):
        return self._map_batched(
            lambda x, ev: jnp.broadcast_to(x, tuple(batch_shape) + x.shape[x.ndim - ev:]))
