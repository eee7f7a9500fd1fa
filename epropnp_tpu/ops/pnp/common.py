"""Math primitives for the probabilistic PnP layer (pure JAX).

Semantics follow the reference EPro-PnP core (``epropnp/common.py``): skew
matrices, quaternion/yaw rotations, the single residual/cost/Jacobian
evaluation entry point, and the centroid normalization helpers. Unlike the
reference there is a single code path for forward and backward — JAX autodiff
traces through the same expressions — and no in-place output tensors; XLA
dead-code-eliminates whatever the caller does not use.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def skew(x: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrices. x: (*, 3) -> (*, 3, 3).

    Reference: epropnp/common.py:8-19.
    """
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    zeros = jnp.zeros_like(x0)
    rows = jnp.stack(
        [
            jnp.stack([zeros, -x2, x1], axis=-1),
            jnp.stack([x2, zeros, -x0], axis=-1),
            jnp.stack([-x1, x0, zeros], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quaternion_to_rot_mat(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [w, i, j, k] -> rotation matrix. (*, 4) -> (*, 3, 3).

    Reference: epropnp/common.py:22-42 (single differentiable path).
    """
    w, i, j, k = (quaternions[..., n] for n in range(4))
    rot = jnp.stack(
        [
            1 - 2 * (j * j + k * k), 2 * (i * j - k * w), 2 * (i * k + j * w),
            2 * (i * j + k * w), 1 - 2 * (i * i + k * k), 2 * (j * k - i * w),
            2 * (i * k - j * w), 2 * (j * k + i * w), 1 - 2 * (i * i + j * j),
        ],
        axis=-1,
    )
    return rot.reshape(quaternions.shape[:-1] + (3, 3))


def yaw_to_rot_mat(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation around the Y axis. (*) -> (*, 3, 3).

    Reference: epropnp/common.py:45-64.
    """
    sin_yaw = jnp.sin(yaw)
    cos_yaw = jnp.cos(yaw)
    zeros = jnp.zeros_like(yaw)
    ones = jnp.ones_like(yaw)
    rot = jnp.stack(
        [
            cos_yaw, zeros, sin_yaw,
            zeros, ones, zeros,
            -sin_yaw, zeros, cos_yaw,
        ],
        axis=-1,
    )
    return rot.reshape(yaw.shape + (3, 3))


def pose_to_rot_mat(pose: jnp.ndarray) -> jnp.ndarray:
    """Pose (*, 4) = [x,y,z,yaw] or (*, 7) = [x,y,z,w,i,j,k] -> (*, 3, 3)."""
    if pose.shape[-1] == 4:
        return yaw_to_rot_mat(pose[..., 3])
    return quaternion_to_rot_mat(pose[..., 3:])


class PnPEval(NamedTuple):
    """Result of a PnP evaluation at one pose (see :func:`evaluate_pnp`)."""

    residual: Optional[jnp.ndarray]  # (*, n*2)
    cost: Optional[jnp.ndarray]      # (*,)
    jacobian: Optional[jnp.ndarray]  # (*, n*2, dof)


def evaluate_pnp(
    x3d: jnp.ndarray,
    x2d: jnp.ndarray,
    w2d: jnp.ndarray,
    pose: jnp.ndarray,
    camera,
    cost_fun,
    out_jacobian: bool = False,
    out_residual: bool = False,
    out_cost: bool = False,
    clip_jac: bool = True,
) -> PnPEval:
    """Evaluate the weighted reprojection residual/cost/Jacobian at ``pose``.

    Args:
        x3d: (*, n, 3) object-space points.
        x2d: (*, n, 2) target image points.
        w2d: (*, n, 2) anisotropic correspondence weights.
        pose: (*, 4) or (*, 7).
        camera: :class:`PerspectiveCamera` broadcastable to batch (*,).
        cost_fun: Huber cost object broadcastable to batch (*,).

    Reference: epropnp/common.py:67-100.

    The contractions run at full f32 matmul precision: this is THE
    gradient-carrying entry of the probabilistic PnP layer, and at
    convergence (learned weight scales of O(10^2-10^3)) backward
    intermediates of the projection einsums exceed the bfloat16 range that
    TPUs use for default-precision matmul inputs, emitting inf -> NaN into
    the whole gradient. The tensors here are tiny (n x 3 matmuls), so full
    precision costs nothing.
    """
    with jax.default_matmul_precision('float32'):
        x2d_proj, jac_cam = camera.project(
            x3d, pose, out_jac=out_jacobian, clip_jac=clip_jac)
        residual, cost, jacobian = cost_fun.compute(
            x2d_proj, x2d, w2d, jac_cam=jac_cam,
            out_residual=out_residual, out_cost=out_cost,
            out_jacobian=out_jacobian)
    return PnPEval(residual, cost, jacobian)


def pnp_normalize(x3d, pose=None, detach_transformation=True):
    """Subtract the x3d centroid and fold it into the pose translation.

    Returns (offset (*, 3), x3d_norm, pose_norm). Reference:
    epropnp/common.py:103-127.
    """
    offset = jnp.mean(
        jax.lax.stop_gradient(x3d) if detach_transformation else x3d, axis=-2)
    x3d_norm = x3d - offset[..., None, :]
    if pose is not None:
        rot = pose_to_rot_mat(pose)
        t_norm = pose[..., :3] + jnp.einsum('...ij,...j->...i', rot, offset)
        pose_norm = jnp.concatenate([t_norm, pose[..., 3:]], axis=-1)
    else:
        pose_norm = None
    return offset, x3d_norm, pose_norm


def pnp_denormalize(offset, pose_norm):
    """Inverse of :func:`pnp_normalize` on the pose. Reference:
    epropnp/common.py:130-136."""
    rot = pose_to_rot_mat(pose_norm)
    t = pose_norm[..., :3] - jnp.einsum('...ij,...j->...i', rot, offset)
    return jnp.concatenate([t, pose_norm[..., 3:]], axis=-1)
