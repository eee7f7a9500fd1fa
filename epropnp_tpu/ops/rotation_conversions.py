"""Rotation representation conversions (pure JAX).

Covers the API surface of the reference's PyTorch3D-derived toolkit
(``EPro-PnP-6DoF/lib/ops/rotation_conversions.py``): conversions among
quaternions ([w, x, y, z], scalar-first), rotation matrices, Euler angles,
axis-angle, and the 6D continuous representation, plus quaternion algebra and
random rotation sampling. All functions are batched over leading dims,
jit-safe (no data-dependent control flow), and differentiable.

Conventions match the reference: right-handed coordinate frames, rotation
matrices act on column vectors, quaternions with non-negative real part are
the standardized representatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- quaternion

def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(*, 4) [w,x,y,z] -> (*, 3, 3). Ref: rotation_conversions.py:27."""
    q = quaternions / jnp.linalg.norm(quaternions, axis=-1, keepdims=True)
    w, x, y, z = (q[..., i] for i in range(4))
    two_s = 2.0
    m = jnp.stack([
        1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
        two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
        two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
    ], axis=-1)
    return m.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at negative inputs."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(*, 3, 3) -> (*, 4) [w,x,y,z]. Ref: rotation_conversions.py:105.

    Uses the numerically robust four-candidate construction: compute all four
    quaternion candidates (one per largest diagonal combination) and select
    the best-conditioned one per element.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack([
        _sqrt_positive_part(1.0 + m00 + m11 + m22),
        _sqrt_positive_part(1.0 + m00 - m11 - m22),
        _sqrt_positive_part(1.0 - m00 + m11 - m22),
        _sqrt_positive_part(1.0 - m00 - m11 + m22),
    ], axis=-1)

    # candidate quaternions scaled by 2*q_abs[i]
    quat_by_rijk = jnp.stack([
        jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
        jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
        jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
        jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
    ], axis=-2)  # (*, 4, 4)

    flr = 0.1
    quat_candidates = quat_by_rijk / (
        2.0 * jnp.maximum(q_abs[..., None], flr * jnp.ones_like(q_abs[..., None])))

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return standardize_quaternion(quat)


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Non-negative real part representative. Ref: rotation_conversions.py:166."""
    return jnp.where(quaternions[..., :1] < 0, -quaternions, quaternions)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product without standardization. Ref: :180."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, standardized. Ref: :200."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion. Ref: :216."""
    return quaternion * jnp.array([1.0, -1.0, -1.0, -1.0],
                                  dtype=quaternion.dtype)


def quaternion_apply(quaternion: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points by unit quaternions. Ref: :230."""
    zeros = jnp.zeros_like(point[..., :1])
    point_q = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_q),
        quaternion_invert(quaternion))
    return out[..., 1:]


# -------------------------------------------------------------- euler angles

def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == 'X':
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == 'Y':
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == 'Z':
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f'invalid axis {axis}')
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray,
                           convention: str) -> jnp.ndarray:
    """(*, 3) angles (rad) -> (*, 3, 3). Ref: rotation_conversions.py:251."""
    if len(convention) != 3 or any(c not in 'XYZ' for c in convention):
        raise ValueError(f'invalid convention {convention}')
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)]
    return matrices[0] @ matrices[1] @ matrices[2]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {'X': (2, 1), 'Y': (0, 2), 'Z': (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ('XY', 'YZ', 'ZX')
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """(*, 3, 3) -> (*, 3). Ref: rotation_conversions.py:282."""
    if len(convention) != 3 or any(c not in 'XYZ' for c in convention):
        raise ValueError(f'invalid convention {convention}')
    i0 = 'XYZ'.index(convention[0])
    i2 = 'XYZ'.index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(jnp.clip(
            matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0),
            -1.0, 1.0))
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o0 = _angle_from_tan(
        convention[0], convention[1], matrix[..., i2], False, tait_bryan)
    o2 = _angle_from_tan(
        convention[2], convention[1], matrix[..., i0, :], True, tait_bryan)
    return jnp.stack([o0, central, o2], axis=-1)


# ---------------------------------------------------------------- axis angle

def _safe_norm(x: jnp.ndarray, tiny: float = 1e-30) -> jnp.ndarray:
    """Norm over the last axis with a finite gradient at zero."""
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, tiny))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray,
                             eps: float = 1e-6) -> jnp.ndarray:
    """(*, 3) rotation vector -> (*, 4). Ref: rotation_conversions.py:387."""
    angles = _safe_norm(axis_angle)
    half = angles * 0.5
    # Taylor expansion of sin(x/2)/x near 0 keeps gradients finite.
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small, 0.5 - angles * angles / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angles))
    return jnp.concatenate(
        [jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: jnp.ndarray,
                             eps: float = 1e-6) -> jnp.ndarray:
    """(*, 4) -> (*, 3). Ref: rotation_conversions.py:412."""
    norms = _safe_norm(quaternions[..., 1:])
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small, 0.5 - angles * angles / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles))
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(*, 3) -> (*, 3, 3). Ref: rotation_conversions.py:363."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """(*, 3, 3) -> (*, 3). Ref: rotation_conversions.py:375."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ------------------------------------------------------------------ rot6d

def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(*, 6) continuous repr -> (*, 3, 3) via Gram-Schmidt.

    Ref: rotation_conversions.py:551 (Zhou et al. CVPR'19).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(*, 3, 3) -> (*, 6): the first two rows. Ref: rotation_conversions.py:576."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


# ------------------------------------------------------------------ sampling

def random_quaternions(key: jax.Array, n: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Uniform unit quaternions with non-negative real part. Ref: :311."""
    q = jax.random.normal(key, (n, 4), dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quaternion(q)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform random rotation matrices. Ref: rotation_conversions.py:332."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def random_rotation(key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """A single uniform random rotation matrix. Ref: :349."""
    return random_rotations(key, 1, dtype)[0]
