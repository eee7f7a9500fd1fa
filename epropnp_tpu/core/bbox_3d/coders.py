"""Target coders for the detection suite (pure JAX).

* ``DistDimProjErrorCoder`` — scales reprojection errors into a
  scale-invariant space: ``err * distance / (mean_dim * focal * std)``.
  Reference: core/bbox_3d/proj_error_coder/dist_dim_proj_error_coder.py:12-52.
* ``MultiClassLogDimCoder`` — per-class log-space dimension normalization
  with nuScenes statistics.
  Reference: core/bbox_3d/dim_coder/multiclass_log_dim_coder.py:12-55.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# nuScenes 10-class dimension statistics (l, h, w), reference defaults
NUSCENES_DIM_MEANS = (
    (4.62, 1.73, 1.96), (6.94, 2.84, 2.52), (12.56, 3.89, 2.94),
    (11.22, 3.50, 2.95), (6.68, 3.21, 2.85), (1.70, 1.29, 0.61),
    (2.11, 1.46, 0.78), (0.73, 1.77, 0.67), (0.41, 1.08, 0.41),
    (0.50, 0.99, 2.52))
NUSCENES_DIM_STDS = (
    (0.46, 0.24, 0.16), (2.11, 0.84, 0.45), (4.50, 0.77, 0.54),
    (2.06, 0.49, 0.33), (3.23, 0.93, 1.07), (0.26, 0.35, 0.16),
    (0.33, 0.29, 0.17), (0.19, 0.19, 0.14), (0.14, 0.27, 0.13),
    (0.17, 0.15, 0.62))


@dataclasses.dataclass(frozen=True)
class DistDimProjErrorCoder:
    target_std: float = 0.2
    distance_min: float = 0.1

    def _scale(self, distance, dimensions, focal):
        length = jnp.mean(dimensions, axis=-1, keepdims=True)
        denom = length * focal * self.target_std
        distance = jnp.maximum(distance, self.distance_min)
        return distance, denom

    def encode(self, x2d_diff, distance, dimensions, focal):
        distance, denom = self._scale(distance, dimensions, focal)
        return x2d_diff * (distance / denom)[..., None, :]

    def decode(self, proj_error, distance, dimensions, focal):
        distance, denom = self._scale(distance, dimensions, focal)
        return proj_error * (denom / distance)[..., None, :]


@dataclasses.dataclass(frozen=True)
class MultiClassLogDimCoder:
    target_means: Tuple[Tuple[float, float, float], ...] = NUSCENES_DIM_MEANS
    target_stds: Tuple[Tuple[float, float, float], ...] = NUSCENES_DIM_STDS

    @property
    def _log_means(self):
        return jnp.asarray(np.log(np.asarray(self.target_means, np.float32)))

    @property
    def _log_stds(self):
        m = np.asarray(self.target_means, np.float32)
        s = np.asarray(self.target_stds, np.float32)
        return jnp.asarray(s / m)

    def encode(self, dimensions, labels):
        return (jnp.log(dimensions) - self._log_means[labels]) \
            / self._log_stds[labels]

    def decode(self, dim_enc, labels):
        return jnp.exp(dim_enc * self._log_stds[labels]
                       + self._log_means[labels])
