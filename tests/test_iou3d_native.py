"""Native C++ rotated IoU/NMS vs the JAX implementation (exact parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from epropnp_tpu.ops import iou3d as native
from epropnp_tpu.core.bbox_3d import (
    box3d_overlap_camera, nms_rotated, rotated_iou_matrix)


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason='no C++ toolchain')


def rand_boxes(seed, n):
    r = np.random.default_rng(seed)
    return np.stack([
        r.uniform(-2, 2, n), r.uniform(-2, 2, n),
        r.uniform(0.5, 3, n), r.uniform(0.5, 3, n),
        r.uniform(-np.pi, np.pi, n)], axis=-1).astype(np.float32)


def test_native_iou_matrix_matches_jax():
    b1, b2 = rand_boxes(0, 32), rand_boxes(1, 24)
    for crit in ('iou', 'iof1', 'inter'):
        got = native.rotated_iou_matrix(b1, b2, criterion=crit)
        want = np.asarray(rotated_iou_matrix(
            jnp.asarray(b1), jnp.asarray(b2), criterion=crit))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_native_nms_matches_jax():
    b = rand_boxes(2, 64)
    scores = np.random.default_rng(3).random(64).astype(np.float32)
    got = native.nms_rotated(b, scores, 0.3)
    want = np.asarray(nms_rotated(jnp.asarray(b), jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(got, want)


def test_native_boxes_iou_3d_matches_jax():
    r = np.random.default_rng(4)
    b1 = np.concatenate([r.uniform(0.5, 3, (16, 3)),
                         r.uniform(-3, 3, (16, 2)),
                         r.uniform(4, 10, (16, 1)),
                         r.uniform(-np.pi, np.pi, (16, 1))],
                        axis=-1).astype(np.float32)
    got = native.boxes_iou_3d(b1, b1)
    want = np.asarray(box3d_overlap_camera(
        jnp.asarray(b1), jnp.asarray(b1), aligned=False))
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)
