"""Rotated IoU / NMS / box geometry tests (analytic + Monte Carlo oracles)."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.core.bbox_3d import (
    batched_bev_nms,
    bboxes_3d_to_2d,
    box3d_overlap_camera,
    compute_box_3d,
    gen_unit_noc,
    nms_axis_aligned,
    nms_rotated,
    project_to_image,
    rotated_iou_matrix,
    rotated_iou_pairwise,
    xywhr2xyxyr,
)


def _corners_np(b):
    c, s = np.cos(b[4]), np.sin(b[4])
    dx = np.array([1, 1, -1, -1]) * b[2] / 2
    dy = np.array([1, -1, -1, 1]) * b[3] / 2
    return np.stack([b[0] + dx * c - dy * s, b[1] + dx * s + dy * c], -1)


def _sh_clip(poly, a, b):
    out = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        dp = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        dq = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if dp >= 0:
            out.append(p)
        if (dp < 0) != (dq < 0):
            out.append(p + dp / (dp - dq) * (q - p))
    return out


def exact_iou(b1, b2):
    """Exact Sutherland-Hodgman clipping oracle (host-side)."""
    def ccw(c):
        area = 0.5 * np.sum(c[:, 0] * np.roll(c[:, 1], -1)
                            - c[:, 1] * np.roll(c[:, 0], -1))
        return c if area > 0 else c[::-1]

    poly = list(ccw(_corners_np(b1)))
    clipper = ccw(_corners_np(b2))
    for i in range(4):
        if not poly:
            break
        poly = _sh_clip(poly, clipper[i], clipper[(i + 1) % 4])
    inter = 0.0
    if len(poly) >= 3:
        p = np.array(poly)
        inter = 0.5 * abs(np.sum(p[:, 0] * np.roll(p[:, 1], -1)
                                 - p[:, 1] * np.roll(p[:, 0], -1)))
    union = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return inter / union


def test_axis_aligned_iou_exact():
    b1 = jnp.asarray([[0., 0., 2., 2., 0.]])
    b2 = jnp.asarray([[1., 0., 2., 2., 0.]])  # overlap 1x2=2, union 8-2=6
    iou = rotated_iou_pairwise(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), [2.0 / 6.0], atol=1e-6)
    # identical -> 1, disjoint -> 0
    np.testing.assert_allclose(
        np.asarray(rotated_iou_pairwise(b1, b1)), [1.0], atol=1e-6)
    b3 = jnp.asarray([[10., 10., 2., 2., 0.3]])
    np.testing.assert_allclose(
        np.asarray(rotated_iou_pairwise(b1, b3)), [0.0], atol=1e-6)


def test_rotated_iou_against_exact_oracle():
    r = np.random.default_rng(0)
    b1s, b2s, wants = [], [], []
    for _ in range(100):
        b1 = np.array([r.uniform(-1, 1), r.uniform(-1, 1),
                       r.uniform(0.5, 3), r.uniform(0.5, 3),
                       r.uniform(-np.pi, np.pi)])
        b2 = np.array([r.uniform(-1, 1), r.uniform(-1, 1),
                       r.uniform(0.5, 3), r.uniform(0.5, 3),
                       r.uniform(-np.pi, np.pi)])
        b1s.append(b1)
        b2s.append(b2)
        wants.append(exact_iou(b1, b2))
    got = np.asarray(rotated_iou_pairwise(jnp.asarray(np.stack(b1s)),
                                          jnp.asarray(np.stack(b2s))))
    np.testing.assert_allclose(got, wants, atol=1e-7)


def test_rotated_iou_rotation_invariance():
    b1 = np.array([0.5, -0.2, 2.0, 1.0, 0.3])
    b2 = np.array([0.0, 0.4, 1.5, 2.5, -0.7])
    base = float(rotated_iou_pairwise(jnp.asarray(b1[None]),
                                      jnp.asarray(b2[None]))[0])
    for dth in (0.5, 1.3, np.pi / 2):
        c, s = np.cos(dth), np.sin(dth)
        rot = np.array([[c, -s], [s, c]])

        def rot_box(b):
            xy = rot @ b[:2]
            return np.array([xy[0], xy[1], b[2], b[3], b[4] + dth])

        got = float(rotated_iou_pairwise(
            jnp.asarray(rot_box(b1)[None]), jnp.asarray(rot_box(b2)[None]))[0])
        np.testing.assert_allclose(got, base, atol=1e-5)


def test_iou_matrix_and_criteria():
    b = jnp.asarray([[0., 0., 2., 2., 0.], [1., 0., 2., 2., 0.]])
    m = np.asarray(rotated_iou_matrix(b, b))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)
    assert m[0, 1] == m[1, 0]
    inter = np.asarray(rotated_iou_matrix(b, b, criterion='inter'))
    np.testing.assert_allclose(inter[0, 1], 2.0, atol=1e-5)
    iof = np.asarray(rotated_iou_matrix(b, b, criterion='iof1'))
    np.testing.assert_allclose(iof[0, 1], 0.5, atol=1e-5)


def test_nms_rotated_suppresses_overlaps():
    boxes = jnp.asarray([
        [0., 0., 2., 2., 0.],
        [0.1, 0., 2., 2., 0.05],   # overlaps box 0
        [10., 10., 2., 2., 1.0],   # isolated
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])
    # lower-scored first element loses
    keep = np.asarray(nms_rotated(boxes, jnp.asarray([0.5, 0.8, 0.7]), 0.5))
    np.testing.assert_array_equal(keep, [False, True, True])


def test_greedy_suppress_matches_sequential_greedy():
    """Fixpoint NMS == the sequential greedy scan on random IoU matrices."""
    from epropnp_tpu.core.bbox_3d.nms import _greedy_suppress

    r = np.random.default_rng(0)
    for _ in range(8):
        n = int(r.integers(1, 96))
        iou = r.random((n, n)).astype(np.float32)
        iou = (iou + iou.T) / 2
        np.fill_diagonal(iou, 1.0)
        valid = r.random(n) > 0.2
        thresh = float(r.uniform(0.2, 0.8))
        keep = valid.copy()
        for i in range(n):
            if keep[i]:
                keep[i + 1:] &= ~(iou[i, i + 1:] > thresh)
        keep &= valid
        got = np.asarray(
            _greedy_suppress(jnp.asarray(iou), jnp.asarray(valid), thresh))
        np.testing.assert_array_equal(got, keep)


def test_nms_axis_aligned_matches_torch():
    import pytest
    torch = pytest.importorskip('torchvision.ops', reason='torchvision')
    r = np.random.default_rng(0)
    xy = r.uniform(0, 50, (64, 2))
    wh = r.uniform(5, 20, (64, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = r.random(64).astype(np.float32)
    keep = np.asarray(
        nms_axis_aligned(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    import torch as th
    ref_keep = torch.nms(th.tensor(boxes), th.tensor(scores), 0.5).numpy()
    got = np.nonzero(keep)[0]
    np.testing.assert_array_equal(np.sort(got), np.sort(ref_keep))


def test_bboxes_3d_to_2d_contains_projected_corners():
    # box in front of the camera; unclipped corners project inside bbox
    K = jnp.asarray([[500., 0., 320.], [0., 500., 240.], [0., 0., 1.]])
    bbox_3d = jnp.asarray([[1.5, 1.4, 0.6, 0.3, 0.8, 6.0, 0.4]])
    imsize = jnp.asarray([[480., 640.]])
    bbox, valid = bboxes_3d_to_2d(bbox_3d, K[None], imsize)
    assert bool(valid[0])
    corners, _ = compute_box_3d(bbox_3d)
    pts = np.asarray(corners[0] @ np.asarray(K).T)
    uv = pts[:, :2] / pts[:, 2:] + 0.5
    b = np.asarray(bbox[0])
    assert np.all(uv[:, 0] >= b[0] - 1e-3) and np.all(uv[:, 0] <= b[2] + 1e-3)
    assert np.all(uv[:, 1] >= b[1] - 1e-3) and np.all(uv[:, 1] <= b[3] + 1e-3)


def test_project_to_image_matches_manual():
    K = jnp.asarray([[500., 0., 320.], [0., 500., 240.], [0., 0., 1.]])
    pose = jnp.asarray([[0.2, -0.1, 5.0, 0.3]])
    x3d = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 10, 3)),
                      jnp.float32)
    x2d = project_to_image(x3d, pose, K[None], jnp.asarray([[480., 640.]]))
    from epropnp_tpu.ops.pnp.common import yaw_to_rot_mat
    rot = np.asarray(yaw_to_rot_mat(pose[0, 3]))
    pc = np.asarray(x3d[0]) @ rot.T + np.asarray(pose[0, :3])
    uvw = pc @ np.asarray(K).T
    uv = uvw[:, :2] / uvw[:, 2:]
    np.testing.assert_allclose(np.asarray(x2d[0]), uv, atol=1e-4)


def test_box3d_overlap_identical_is_one():
    b = jnp.asarray([[1.5, 1.4, 0.6, 0.3, 0.8, 6.0, 0.4],
                     [2.0, 1.0, 0.8, -1.0, 0.5, 8.0, -0.2]])
    iou = np.asarray(box3d_overlap_camera(b, b, aligned=True))
    np.testing.assert_allclose(iou, 1.0, atol=1e-5)
    m = np.asarray(box3d_overlap_camera(b, b, aligned=False))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)


def test_batched_bev_nms_separates_groups():
    # identical boxes in different groups (classes) must both survive
    box = [1.5, 1.4, 0.6, 0.3, 0.8, 6.0, 0.4, 0.9]
    bbox_3d = jnp.asarray([box, box])
    keep = np.asarray(batched_bev_nms(bbox_3d, jnp.asarray([0, 1])))
    np.testing.assert_array_equal(keep, [True, True])
    keep = np.asarray(batched_bev_nms(bbox_3d, jnp.asarray([0, 0])))
    assert keep.sum() == 1


def test_gen_unit_noc_on_sphere():
    pts = np.asarray(gen_unit_noc(128))
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)
    assert np.abs(pts.mean(0)).max() < 0.05  # roughly uniform


def test_xywhr2xyxyr():
    b = jnp.asarray([[1., 2., 4., 6., 0.3]])
    out = np.asarray(xywhr2xyxyr(b))
    np.testing.assert_allclose(out, [[-1., -1., 3., 5., 0.3]], atol=1e-6)


def test_per_image_nms_matches_flat_offset_trick():
    """nms_axis_aligned_per_image / batched_bev_nms_per_image must equal
    the flat offset-trick form (group = img * C + label) on image-
    contiguous inputs — the vmap is a pure O((BK)^2) -> O(BK^2)
    restructuring, not a semantics change."""
    from epropnp_tpu.core.bbox_3d import (batched_bev_nms_per_image,
                                          nms_axis_aligned_per_image)
    rng = np.random.default_rng(7)
    n_img, k, n_cls = 3, 24, 2
    n = n_img * k
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(4, 30, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=-1)
    scores = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    labels = rng.integers(0, n_cls, (n,))
    img_inds = np.repeat(np.arange(n_img), k)
    valid = rng.uniform(size=n) > 0.15
    group = img_inds * n_cls + labels

    span = boxes.max() + 1.0
    flat = np.asarray(nms_axis_aligned(
        jnp.asarray(boxes + (group * span)[:, None]), jnp.asarray(scores),
        0.5, valid_mask=jnp.asarray(valid)))
    per_img = np.asarray(nms_axis_aligned_per_image(
        jnp.asarray(boxes + (labels * span)[:, None]), jnp.asarray(scores),
        0.5, n_img, valid_mask=jnp.asarray(valid)))
    assert (flat == per_img).all()

    # BEV: [l, h, w, x, y, z, ry, score]
    lhw = rng.uniform(1, 4, (n, 3))
    xyz = np.concatenate([rng.uniform(-20, 20, (n, 1)),
                          rng.uniform(-2, 2, (n, 1)),
                          rng.uniform(5, 45, (n, 1))], axis=-1)
    ry = rng.uniform(-np.pi, np.pi, (n, 1))
    bev_in = np.concatenate([lhw, xyz, ry, scores[:, None]],
                            axis=-1).astype(np.float64)
    masked = np.where(valid[:, None], bev_in,
                      np.asarray([1, 1, 1, 1e6, 0, 1e6, 0, -1.0]))
    flat_bev = np.asarray(batched_bev_nms(
        jnp.asarray(masked), jnp.asarray(group), nms_thr=0.25))
    per_img_bev = np.asarray(batched_bev_nms_per_image(
        jnp.asarray(masked), jnp.asarray(labels), n_img, nms_thr=0.25))
    assert ((flat_bev & valid) == (per_img_bev & valid)).all()
