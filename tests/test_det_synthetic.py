"""Geometric sanity of the synthetic Det-scene generator.

The generator feeds tools/validate_det_synthetic.py (the Det suite's
self-contained end-to-end fixture); these checks pin its ground-truth
conventions: bbox_3d = [l, h, w, x, y, z, ry] (camera frame, yaw about
Y — core/bbox_3d/misc.py), projections consistent with cam_k, and NOC
appearance encoding.
"""

import numpy as np
import pytest

from epropnp_tpu.det.synthetic import SyntheticDetSceneGenerator, _yaw_rot


def test_scene_geometry_consistent():
    gen = SyntheticDetSceneGenerator(im_hw=(96, 160), max_gt=4,
                                     lidar_points=8, noise_std=0.0)
    rng = np.random.default_rng(0)
    h, w = gen.im_hw
    n_valid = 0
    for _ in range(4):
        s = gen.sample_scene(rng)
        assert s.img.shape == (h, w, 3)
        assert s.img.min() >= 0.0 and s.img.max() <= 1.0
        for g in np.flatnonzero(s.gt_mask):
            n_valid += 1
            dims, t, yaw = s.gt_bboxes_3d[g, :3], s.gt_bboxes_3d[g, 3:6], \
                s.gt_bboxes_3d[g, 6]
            assert t[2] > 0
            # gt point projections replay through K @ (R x + t)
            cam = s.gt_x3d[g] @ _yaw_rot(float(yaw)).T + t[None]
            uvw = cam @ gen.cam_k.T
            uv = uvw[:, :2] / uvw[:, 2:]
            np.testing.assert_allclose(uv, s.gt_x2d[g], atol=1e-3)
            # object-frame points live inside the box
            assert (np.abs(s.gt_x3d[g]) <= dims[None] / 2 + 1e-4).all()
            # 2D box is inside canvas and non-degenerate
            x1, y1, x2, y2 = s.gt_bboxes[g]
            assert 0 <= x1 < x2 <= w - 1 + 1e-3
            assert 0 <= y1 < y2 <= h - 1 + 1e-3
    assert n_valid >= 4


def test_evaluate_nds_wiring():
    """Perfect predictions on synthetic scenes score NDS ~ 1, and
    degrading them lowers the score (ties the devkit-free nuScenes
    metrics to the synthetic Det fixture; VERDICT-r1 item 9)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tools'))
    import validate_det_synthetic as vds

    gen = SyntheticDetSceneGenerator(im_hw=(96, 160), num_classes=vds.NCLS,
                                     max_gt=vds.GMAX,
                                     lidar_points=vds.PTS)
    rng = np.random.default_rng(3)
    scenes = gen.sample_batch(rng, 6)

    def results_from_gt(jitter_t=0.0, drop_cls=None):
        res = []
        for i in range(scenes.img.shape[0]):
            per_cls = []
            for c in range(vds.NCLS):
                rows = []
                for g in np.flatnonzero(scenes.gt_mask[i]):
                    if scenes.gt_labels[i][g] != c or c == drop_cls:
                        continue
                    b = scenes.gt_bboxes_3d[i][g].astype(np.float64).copy()
                    b[3:6] += jitter_t
                    rows.append(np.concatenate([b, [0.9]]))
                per_cls.append(np.asarray(rows).reshape(-1, 8))
            res.append(per_cls)
        return res

    perfect = vds.evaluate_nds(results_from_gt(), scenes)
    assert perfect['nd_score'] > 0.95
    assert perfect['mean_ap'] > 0.95
    # a 0.6 m translation offset must cost distance-threshold AP + mATE
    off = vds.evaluate_nds(results_from_gt(jitter_t=0.6), scenes)
    assert off['nd_score'] < perfect['nd_score'] - 0.05
    # dropping a class entirely must cost mAP
    dropped = vds.evaluate_nds(results_from_gt(drop_cls=0), scenes)
    assert dropped['mean_ap'] < perfect['mean_ap'] - 0.05


def test_batch_stacking_shapes():
    gen = SyntheticDetSceneGenerator(im_hw=(64, 96), max_gt=3,
                                     lidar_points=4)
    rng = np.random.default_rng(1)
    b = gen.sample_batch(rng, 3)
    assert b.img.shape == (3, 64, 96, 3)
    assert b.gt_bboxes_3d.shape == (3, 3, 7)
    assert b.gt_x3d.shape == (3, 3, 4, 3)
    assert gen.dense_x2d(2).shape == (2, 64, 96, 2)
    # dense map is pixel centers
    assert gen.dense_x2d(1)[0, 0, 0].tolist() == [0.5, 0.5]


@pytest.mark.slow
def test_det_synthetic_convergence_floor():
    """Short run of the Det convergence study (tools/validate_det_synthetic
    .run_study): training the full stack from scratch on synthetic scenes
    must clear an NDS floor on held-out scenes — ties the training recipe
    to the devkit-free nuScenes metrics (VERDICT-r1 item 9). This exact
    invocation (seed 0, bs 2, pool 24) measured NDS 0.461 on the CPU
    backend (round 2) and 0.486+ on hardware; the full untruncated
    2500-step study (det_convergence_study.json, round 4) reaches
    NDS 0.585 by step 250 and 0.779 at 2500. Floor 0.42 = ~10% under
    the weakest observed 300-step point (VERDICT-r3 item 3)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tools'))
    import validate_det_synthetic as vds

    out = vds.run_study(steps=300, bs=2, pool=24, eval_scenes=8,
                        eval_every=100, seed=0, log=lambda *a: None)
    assert out['nds'] >= 0.42, out
    assert out['recall'] > 0.4, out
