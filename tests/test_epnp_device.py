"""Batched on-device EPnP init (sixdof/test.py::epnp_init_device).

Pins the TPU-native replacement of the reference's per-object host
``cv2.solvePnP(SOLVEPNP_EPNP)`` loop (EPro-PnP-6DoF/lib/test.py:176-194):
exact recovery on clean correspondences, confidence masking of corrupted
points, jittability, and end-state parity with the host cv2 path after
the shared Gauss-Newton refinement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epropnp_tpu.ops.pnp import (AdaptiveHuberPnPCost, LMSolver,
                                 PerspectiveCamera)
from epropnp_tpu.ops.pnp.common import quaternion_to_rot_mat
from epropnp_tpu.sixdof.test import epnp_init_device, epnp_init_host

from test_core_parity import make_problem


def _pose_errors(pose_est, pose_gt):
    """(bs,7)[t,q] vs (bs,7) -> (trans err, geodesic rot err radians)."""
    t_err = np.linalg.norm(pose_est[:, :3] - pose_gt[:, :3], axis=-1)
    q_est = pose_est[:, 3:] / np.linalg.norm(
        pose_est[:, 3:], axis=-1, keepdims=True)
    q_gt = pose_gt[:, 3:] / np.linalg.norm(
        pose_gt[:, 3:], axis=-1, keepdims=True)
    dot = np.clip(np.abs(np.sum(q_est * q_gt, -1)), 0, 1)
    return t_err, 2 * np.arccos(dot)


def _problem(noise=0.0, outliers=0.0, bs=6, n=64, seed=3):
    rng = np.random.default_rng(seed)
    p = make_problem(rng, bs=bs, n=n, dof=6, noise=noise,
                     outliers=outliers, bounded=False)
    conf = np.full((bs, n), 1.0, np.float32)
    return p, conf


def test_exact_recovery_noiseless():
    p, conf = _problem()
    pose = jax.jit(epnp_init_device)(
        jnp.asarray(p['x3d'], jnp.float32), jnp.asarray(p['x2d'],
                                                        jnp.float32),
        jnp.asarray(conf), jnp.asarray(p['cam_mats'][0], jnp.float32))
    t_err, r_err = _pose_errors(np.asarray(pose), p['pose'])
    assert np.all(t_err < 0.05), t_err
    assert np.all(r_err < 0.02), r_err


def test_confidence_mask_rejects_corrupted_points():
    p, conf = _problem(n=128)
    x2d = p['x2d'].copy()
    # corrupt the 30% lowest-confidence points grossly
    rng = np.random.default_rng(7)
    conf = rng.uniform(0.5, 1.0, conf.shape).astype(np.float32)
    low = conf < np.quantile(conf, 0.3, axis=1, keepdims=True)
    x2d[low] += 500.0
    pose = epnp_init_device(
        jnp.asarray(p['x3d'], jnp.float32), jnp.asarray(x2d, jnp.float32),
        jnp.asarray(conf), jnp.asarray(p['cam_mats'][0], jnp.float32),
        quantile=0.8)
    t_err, r_err = _pose_errors(np.asarray(pose), p['pose'])
    assert np.all(t_err < 0.05), t_err
    assert np.all(r_err < 0.02), r_err


def test_matches_host_cv2_after_refinement():
    """Device EPnP + GN lands on the same optimum as host cv2 EPnP + GN."""
    p, conf = _problem(noise=0.5, n=64)
    x3d = jnp.asarray(p['x3d'], jnp.float32)
    x2d = jnp.asarray(p['x2d'], jnp.float32)
    w2d = jnp.asarray(p['w2d'], jnp.float32)
    cam_k = jnp.asarray(p['cam_mats'][0], jnp.float32)

    init_dev = epnp_init_device(x3d, x2d, jnp.asarray(conf), cam_k)
    init_host = jnp.asarray(
        epnp_init_host(p['x3d'], p['x2d'], conf,
                       p['cam_mats'][0]), jnp.float32)

    solver = LMSolver(dof=6, num_iter=5)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats'],
                                                    jnp.float32))
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.1).set_param(x2d, w2d)

    def refine(pose_init):
        pose_opt, _, _, _ = solver(x3d, x2d, w2d, camera, cost_fun,
                                   pose_init=pose_init, fast_mode=True)
        return np.asarray(pose_opt)

    opt_dev = refine(init_dev)
    opt_host = refine(init_host)
    # same basin: identical optimum up to quaternion sign
    np.testing.assert_allclose(opt_dev[:, :3], opt_host[:, :3], atol=1e-3)
    dot = np.abs(np.sum(
        opt_dev[:, 3:] * opt_host[:, 3:], -1)
        / np.linalg.norm(opt_dev[:, 3:], axis=-1)
        / np.linalg.norm(opt_host[:, 3:], axis=-1))
    assert np.all(dot > 1 - 1e-5)


def test_infer_poses_epnp_device_path():
    """infer_poses(init='epnp_device') stays on-device and is finite."""
    from epropnp_tpu.sixdof import main as main_lib
    from epropnp_tpu.sixdof import test as test_lib
    from epropnp_tpu.sixdof.dataset import collate
    from test_sixdof_train import tiny_cfg
    from test_sixdof_test_loop import StubTestDataset

    cfg = tiny_cfg()
    model, _, tx, _ = main_lib.build_all(cfg)
    state = main_lib.init_state(cfg, model, tx)
    ds = StubTestDataset()
    extents = {c: ds.min_extents(c) for c in ds.classes}
    samples = [ds[i] for i in range(len(ds))]
    batch = collate(samples, extents)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    outs = model.apply(variables, batch.inp, train=False)
    box_wh = jnp.asarray(np.stack([s.box[2:] for s in samples]),
                         jnp.float32)
    from epropnp_tpu.sixdof import ref_constants as ref
    cam = jnp.asarray(ref.CAMERA_MATRIX, jnp.float32)
    res = test_lib.infer_poses(outs, batch, box_wh, cam, cfg,
                               init='epnp_device')
    assert np.all(np.isfinite(np.asarray(res.pose_est)))
    assert np.all(np.isfinite(np.asarray(res.pose_est_trans)))
