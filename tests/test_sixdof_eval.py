"""6DoF eval metrics + test-time inference path.

The inference test builds *perfect* dense correspondences for a known pose
(back-projecting each crop-grid pixel at a chosen depth), so EPnP init + GN
refinement must recover the pose to high accuracy — the same invariant the
reference validates by running eval on trained checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epropnp_tpu.sixdof import eval_metrics as em
from epropnp_tpu.sixdof import test as test_lib
from epropnp_tpu.sixdof.config import DataIterConfig, PnPConfig, SixDoFConfig
from epropnp_tpu.sixdof.train import Batch
from epropnp_tpu.models.cdpn import CDPNOutputs
from epropnp_tpu.ops.rotation_conversions import (
    quaternion_to_matrix, random_quaternions)

K = np.array([[572.4114, 0., 325.2611],
              [0., 573.57043, 242.04899],
              [0., 0., 1.]])


# ----------------------------------------------------------------- metrics

def make_pose(rng, n):
    q = random_quaternions(jax.random.PRNGKey(rng), n, dtype=jnp.float64)
    rot = np.asarray(quaternion_to_matrix(q))
    t = np.random.default_rng(rng).uniform([-.2, -.2, .6], [.2, .2, 1.2],
                                           (n, 3))
    return np.concatenate([rot, t[..., None]], axis=-1)


def test_identical_poses_score_perfect():
    models = {'ape': np.random.default_rng(0).uniform(-.05, .05, (200, 3))}
    ev = em.PoseEvaluator(['ape'], models, {'ape': 0.1}, cam_k=K)
    poses = make_pose(0, 16)
    ev.extend('ape', poses, poses)
    add = ev.evaluate_pose_add()
    assert add['ape']['0.02'] == 100.0
    pose = ev.evaluate_pose()
    assert pose['ape']['space_acc'][-1] == 1.0
    arp = ev.evaluate_pose_arp_2d()
    assert arp['ape']['2px'] == 100.0


def test_translation_perturbation_thresholds():
    models = {'cat': np.random.default_rng(1).uniform(-.05, .05, (200, 3))}
    ev = em.PoseEvaluator(['cat'], models, {'cat': 0.2}, cam_k=K)
    gt = make_pose(1, 8)
    est = gt.copy()
    est[..., 3] += np.array([0.015, 0.0, 0.0])  # 1.5 cm offset
    ev.extend('cat', est, gt)
    add = ev.evaluate_pose_add()
    # ADD error == 1.5cm: below 0.05*0.2m=1cm? no; below 0.10*0.2m=2cm yes
    assert add['cat']['0.05'] == 0.0
    assert add['cat']['0.10'] == 100.0
    pose = ev.evaluate_pose()
    # trans err 1.5cm: fails 1cm, passes 2cm..10cm -> 9/10
    assert pose['cat']['trans_acc'][0] == 0.0
    assert pose['cat']['trans_acc'][1] == 1.0


def test_symmetric_class_uses_adi():
    # two point clouds identical up to permutation: adi ~ 0, add > 0
    pts = np.random.default_rng(2).uniform(-.05, .05, (100, 3))
    models = {'glue': pts}
    ev = em.PoseEvaluator(['glue'], models, {'glue': 0.1})
    gt = make_pose(3, 4)
    ev.extend('glue', gt, gt)
    assert ev.evaluate_pose_add()['glue']['0.02'] == 100.0


def test_eggbox_z_flip_symmetry():
    models = {'eggbox': np.random.default_rng(4).uniform(-.05, .05, (50, 3))}
    ev = em.PoseEvaluator(['eggbox'], models, {'eggbox': 0.15}, cam_k=K)
    gt = make_pose(5, 4)
    # estimate = gt composed with the 180-deg z flip: should still be correct
    est = np.stack([em.se3_mul(p, em.RT_Z_FLIP) for p in gt])
    ev.extend('eggbox', est, gt)
    pose = ev.evaluate_pose()
    assert pose['eggbox']['rot_acc'][0] == 1.0
    assert pose['eggbox']['trans_acc'][0] == 1.0


# ------------------------------------------------------------- inference

def synthesize_batch(seed, bs, out_res, dim=0.1):
    """Perfect dense correspondences for known poses on a crop grid."""
    r = np.random.default_rng(seed)
    quat = np.asarray(random_quaternions(jax.random.PRNGKey(seed), bs,
                                         dtype=jnp.float64))
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(quat)))
    t = r.uniform([-.05, -.05, .7], [.05, .05, 1.0], (bs, 3))

    c_box = r.uniform(280, 360, (bs, 2))
    s_box = r.uniform(100, 160, (bs,))
    s_int = np.floor(s_box)
    wh_begin = c_box - s_int[:, None] / 2.0
    wh_unit = s_int / out_res
    ar = np.arange(out_res)
    y, x = np.meshgrid(ar, ar, indexing='ij')
    x2d = np.stack([wh_begin[:, 0, None, None] + x * wh_unit[:, None, None],
                    wh_begin[:, 1, None, None] + y * wh_unit[:, None, None]],
                   axis=-1)  # (bs, h, w, 2)
    depth = t[:, 2, None, None] + r.uniform(-0.03, 0.03,
                                            (bs, out_res, out_res))
    # back-project grid pixels at the chosen depth into the camera frame
    xc = (x2d[..., 0] - K[0, 2]) * depth / K[0, 0]
    yc = (x2d[..., 1] - K[1, 2]) * depth / K[1, 1]
    pts_cam = np.stack([xc, yc, depth], axis=-1)
    # object frame: x3d = R^T (Xc - t); noc = x3d / dim
    x3d = np.einsum('bji,bhwj->bhwi', rot, pts_cam - t[:, None, None, :])
    noc = x3d / dim

    outs = CDPNOutputs(
        noc=jnp.asarray(noc, jnp.float32),
        w2d=jnp.zeros((bs, out_res, out_res, 2), jnp.float32),
        scale=jnp.ones((bs, 2), jnp.float32),
        trans=jnp.zeros((bs, 3), jnp.float32))
    batch = Batch(
        inp=None, target_coor=None, loss_msk=None, trans_local=None,
        pose=jnp.asarray(np.concatenate([rot, t[..., None]], -1),
                         jnp.float32),
        c_box=jnp.asarray(c_box, jnp.float32),
        s_box=jnp.asarray(s_box, jnp.float32),
        dim=jnp.full((bs, 3), dim, jnp.float32))
    return outs, batch, np.concatenate([rot, t[..., None]], axis=-1)


@pytest.mark.parametrize('init', ['epnp', 'rslm'])
def test_infer_poses_recovers_gt(init):
    cfg = SixDoFConfig(
        dataiter=DataIterConfig(out_res=16),
        pnp=PnPConfig(test_lm_num_iter=5, rs_num_points=16,
                      rs_num_iter=3))
    outs, batch, pose_gt = synthesize_batch(0, bs=3, out_res=16)
    box_wh = jnp.asarray(np.tile(np.asarray(batch.s_box)[:, None], (1, 2)))
    res = test_lib.infer_poses(outs, batch, box_wh, jnp.asarray(K, jnp.float32),
                               cfg, init=init, rng=jax.random.PRNGKey(0))
    est = np.asarray(res.pose_est)
    r_err = em.rot_err_deg(est[..., :3], pose_gt[..., :3])
    t_err = np.linalg.norm(est[..., 3] - pose_gt[..., 3], axis=-1)
    assert np.all(r_err < 1.0), r_err
    assert np.all(t_err < 0.01), t_err


def test_trans_head_decode_roundtrip():
    """decode_trans_head inverts the dataset's trans_local encoding."""
    cfg = SixDoFConfig(dataiter=DataIterConfig(out_res=16))
    bs = 4
    r = np.random.default_rng(0)
    t_gt = r.uniform([-.1, -.1, .6], [.1, .1, 1.2], (bs, 3))
    # project the GT translation to get the 2D center
    uvw = t_gt @ K.T
    c_obj = uvw[:, :2] / uvw[:, 2:]
    c_box = c_obj + r.uniform(-5, 5, (bs, 2))
    s_box = r.uniform(100, 160, (bs,))
    box_wh = np.tile(s_box[:, None], (1, 2)) * 0.8
    # encoding (reference lm.py trans_local): delta ratio + scaled depth
    ratio_delta_c = (c_obj - c_box) / box_wh
    ratio_depth = t_gt[:, 2] * s_box / cfg.dataiter.out_res
    pred_trans = jnp.asarray(
        np.concatenate([ratio_delta_c, ratio_depth[:, None]], -1),
        jnp.float32)
    batch = Batch(inp=None, target_coor=None, loss_msk=None, trans_local=None,
                  pose=None, c_box=jnp.asarray(c_box, jnp.float32),
                  s_box=jnp.asarray(s_box, jnp.float32), dim=None)
    t_dec = test_lib.decode_trans_head(
        pred_trans, batch, jnp.asarray(box_wh, jnp.float32),
        jnp.asarray(K, jnp.float32), cfg.dataiter.out_res)
    np.testing.assert_allclose(np.asarray(t_dec), t_gt, atol=1e-4)
