"""6DoF test-time pose inference: EPnP init + on-device Gauss-Newton refine.

Mirrors the reference eval recipe (EPro-PnP-6DoF/lib/test.py:91-216):
dense correspondence maps -> legacy-softmax weights -> EPnP initialization
on the top-20%-confidence points (host-side ``cv2.solvePnP``, kept for fair
comparison with the reference) -> batched fast-mode Gauss-Newton refinement
on-device -> optional translation-head pose decode.

A fully on-device alternative (``init='rslm'``) replaces the host EPnP with
the random-sample LM init solver so the whole path stays inside one jit —
the TPU-native serving configuration.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pnp import (
    AdaptiveHuberPnPCost,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)
from ..ops.rotation_conversions import axis_angle_to_quaternion
from .config import SixDoFConfig
from .train import Batch, build_correspondences


def build_test_solver(cfg: SixDoFConfig, with_init_solver: bool = False):
    """GN refiner (fast mode). Reference: lib/test.py:91-96."""
    init_solver = None
    if with_init_solver:
        init_solver = RSLMSolver(
            dof=6, num_points=cfg.pnp.rs_num_points,
            num_proposals=64, num_iter=cfg.pnp.rs_num_iter,
            use_pallas=cfg.pnp.use_pallas)
    return LMSolver(dof=6, num_iter=cfg.pnp.test_lm_num_iter,
                    use_pallas=cfg.pnp.use_pallas,
                    init_solver=init_solver)


def epnp_init_host(x3d: np.ndarray, x2d: np.ndarray, conf: np.ndarray,
                   cam_k: np.ndarray, quantile: float = 0.8) -> np.ndarray:
    """EPnP initialization on the top-confidence mask (host-side, cv2).

    Reference: lib/test.py:176-194. Returns (bs, 7) [t, q] poses.
    """
    import cv2
    bs = x3d.shape[0]
    dist_coeffs = np.zeros((4, 1), np.float32)
    thresh = np.quantile(conf.reshape(bs, -1), quantile, axis=1)
    poses = np.zeros((bs, 7), np.float64)
    for i in range(bs):
        mask = conf[i] >= thresh[i]
        ok, rvec, tvec = cv2.solvePnP(
            x3d[i][mask].astype(np.float64),
            x2d[i][mask].astype(np.float64),
            cam_k.astype(np.float64), dist_coeffs,
            flags=cv2.SOLVEPNP_EPNP)
        if not ok:
            rvec = np.zeros(3)
            tvec = np.array([0.0, 0.0, 1.0])
        quat = np.asarray(
            axis_angle_to_quaternion(jnp.asarray(rvec.reshape(3))))
        poses[i, :3] = tvec.reshape(3)
        poses[i, 3:] = quat
    return poses


class TestOutputs(NamedTuple):
    pose_est: jnp.ndarray        # (bs, 3, 4) rot-head pose [R|t]
    pose_est_trans: jnp.ndarray  # (bs, 3, 4) trans-head pose [I|t]


def decode_trans_head(pred_trans, batch: Batch, box_wh, cam_intrinsic,
                      out_res: int):
    """Translation head decode to a camera-frame translation.

    ``pred_trans = [cx_ratio_delta, cy_ratio_delta, depth_ratio]``;
    Reference: lib/test.py:163-173.
    """
    ratio_delta_c = pred_trans[:, :2]
    ratio_depth = pred_trans[:, 2]
    pred_depth = ratio_depth * (out_res / batch.s_box)
    pred_c = ratio_delta_c * box_wh + batch.c_box
    fx, fy = cam_intrinsic[0, 0], cam_intrinsic[1, 1]
    cx, cy = cam_intrinsic[0, 2], cam_intrinsic[1, 2]
    pred_x = (pred_c[:, 0] - cx) * pred_depth / fx
    pred_y = (pred_c[:, 1] - cy) * pred_depth / fy
    return jnp.stack([pred_x, pred_y, pred_depth], axis=-1)


def quat_to_rt(pose_7: jnp.ndarray) -> jnp.ndarray:
    """(bs, 7) [t, q] -> (bs, 3, 4) [R|t]."""
    from ..ops.pnp.common import quaternion_to_rot_mat
    rot = quaternion_to_rot_mat(pose_7[:, 3:])
    return jnp.concatenate([rot, pose_7[:, :3, None]], axis=-1)


def make_refine_fn(cfg: SixDoFConfig, cam_intrinsic):
    """Jitted batched GN refinement from a given pose_init."""
    solver = build_test_solver(cfg)

    @jax.jit
    def refine(x3d, x2d, w2d, pose_init):
        bs = x3d.shape[0]
        camera = PerspectiveCamera(
            cam_mats=jnp.broadcast_to(cam_intrinsic, (bs, 3, 3)), z_min=0.01)
        cost_fun = AdaptiveHuberPnPCost(
            relative_delta=cfg.pnp.relative_delta).set_param(x2d, w2d)
        pose_opt, _, _, _ = solver(
            x3d, x2d, w2d, camera, cost_fun, pose_init=pose_init,
            fast_mode=True)
        return pose_opt

    return refine


def infer_poses(outs, batch: Batch, box_wh, cam_intrinsic,
                cfg: SixDoFConfig, refine_fn=None, init: str = 'epnp',
                rng=None):
    """Full test-time pose inference for one batch.

    Args:
        outs: CDPNOutputs from the model (dense noc/w2d/scale + trans).
        init: 'epnp' (host cv2, reference-faithful) or 'rslm' (on-device).

    Returns TestOutputs with [R|t] estimates from the rot and trans heads.
    """
    out_res = cfg.dataiter.out_res
    x3d, x2d, w2d, _ = build_correspondences(
        outs.noc, outs.w2d, outs.scale, batch, cam_intrinsic, out_res)

    if init == 'epnp':
        conf = np.asarray(jnp.mean(w2d, axis=-1))
        pose_init = jnp.asarray(epnp_init_host(
            np.asarray(x3d), np.asarray(x2d), conf,
            np.asarray(cam_intrinsic)), x3d.dtype)
        if refine_fn is None:
            refine_fn = make_refine_fn(cfg, cam_intrinsic)
        pose_opt = refine_fn(x3d, x2d, w2d, pose_init)
    else:
        solver = build_test_solver(cfg, with_init_solver=True)
        bs = x3d.shape[0]
        camera = PerspectiveCamera(
            cam_mats=jnp.broadcast_to(cam_intrinsic, (bs, 3, 3)), z_min=0.01)
        cost_fun = AdaptiveHuberPnPCost(
            relative_delta=cfg.pnp.relative_delta).set_param(x2d, w2d)
        pose_opt, _, _, _ = solver(
            x3d, x2d, w2d, camera, cost_fun,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            fast_mode=True)

    pose_est = quat_to_rt(pose_opt)
    t_vec = decode_trans_head(outs.trans, batch, box_wh, cam_intrinsic,
                              out_res)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t_vec.dtype),
                           (t_vec.shape[0], 3, 3))
    pose_est_trans = jnp.concatenate([eye, t_vec[..., None]], axis=-1)
    return TestOutputs(pose_est=pose_est, pose_est_trans=pose_est_trans)
