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


def epnp_init_device(x3d: jnp.ndarray, x2d: jnp.ndarray, conf: jnp.ndarray,
                     cam_k: jnp.ndarray, quantile: float = 0.8
                     ) -> jnp.ndarray:
    """Batched on-device EPnP initialization (nullspace formulation).

    TPU-native replacement for the per-object host ``cv2.solvePnP`` loop
    (reference EPro-PnP-6DoF/lib/test.py:176-194): the whole batch is one
    fused eigh + Procrustes, fully jittable.

    Algorithm (Lepetit et al. EPnP, N=1 nullspace case — sufficient as a
    Gauss-Newton init for non-planar objects):
      1. control points = weighted centroid + principal axes of x3d;
      2. barycentric coordinates via a batched 4x4 solve;
      3. the 2n x 12 projection system M, accumulated as the 12x12
         Gram matrix MtM with per-point confidence weights (the
         top-``quantile`` mask, matching the reference's EPnP mask);
      4. smallest eigenvector of MtM -> camera-frame control points up
         to scale/sign, fixed by pairwise-distance ratio and mean-z>0;
      5. weighted Kabsch/Procrustes -> (R, t).

    Args:
        x3d: (bs, n, 3) object-frame points.
        x2d: (bs, n, 2) pixel coordinates.
        conf: (bs, n) confidence; the top-(1-quantile) fraction is used.
        cam_k: (3, 3) intrinsics.

    Returns (bs, 7) [t, q] poses.
    """
    from ..ops.rotation_conversions import matrix_to_quaternion

    f64 = jnp.promote_types(x3d.dtype, jnp.float32)
    x3d = x3d.astype(f64)
    x2d = x2d.astype(f64)
    bs, n, _ = x3d.shape
    eps = 1e-9

    thresh = jnp.quantile(conf, quantile, axis=1, keepdims=True)
    w = (conf >= thresh).astype(f64)                       # (bs, n) mask
    w_sum = w.sum(-1, keepdims=True) + eps

    # 1. control points: centroid + scaled principal axes
    cent = (w[..., None] * x3d).sum(1) / w_sum             # (bs, 3)
    xc = x3d - cent[:, None]
    cov = jnp.einsum('bn,bni,bnj->bij', w, xc, xc) / w_sum[..., None]
    eval_, evec = jnp.linalg.eigh(cov + eps * jnp.eye(3, dtype=f64))
    axes = evec * jnp.sqrt(jnp.clip(eval_, eps))[:, None, :]  # (bs, 3, 3)
    ctl_w = jnp.concatenate(
        [cent[:, None], cent[:, None] + axes.swapaxes(1, 2)], 1)  # (bs,4,3)

    # 2. barycentric coords: [x;1] = A @ alpha with A = [[ctl^T],[1]]
    a_mat = jnp.concatenate(
        [ctl_w.swapaxes(1, 2),
         jnp.ones((bs, 1, 4), f64)], 1)                    # (bs, 4, 4)
    rhs = jnp.concatenate(
        [x3d, jnp.ones((bs, n, 1), f64)], -1)              # (bs, n, 4)
    alpha = jnp.linalg.solve(a_mat[:, None], rhs[..., None])[..., 0]

    # 3. normalized-coordinate projection system, Gram-accumulated
    fx, fy = cam_k[0, 0], cam_k[1, 1]
    cx, cy = cam_k[0, 2], cam_k[1, 2]
    u = (x2d[..., 0] - cx) / fx
    v = (x2d[..., 1] - cy) / fy
    zero = jnp.zeros_like(alpha)
    # row pairs (x, y) of M: (bs, n, 4, 3) -> (bs, n, 12)
    row_x = jnp.stack([alpha, zero, -alpha * u[..., None]], -1)
    row_y = jnp.stack([zero, alpha, -alpha * v[..., None]], -1)
    row_x = row_x.reshape(bs, n, 12)
    row_y = row_y.reshape(bs, n, 12)
    mtm = (jnp.einsum('bn,bni,bnj->bij', w, row_x, row_x)
           + jnp.einsum('bn,bni,bnj->bij', w, row_y, row_y))

    # 4. nullspace vector -> camera-frame control points (scale/sign free)
    _, vecs = jnp.linalg.eigh(mtm)
    ctl_c = vecs[..., 0].reshape(bs, 4, 3)
    # scale from pairwise-distance ratio (6 pairs)
    ii, jj = jnp.triu_indices(4, k=1)
    d_w = jnp.linalg.norm(ctl_w[:, ii] - ctl_w[:, jj], axis=-1)
    d_c = jnp.linalg.norm(ctl_c[:, ii] - ctl_c[:, jj], axis=-1)
    beta = d_w.sum(-1) / (d_c.sum(-1) + eps)               # (bs,)
    ctl_c = ctl_c * beta[:, None, None]
    # sign: reconstructed points must sit in front of the camera
    pts_c = jnp.einsum('bnj,bjk->bnk', alpha, ctl_c)       # (bs, n, 3)
    z_mean = (w * pts_c[..., 2]).sum(-1) / w_sum[..., 0]
    sign = jnp.where(z_mean < 0, -1.0, 1.0).astype(f64)
    pts_c = pts_c * sign[:, None, None]

    # 5. weighted Kabsch: R maps object frame -> camera frame
    cent_c = (w[..., None] * pts_c).sum(1) / w_sum
    pc = pts_c - cent_c[:, None]
    h = jnp.einsum('bn,bni,bnj->bij', w, pc, xc)           # (bs, 3, 3)
    uu, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(jnp.einsum('bij,bjk->bik', uu, vt))
    d_fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    rot = jnp.einsum('bij,bj,bjk->bik', uu, d_fix, vt)     # (bs, 3, 3)
    t = cent_c - jnp.einsum('bij,bj->bi', rot, cent)
    quat = matrix_to_quaternion(rot)
    return jnp.concatenate([t, quat], -1).astype(jnp.float32)


class TestOutputs(NamedTuple):
    pose_est: jnp.ndarray        # (bs, 3, 4) rot-head pose [R|t]
    pose_est_trans: jnp.ndarray  # (bs, 3, 4) trans-head pose [I|t]


def orient_density_images(outs, batch, cam_intrinsic, cfg: SixDoFConfig,
                          rng=None):
    """Per-sample SO(3) orientation-density renders for one test batch.

    The eval-loop visualization hook of the reference
    (EPro-PnP-6DoF/lib/test.py:218-225): run ``monte_carlo_forward`` on
    the predicted correspondences and splat the posterior quaternion
    samples onto the density sphere.

    Returns a list of bs BGR uint8 images.
    """
    from ..visualization.orient_density import draw_so3_density
    from .train import build_correspondences, build_epropnp

    out_res = cfg.dataiter.out_res
    x3d, x2d, w2d, _ = build_correspondences(
        outs.noc, outs.w2d, outs.scale, batch, cam_intrinsic, out_res)
    bs = x3d.shape[0]
    camera = PerspectiveCamera(
        cam_mats=jnp.broadcast_to(cam_intrinsic, (bs, 3, 3)), z_min=0.01)
    cost_fun = AdaptiveHuberPnPCost(
        relative_delta=cfg.pnp.relative_delta).set_param(x2d, w2d)
    epropnp = build_epropnp(cfg)
    _, _, _, pose_samples, logweights, _ = epropnp.monte_carlo_forward(
        x3d, x2d, w2d, camera, cost_fun,
        rng=rng if rng is not None else jax.random.PRNGKey(0),
        force_init_solve=True)
    quats = np.asarray(pose_samples[..., 3:])    # (mc, bs, 4)
    lw = np.asarray(logweights)                  # (mc, bs)
    weights = np.exp(lw - lw.max(axis=0, keepdims=True))
    weights /= weights.sum(axis=0, keepdims=True) + 1e-12
    return [draw_so3_density(quats[:, k], weights[:, k])
            for k in range(bs)]


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
        init: 'epnp' (host cv2, reference-faithful), 'epnp_device'
            (batched nullspace-eigh EPnP, no host sync) or 'rslm'
            (on-device random-sample LM).

    Returns TestOutputs with [R|t] estimates from the rot and trans heads.
    """
    out_res = cfg.dataiter.out_res
    x3d, x2d, w2d, _ = build_correspondences(
        outs.noc, outs.w2d, outs.scale, batch, cam_intrinsic, out_res)

    if init in ('epnp', 'epnp_device'):
        conf = jnp.mean(w2d, axis=-1)
        if init == 'epnp':
            pose_init = jnp.asarray(epnp_init_host(
                np.asarray(x3d), np.asarray(x2d), np.asarray(conf),
                np.asarray(cam_intrinsic)), x3d.dtype)
        else:
            pose_init = epnp_init_device(x3d, x2d, conf,
                                         jnp.asarray(cam_intrinsic))
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
