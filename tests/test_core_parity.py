"""Numerical parity of the JAX core against the PyTorch reference.

Runs both implementations on identical float64 inputs and compares
per-iterate numerics (target: well under the 1e-4 budget from BASELINE.md).
Skipped when /root/reference or torch is unavailable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epropnp_tpu.ops.pnp import (
    AdaptiveHuberPnPCost,
    HuberPnPCost,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
    evaluate_pnp,
    pnp_denormalize,
    pnp_normalize,
)

from ref_loader import load_reference_pnp

ref = load_reference_pnp()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

if ref is not None:
    import torch


@pytest.fixture(autouse=True)
def _torch_float64_scoped():
    """These parity tests compare against the reference in float64, but
    ``torch.set_default_dtype`` is PROCESS-wide — a module-level call
    leaked float64 into later test modules (round-2 suite failure in
    test_mc_blowup_parity). Scope it per-test with save/restore."""
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def make_problem(rng, bs=6, n=32, dof=6, noise=0.02, outliers=0.2,
                 bounded=True):
    """Random PnP problem with some clamped/outlier points."""
    x3d = rng.normal(size=(bs, n, 3))
    if dof == 4:
        yaw = rng.uniform(-np.pi, np.pi, size=(bs,))
        pose = np.concatenate(
            [rng.normal(scale=0.3, size=(bs, 2)),
             rng.uniform(4.0, 8.0, size=(bs, 1)), yaw[:, None]], axis=-1)
        from epropnp_tpu.ops.pnp.common import yaw_to_rot_mat
        rot = np.asarray(yaw_to_rot_mat(jnp.asarray(yaw)))
    else:
        q = rng.normal(size=(bs, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pose = np.concatenate(
            [rng.normal(scale=0.3, size=(bs, 2)),
             rng.uniform(4.0, 8.0, size=(bs, 1)), q], axis=-1)
        from epropnp_tpu.ops.pnp.common import quaternion_to_rot_mat
        rot = np.asarray(quaternion_to_rot_mat(jnp.asarray(q)))
    k = np.array([[320.0, 0.0, 160.0], [0.0, 320.0, 120.0], [0.0, 0.0, 1.0]])
    cam_mats = np.tile(k, (bs, 1, 1))
    x3d_rot = np.einsum('bij,bnj->bni', rot, x3d)
    xcam = x3d_rot + pose[:, None, :3]
    x2d = xcam[..., :2] / xcam[..., 2:] @ k[:2, :2].T + k[:2, 2]
    x2d += rng.normal(scale=noise, size=x2d.shape)
    out_mask = rng.uniform(size=(bs, n)) < outliers
    x2d[out_mask] += rng.normal(scale=30.0, size=x2d[out_mask].shape)
    w2d = rng.uniform(0.5, 2.0, size=(bs, n, 2)) / n
    lb = ub = None
    if bounded:
        lb = np.full((bs, 2), -100.0)
        ub = np.full((bs, 2), np.array([420.0, 340.0]))
    return dict(x3d=x3d, x2d=x2d, w2d=w2d, pose=pose, cam_mats=cam_mats,
                lb=lb, ub=ub)


def jax_objs(p, delta=1.0):
    camera = PerspectiveCamera(
        cam_mats=jnp.asarray(p['cam_mats']),
        lb=None if p['lb'] is None else jnp.asarray(p['lb']),
        ub=None if p['ub'] is None else jnp.asarray(p['ub']))
    cost_fun = HuberPnPCost(delta=delta)
    return camera, cost_fun


def ref_objs(p, delta=1.0):
    camera = ref.camera.PerspectiveCamera(
        cam_mats=torch.as_tensor(p['cam_mats']),
        lb=None if p['lb'] is None else torch.as_tensor(p['lb']),
        ub=None if p['ub'] is None else torch.as_tensor(p['ub']))
    cost_fun = ref.cost_fun.HuberPnPCost(delta=delta)
    return camera, cost_fun


@pytest.mark.parametrize("dof", [4, 6])
def test_evaluate_pnp_parity(dof):
    rng = np.random.default_rng(0)
    p = make_problem(rng, dof=dof)
    camera, cost_fun = jax_objs(p)
    r_camera, r_cost_fun = ref_objs(p)

    ev = evaluate_pnp(
        jnp.asarray(p['x3d']), jnp.asarray(p['x2d']), jnp.asarray(p['w2d']),
        jnp.asarray(p['pose']), camera, cost_fun,
        out_jacobian=True, out_residual=True, out_cost=True)
    r_res, r_cost, r_jac = ref.common.evaluate_pnp(
        torch.as_tensor(p['x3d']), torch.as_tensor(p['x2d']),
        torch.as_tensor(p['w2d']), torch.as_tensor(p['pose']),
        r_camera, r_cost_fun,
        out_jacobian=True, out_residual=True, out_cost=True)

    np.testing.assert_allclose(ev.residual, r_res.numpy(), atol=1e-9)
    np.testing.assert_allclose(ev.cost, r_cost.numpy(), atol=1e-9)
    np.testing.assert_allclose(ev.jacobian, r_jac.numpy(), atol=1e-9)


@pytest.mark.parametrize("dof", [4, 6])
def test_camera_jacobian_vs_autodiff(dof):
    """Analytic Jacobian matches jax.jacfwd of the projection w.r.t. the
    pose tangent (away from clamps)."""
    rng = np.random.default_rng(1)
    p = make_problem(rng, bs=3, n=8, dof=dof, noise=0.0, outliers=0.0,
                     bounded=False)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats']))
    x3d = jnp.asarray(p['x3d'])
    pose = jnp.asarray(p['pose'])
    _, jac = camera.project(x3d, pose, out_jac=True)

    from epropnp_tpu.ops.pnp.common import quaternion_to_rot_mat, yaw_to_rot_mat

    def proj_tangent(delta, pose_b, x3d_b, cam_b):
        # Local tangent: translation additive; rotation via quaternion
        # transform / yaw additive.
        if dof == 4:
            pose_new = pose_b + delta
        else:
            q = pose_b[3:]
            qt = PerspectiveCamera.get_quaternion_transfrom_mat(q)
            q_new = q + qt @ delta[3:]
            # No normalization: the reference Jacobian is of the unnormalized
            # embedding map (scale-invariant projection up to first order).
            pose_new = jnp.concatenate([pose_b[:3] + delta[:3], q_new])
        cam = PerspectiveCamera(cam_mats=cam_b)
        x2d_proj, _ = cam.project(x3d_b[None], pose_new[None])
        return x2d_proj[0]

    n_dof = 4 if dof == 4 else 6
    for b in range(3):
        jac_auto = jax.jacfwd(proj_tangent)(
            jnp.zeros((n_dof,), jnp.float64), pose[b], x3d[b],
            jnp.asarray(p['cam_mats'])[b])
        np.testing.assert_allclose(jac[b], jac_auto, atol=1e-6)


def test_adaptive_huber_delta_parity():
    rng = np.random.default_rng(2)
    p = make_problem(rng)
    cf = AdaptiveHuberPnPCost(relative_delta=0.1).set_param(
        jnp.asarray(p['x2d']), jnp.asarray(p['w2d']))
    r_cf = ref.cost_fun.AdaptiveHuberPnPCost(relative_delta=0.1)
    r_cf.set_param(torch.as_tensor(p['x2d']), torch.as_tensor(p['w2d']))
    np.testing.assert_allclose(cf.delta, r_cf.delta.numpy(), rtol=1e-12)


@pytest.mark.parametrize("dof", [4, 6])
def test_pnp_normalize_parity(dof):
    rng = np.random.default_rng(3)
    p = make_problem(rng, dof=dof)
    x3d = jnp.asarray(p['x3d'])
    pose = jnp.asarray(p['pose'])
    offset, x3d_n, pose_n = pnp_normalize(x3d, pose)
    r_off, r_x3d_n, r_pose_n = ref.common.pnp_normalize(
        torch.as_tensor(p['x3d']), torch.as_tensor(p['pose']))
    np.testing.assert_allclose(offset, r_off.numpy(), atol=1e-12)
    np.testing.assert_allclose(x3d_n, r_x3d_n.numpy(), atol=1e-12)
    np.testing.assert_allclose(pose_n, r_pose_n.numpy(), atol=1e-12)
    pose_back = pnp_denormalize(offset, pose_n)
    np.testing.assert_allclose(pose_back, pose, atol=1e-10)


@pytest.mark.parametrize("dof,fast_mode", [(4, False), (6, False),
                                           (4, True), (6, True)])
def test_lm_solver_parity(dof, fast_mode):
    """Per-iterate parity of the full LM / GN solve from a given init."""
    rng = np.random.default_rng(4)
    p = make_problem(rng, dof=dof)
    # Perturbed init so the solver does real work.
    pose_init = p['pose'].copy()
    pose_init[:, :3] += rng.normal(scale=0.3, size=(pose_init.shape[0], 3))
    if dof == 6:
        pose_init[:, 3:] += rng.normal(scale=0.1, size=(pose_init.shape[0], 4))
        pose_init[:, 3:] /= np.linalg.norm(pose_init[:, 3:], axis=-1,
                                           keepdims=True)
    else:
        pose_init[:, 3] += rng.normal(scale=0.2, size=pose_init.shape[0])

    camera, cost_fun = jax_objs(p)
    r_camera, r_cost_fun = ref_objs(p)

    solver = LMSolver(dof=dof, num_iter=10)
    pose_opt, pose_cov, cost = solver.solve(
        jnp.asarray(p['x3d']), jnp.asarray(p['x2d']), jnp.asarray(p['w2d']),
        camera, cost_fun, pose_init=jnp.asarray(pose_init),
        with_pose_cov=True, with_cost=True, fast_mode=fast_mode)

    r_solver = ref.levenberg_marquardt.LMSolver(dof=dof, num_iter=10)
    r_pose, r_cov, r_cost = r_solver.solve(
        torch.as_tensor(p['x3d']), torch.as_tensor(p['x2d']),
        torch.as_tensor(p['w2d']), r_camera, r_cost_fun,
        pose_init=torch.as_tensor(pose_init),
        with_pose_cov=True, with_cost=True, fast_mode=fast_mode)

    np.testing.assert_allclose(pose_opt, r_pose.numpy(), atol=1e-6)
    np.testing.assert_allclose(cost, r_cost.numpy(), atol=1e-6)
    np.testing.assert_allclose(pose_cov, r_cov.numpy(), atol=1e-4)


@pytest.mark.parametrize("dof", [4, 6])
def test_gn_step_parity(dof):
    rng = np.random.default_rng(5)
    p = make_problem(rng, dof=dof)
    camera, cost_fun = jax_objs(p)
    r_camera, r_cost_fun = ref_objs(p)
    solver = LMSolver(dof=dof)
    r_solver = ref.levenberg_marquardt.LMSolver(dof=dof)
    step = solver.gn_step(
        jnp.asarray(p['x3d']), jnp.asarray(p['x2d']), jnp.asarray(p['w2d']),
        jnp.asarray(p['pose']), camera, cost_fun)
    r_step = r_solver.gn_step(
        torch.as_tensor(p['x3d']), torch.as_tensor(p['x2d']),
        torch.as_tensor(p['w2d']), torch.as_tensor(p['pose']),
        r_camera, r_cost_fun)
    np.testing.assert_allclose(step, r_step.numpy(), atol=1e-8)
    pose_plus = solver.pose_add(jnp.asarray(p['pose']), step, camera)
    r_plus = r_solver.pose_add(torch.as_tensor(p['pose']), r_step, r_camera)
    np.testing.assert_allclose(pose_plus, r_plus.numpy(), atol=1e-8)


def test_center_based_init_parity():
    rng = np.random.default_rng(6)
    for dof in (4, 6):
        p = make_problem(rng, dof=dof)
        camera, _ = jax_objs(p)
        r_camera, _ = ref_objs(p)
        s = RSLMSolver(dof=dof)
        r_s = ref.levenberg_marquardt.RSLMSolver(dof=dof)
        t = s.center_based_init(
            jnp.asarray(p['x2d']), jnp.asarray(p['x3d']), camera)
        r_t = r_s.center_based_init(
            torch.as_tensor(p['x2d']), torch.as_tensor(p['x3d']), r_camera)
        np.testing.assert_allclose(t, r_t.numpy(), atol=1e-9)


@pytest.mark.parametrize("dof", [4, 6])
def test_rslm_init_quality(dof):
    """RSLM init + LM refine recovers the true pose on a clean problem
    (distributional check; RNG streams differ from the reference)."""
    rng = np.random.default_rng(7)
    p = make_problem(rng, bs=4, n=64, dof=dof, noise=0.0, outliers=0.0,
                     bounded=False)
    camera, cost_fun = jax_objs(p)
    solver = LMSolver(
        dof=dof, num_iter=10,
        init_solver=RSLMSolver(dof=dof, num_points=16, num_proposals=64,
                               num_iter=3))
    pose_opt, _, cost = solver.solve(
        jnp.asarray(p['x3d']), jnp.asarray(p['x2d']), jnp.asarray(p['w2d']),
        camera, cost_fun, rng=jax.random.PRNGKey(0), with_cost=True)
    # Translation close to GT.
    np.testing.assert_allclose(pose_opt[:, :3], p['pose'][:, :3], atol=1e-3)
    if dof == 6:
        q_sim = np.abs(np.sum(np.asarray(pose_opt[:, 3:]) * p['pose'][:, 3:],
                              axis=-1))
        assert np.all(q_sim > 1 - 1e-6)
    else:
        dyaw = np.asarray(pose_opt[:, 3]) - p['pose'][:, 3]
        dyaw = np.abs(np.arctan2(np.sin(dyaw), np.cos(dyaw)))
        assert np.all(dyaw < 1e-3)
