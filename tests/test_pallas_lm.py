"""Pallas fused LM kernel vs the jnp solver (parity, interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epropnp_tpu.ops.pnp import (
    HuberPnPCost, LMSolver, PerspectiveCamera)
from epropnp_tpu.ops.pnp import pallas_lm


def make_problem(seed, b=8, n=32, dof=6):
    r = np.random.default_rng(seed)
    from epropnp_tpu.ops.rotation_conversions import (
        quaternion_to_matrix, random_quaternions)
    if dof == 6:
        q = np.asarray(random_quaternions(jax.random.PRNGKey(seed), b,
                                          dtype=jnp.float64))
        rot = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        pose = np.concatenate(
            [r.uniform([-.2, -.2, 3], [.2, .2, 6], (b, 3)), q], -1)
    else:
        yaw = r.uniform(-np.pi, np.pi, (b, 1))
        c, s = np.cos(yaw[:, 0]), np.sin(yaw[:, 0])
        rot = np.zeros((b, 3, 3))
        rot[:, 0, 0] = c
        rot[:, 0, 2] = s
        rot[:, 1, 1] = 1
        rot[:, 2, 0] = -s
        rot[:, 2, 2] = c
        pose = np.concatenate(
            [r.uniform([-.2, -.2, 3], [.2, .2, 6], (b, 3)), yaw], -1)
    x3d = r.uniform(-.5, .5, (b, n, 3))
    K = np.array([[400., 0, 320], [0, 420., 240], [0, 0, 1]])
    xc = np.einsum('bij,bnj->bni', rot, x3d) + pose[:, None, :3]
    uv = np.einsum('ij,bnj->bni', K, xc)
    x2d = uv[..., :2] / uv[..., 2:] + r.normal(0, .3, (b, n, 2))
    w2d = r.uniform(.5, 1.5, (b, n, 2)) / n
    # perturbed init
    pose0 = pose.copy()
    pose0[:, :3] += r.normal(0, .05, (b, 3))
    if dof == 6:
        pose0[:, 3:] += r.normal(0, .05, (b, 4))
        pose0[:, 3:] /= np.linalg.norm(pose0[:, 3:], axis=-1, keepdims=True)
    else:
        pose0[:, 3] += r.normal(0, .1, b)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return (f32(x3d), f32(x2d), f32(w2d),
            jnp.broadcast_to(f32(K), (b, 3, 3)), f32(pose), f32(pose0))


@pytest.mark.parametrize('dof,fast', [(6, True), (6, False), (4, True),
                                      (4, False)])
def test_pallas_matches_jnp_solver(dof, fast, monkeypatch):
    x3d, x2d, w2d, cams, pose_gt, pose0 = make_problem(dof * 10 + fast,
                                                       dof=dof)
    delta = jnp.full((x3d.shape[0],), 0.7, jnp.float32)
    num_iter = 5

    solver = LMSolver(dof=dof, num_iter=num_iter)
    camera = PerspectiveCamera(cam_mats=cams, z_min=0.1)
    cost_fun = HuberPnPCost(delta=delta)
    pose_ref, _, cost_ref = solver.solve(
        x3d, x2d, w2d, camera, cost_fun, pose_init=pose0, with_cost=True,
        fast_mode=fast)

    # interpret mode: runs the kernel logic on CPU
    import epropnp_tpu.ops.pnp.pallas_lm as pk
    orig = pk.pl.pallas_call
    monkeypatch.setattr(
        pk.pl, 'pallas_call',
        lambda *a, **k: orig(*a, interpret=True, **k))
    pose_pl, cost_pl = pallas_lm.lm_solve_pallas(
        x3d, x2d, w2d, pallas_lm.camera_to_fxfycxcy(cams), delta, pose0,
        dof=dof, num_iter=num_iter, fast_mode=fast, z_min=0.1, tile_b=8)

    np.testing.assert_allclose(np.asarray(cost_pl), np.asarray(cost_ref),
                               rtol=2e-4, atol=1e-4)
    p_ref = np.asarray(pose_ref)
    p_pl = np.asarray(pose_pl)
    np.testing.assert_allclose(p_pl[:, :3], p_ref[:, :3], atol=2e-4)
    if dof == 6:
        dot = np.abs(np.sum(p_pl[:, 3:] * p_ref[:, 3:], axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    else:
        d = np.abs(p_pl[:, 3] - p_ref[:, 3])
        np.testing.assert_allclose(np.minimum(d, 2 * np.pi - d), 0.0,
                                   atol=2e-4)


@pytest.mark.parametrize('dof,fast', [(6, False), (4, True)])
def test_pallas_bounds_and_pose_cov_match_jnp(dof, fast, monkeypatch):
    """Training-path features: projection bounds + JtJ/pose_cov output."""
    x3d, x2d, w2d, cams, pose_gt, pose0 = make_problem(dof * 7 + fast,
                                                       dof=dof)
    delta = jnp.full((x3d.shape[0],), 0.7, jnp.float32)
    num_iter = 5
    b = x3d.shape[0]
    # tight bounds so some projections actually clamp
    lo = jnp.quantile(x2d.reshape(-1, 2), 0.05, axis=0)
    hi = jnp.quantile(x2d.reshape(-1, 2), 0.95, axis=0)
    lb = jnp.broadcast_to(lo, (b, 2)).astype(jnp.float32)
    ub = jnp.broadcast_to(hi, (b, 2)).astype(jnp.float32)

    solver = LMSolver(dof=dof, num_iter=num_iter)
    camera = PerspectiveCamera(cam_mats=cams, lb=lb, ub=ub, z_min=0.1)
    cost_fun = HuberPnPCost(delta=delta)
    pose_ref, cov_ref, cost_ref = solver.solve(
        x3d, x2d, w2d, camera, cost_fun, pose_init=pose0, with_cost=True,
        with_pose_cov=True, fast_mode=fast)

    import epropnp_tpu.ops.pnp.pallas_lm as pk
    orig = pk.pl.pallas_call
    monkeypatch.setattr(
        pk.pl, 'pallas_call',
        lambda *a, **k: orig(*a, interpret=True, **k))
    solver_pl = LMSolver(dof=dof, num_iter=num_iter, use_pallas=True)
    pose_pl, cov_pl, cost_pl = solver_pl.solve(
        x3d, x2d, w2d, camera, cost_fun, pose_init=pose0, with_cost=True,
        with_pose_cov=True, fast_mode=fast)

    assert np.isfinite(np.asarray(x2d)).all()
    # with tight bounds, confirm clamps were actually exercised
    proj, _ = camera.project(x3d, pose_ref)
    assert (np.asarray(proj) == np.asarray(lb)[:, None]).any() \
        or (np.asarray(proj) == np.asarray(ub)[:, None]).any()

    np.testing.assert_allclose(np.asarray(cost_pl), np.asarray(cost_ref),
                               rtol=2e-4, atol=1e-4)
    p_ref, p_pl = np.asarray(pose_ref), np.asarray(pose_pl)
    np.testing.assert_allclose(p_pl[:, :3], p_ref[:, :3], atol=5e-4)
    if dof == 6:
        dot = np.abs(np.sum(p_pl[:, 3:] * p_ref[:, 3:], axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    # pose covariance parity (relative to per-object covariance scale)
    c_ref, c_pl = np.asarray(cov_ref), np.asarray(cov_pl)
    scale = np.abs(c_ref).max(axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(c_pl / scale, c_ref / scale, atol=2e-3)
