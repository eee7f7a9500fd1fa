"""Integration tests of the AMIS Monte Carlo forward (EProPnP4DoF/6DoF)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epropnp_tpu.models.losses import (
    MonteCarloPoseLossState,
    monte_carlo_pose_loss,
)
from epropnp_tpu.ops.pnp import (
    AdaptiveHuberPnPCost,
    EProPnP4DoF,
    EProPnP6DoF,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)

from test_core_parity import make_problem


def build_epropnp(dof):
    solver = LMSolver(
        dof=dof, num_iter=5,
        init_solver=RSLMSolver(dof=dof, num_points=8, num_proposals=32,
                               num_iter=3))
    cls = EProPnP4DoF if dof == 4 else EProPnP6DoF
    return cls(mc_samples=128, num_iter=4, solver=solver)


@pytest.mark.parametrize("dof", [4, 6])
def test_monte_carlo_forward_shapes_and_convergence(dof):
    rng = np.random.default_rng(10)
    p = make_problem(rng, bs=4, n=48, dof=dof, noise=0.001, outliers=0.0,
                     bounded=False)
    pnp = build_epropnp(dof)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats']))
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(
        jnp.asarray(p['x2d']), jnp.asarray(p['w2d']))

    out = pnp.monte_carlo_forward(
        jnp.asarray(p['x3d']), jnp.asarray(p['x2d']), jnp.asarray(p['w2d']),
        camera, cost_fun, rng=jax.random.PRNGKey(0),
        pose_init=jnp.asarray(p['pose']), force_init_solve=True,
        with_pose_opt_plus=True)
    pose_opt, cost, pose_opt_plus, samples, logweights, cost_init = out

    d = 4 if dof == 4 else 7
    assert pose_opt.shape == (4, d)
    assert samples.shape == (128, 4, d)
    assert logweights.shape == (128, 4)
    assert np.all(np.isfinite(np.asarray(logweights)))
    assert np.all(np.isfinite(np.asarray(cost_init)))
    # The solver should land at the GT on near-noiseless data.
    np.testing.assert_allclose(pose_opt[:, :3], p['pose'][:, :3], atol=5e-3)
    np.testing.assert_allclose(pose_opt_plus[:, :3], p['pose'][:, :3],
                               atol=5e-3)
    # Weighted sample mean of translation concentrates near GT.
    w = np.exp(np.asarray(logweights) - np.max(np.asarray(logweights), 0))
    w /= w.sum(0)
    t_mean = np.einsum('sb,sbi->bi', w, np.asarray(samples)[..., :3])
    np.testing.assert_allclose(t_mean, p['pose'][:, :3], rtol=0.1, atol=0.25)


@pytest.mark.parametrize("dof", [4, 6])
def test_monte_carlo_forward_jits(dof):
    rng = np.random.default_rng(11)
    p = make_problem(rng, bs=2, n=24, dof=dof, noise=0.01, outliers=0.0,
                     bounded=False)
    pnp = build_epropnp(dof)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats']))
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(
        jnp.asarray(p['x2d']), jnp.asarray(p['w2d']))

    def run(x3d, x2d, w2d, camera, cost_fun, pose_init, key):
        return pnp.monte_carlo_forward(
            x3d, x2d, w2d, camera, cost_fun, rng=key, pose_init=pose_init,
            force_init_solve=True)

    args = (jnp.asarray(p['x3d']), jnp.asarray(p['x2d']),
            jnp.asarray(p['w2d']), camera, cost_fun, jnp.asarray(p['pose']),
            jax.random.PRNGKey(7))
    eager = run(*args)
    jitted = jax.jit(run)(*args)
    for a, b in zip(eager, jitted):
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


def test_monte_carlo_loss_and_gradients():
    """Gradients flow through cost_init and the sampled costs into w2d/x3d,
    and the loss decreases the target cost when followed."""
    rng = np.random.default_rng(12)
    p = make_problem(rng, bs=3, n=32, dof=6, noise=0.05, outliers=0.0,
                     bounded=False)
    pnp = build_epropnp(6)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats']))

    def loss_fn(w2d_logits, x3d, state):
        w2d = jax.nn.softmax(
            w2d_logits.reshape(w2d_logits.shape[0], -1), axis=-1
        ).reshape(w2d_logits.shape)
        cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(
            jnp.asarray(p['x2d']), w2d)
        out = pnp.monte_carlo_forward(
            x3d, jnp.asarray(p['x2d']), w2d, camera, cost_fun,
            rng=jax.random.PRNGKey(1), pose_init=jnp.asarray(p['pose']),
            force_init_solve=True)
        _, _, _, _, logweights, cost_init = out
        norm_factor = jnp.asarray(2.0)
        loss, new_state = monte_carlo_pose_loss(
            logweights, cost_init, norm_factor, state)
        return loss, new_state

    state = MonteCarloPoseLossState.create(dtype=jnp.float64)
    w2d_logits = jnp.asarray(rng.normal(size=p['w2d'].shape))
    (loss, new_state), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                  has_aux=True)(
        w2d_logits, jnp.asarray(p['x3d']), state)
    g_w, g_x3d = grads
    assert np.isfinite(loss)
    assert np.all(np.isfinite(np.asarray(g_w)))
    assert np.all(np.isfinite(np.asarray(g_x3d)))
    assert np.abs(np.asarray(g_w)).max() > 0
    assert np.abs(np.asarray(g_x3d)).max() > 0
    # EMA buffer updated.
    assert float(new_state.norm_factor) != 1.0


def test_pose_opt_plus_is_differentiable_but_solve_is_not():
    rng = np.random.default_rng(13)
    p = make_problem(rng, bs=2, n=16, dof=6, noise=0.01, outliers=0.0,
                     bounded=False)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats']))
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(
        jnp.asarray(p['x2d']), jnp.asarray(p['w2d']))
    solver = LMSolver(dof=6, num_iter=3)

    def f(x3d, which):
        pose_opt, _, _, pose_opt_plus = solver.forward(
            x3d, jnp.asarray(p['x2d']), jnp.asarray(p['w2d']), camera,
            cost_fun, pose_init=jnp.asarray(p['pose']),
            with_pose_opt_plus=True)
        return jnp.sum(pose_opt if which == 'opt' else pose_opt_plus)

    g_opt = jax.grad(lambda x: f(x, 'opt'))(jnp.asarray(p['x3d']))
    g_plus = jax.grad(lambda x: f(x, 'plus'))(jnp.asarray(p['x3d']))
    assert np.abs(np.asarray(g_opt)).max() == 0.0      # solve is no-grad
    assert np.abs(np.asarray(g_plus)).max() > 0.0      # GN step carries grad
    assert np.all(np.isfinite(np.asarray(g_plus)))
