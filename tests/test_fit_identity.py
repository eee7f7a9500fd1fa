"""Integration test: the fit_identity end-to-end slice converges.

The reference's own install-verification path is running the
``demo/fit_identity.ipynb`` notebook to convergence (SURVEY.md §4.5); this is
the automated, scaled-down equivalent: a few hundred steps of the full
MLP -> correspondences -> AMIS Monte Carlo -> losses -> Adam pipeline must
reduce the pose recovery error to near the data noise floor.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo import fit_identity  # noqa: E402


@pytest.mark.slow
def test_fit_identity_converges():
    epropnp = fit_identity.make_epropnp(
        mc_samples=128, num_iter=4, lm_iter=5, rs_points=8, rs_proposals=32,
        rs_iter=3)
    results = fit_identity.run(
        n_data=4096, batch_size=256, n_epoch=4, noise=0.01, num_points=32,
        hidden=256, seed=0, epropnp=epropnp, verbose=False)
    # With an untrained net the pose solve returns garbage (errors >> 1); a
    # converging pipeline reaches the vicinity of the noise floor.
    assert results['mean_trans_err'] < 0.1, results
    assert results['mean_orient_err'] < 0.3, results


def test_fit_identity_train_step_runs_and_grads_finite():
    """One jitted train step: finite loss, finite grads, params update."""
    epropnp = fit_identity.make_epropnp(
        mc_samples=32, num_iter=2, lm_iter=3, rs_points=8, rs_proposals=8,
        rs_iter=2)
    num_points = 16
    rng = jax.random.PRNGKey(0)
    k_data, k_init, k_step = jax.random.split(rng, 3)
    in_pose, out_pose = fit_identity.gen_poses(k_data, 8)
    cam_mats = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    params = fit_identity.init_params(k_init, num_points, hidden=64)
    opt = fit_identity.make_optimizer()
    opt_state = opt.init(params)
    mc_state = fit_identity.MonteCarloPoseLossState.create()

    new_params, _, new_mc_state, metrics = fit_identity.train_step(
        params, opt_state, mc_state, in_pose, out_pose, cam_mats, k_step,
        epropnp, num_points, opt)

    assert jnp.isfinite(metrics.loss)
    assert jnp.isfinite(metrics.loss_mc)
    # params must have moved (gradients flowed through the MC loss)
    moved = jax.tree_util.tree_map(
        lambda a, b: jnp.any(a != b), params, new_params)
    assert any(jax.tree_util.tree_leaves(moved))
    # the EMA buffer updated
    assert new_mc_state.norm_factor != mc_state.norm_factor
