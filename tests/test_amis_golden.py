"""Golden AMIS trace: pinned per-iteration logweight digests.

The reference's AMIS layer (epropnp/epropnp.py:87-196) cannot be loaded
in this image (pyro absent), so the probabilistic layer is pinned two
ways: (a) exact scipy log-prob oracles for every proposal distribution
(test_distributions.py) and (b) THIS golden trace — logsumexp of the
pose_sample_logweights per AMIS iteration on a fixed problem and PRNG
key, recorded while L0-L2 parity vs the live torch reference was green.
Any numerical regression in the solve, proposal fitting, sampling, or
the triangular mixture-logprob structure moves these digests.

Values generated on CPU/f64 (tests/conftest.py enables x64), jax 0.8.x.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.special import logsumexp

from epropnp_tpu.ops.pnp import (
    AdaptiveHuberPnPCost,
    EProPnP4DoF,
    EProPnP6DoF,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)

from test_core_parity import make_problem

# logsumexp over the 32 samples of each of the 4 AMIS iterations, per
# object (4, B=2); recorded 2026-08 (see module docstring)
GOLDEN = {
    4: np.array([
        [-1.454621088583, -0.376932397469],
        [-1.590716770842, -0.648861712317],
        [-1.672213723856, -0.571015997784],
        [-1.997811119427, -0.645257122601]]),
    6: np.array([
        [-9.838213854467, -5.94954030155],
        [-9.918649621274, -6.706498392882],
        [-9.689578086648, -6.156823361954],
        [-9.089507612826, -5.46964710203]]),
}


def run_trace(dof):
    rng = np.random.default_rng(123)
    p = make_problem(rng, bs=2, n=24, dof=dof, noise=0.002, outliers=0.0,
                     bounded=False)
    solver = LMSolver(
        dof=dof, num_iter=5,
        init_solver=RSLMSolver(dof=dof, num_points=8, num_proposals=32,
                               num_iter=3))
    cls = EProPnP4DoF if dof == 4 else EProPnP6DoF
    pnp = cls(mc_samples=128, num_iter=4, solver=solver)
    camera = PerspectiveCamera(cam_mats=jnp.asarray(p['cam_mats']))
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(
        jnp.asarray(p['x2d']), jnp.asarray(p['w2d']))
    out = pnp.monte_carlo_forward(
        jnp.asarray(p['x3d']), jnp.asarray(p['x2d']), jnp.asarray(p['w2d']),
        camera, cost_fun, rng=jax.random.PRNGKey(42),
        pose_init=jnp.asarray(p['pose']), force_init_solve=True)
    logweights = np.asarray(out[4])          # (mc_samples, B)
    return logsumexp(logweights.reshape(4, 32, 2), axis=1)


@pytest.mark.parametrize('dof', [4, 6])
def test_amis_logweight_trace_matches_golden(dof):
    digest = run_trace(dof)
    np.testing.assert_allclose(digest, GOLDEN[dof], rtol=1e-6, atol=1e-8)
