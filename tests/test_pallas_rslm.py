"""Fused RSLM init kernel: quality parity with the jnp init (TPU only).

The kernel uses the on-chip PRNG, which has no CPU interpreter support, so
this test runs only when a TPU is attached (skipped in the CPU CI suite;
``bench.py`` exercises the same path on hardware every round).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if jax.devices()[0].platform == 'cpu':
    pytest.skip('fused RSLM kernel needs the TPU PRNG', allow_module_level=True)


@pytest.mark.parametrize('bounded', [False, True])
def test_fused_init_quality_matches_jnp(bounded):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bm
    from epropnp_tpu.ops.pnp import (
        AdaptiveHuberPnPCost, PerspectiveCamera, RSLMSolver)

    prob = bm.make_problem()
    x3d, x2d, w2d, cam, _ = (jnp.asarray(a) for a in prob)
    if bounded:
        # crop-style projection bounds around the observed x2d
        # (camera.py border clamps; exercises the with_bounds kernel)
        lb = jnp.min(x2d, axis=(0, 1)) - 20.0
        ub = jnp.max(x2d, axis=(0, 1)) + 20.0
        camera = PerspectiveCamera(cam_mats=cam, lb=lb, ub=ub)
    else:
        camera = PerspectiveCamera(cam_mats=cam)
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.1).set_param(x2d, w2d)

    rs_fused = RSLMSolver(dof=6, num_points=16, num_proposals=64,
                          num_iter=3, use_pallas=True, fast_sampling=True)
    rs_ref = RSLMSolver(dof=6, num_points=16, num_proposals=64, num_iter=3)
    _, _, c_fused = jax.jit(lambda k: rs_fused.solve(
        x3d, x2d, w2d, camera, cost_fun, rng=k, with_cost=True))(
        jax.random.PRNGKey(0))
    _, _, c_ref = jax.jit(lambda k: rs_ref.solve(
        x3d, x2d, w2d, camera, cost_fun, rng=k, with_cost=True))(
        jax.random.PRNGKey(0))
    c_fused, c_ref = np.asarray(c_fused), np.asarray(c_ref)
    assert np.isfinite(c_fused).all()
    # init quality within 2x of the reference-style sampler on median cost
    assert np.median(c_fused) < 2.0 * np.median(c_ref) + 1e-4
