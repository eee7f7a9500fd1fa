"""Fused RSLM init kernel: quality parity with the jnp init.

Two tiers:

* **Hardware** (TPU attached): the full bench-scale problem through the
  on-chip PRNG path — quality parity with the reference-style jnp sampler.
* **CPU CI** (everywhere): the same kernels in pallas interpret mode with
  the software PRNG stub (``pallas_rslm.INTERPRET``), on a small problem —
  packed layout with and without projection bounds plus the legacy
  (irregular-N) layout, asserting finiteness and init quality vs the jnp
  sampler. Draws differ from the hardware PRNG, so assertions are
  distributional, not bitwise.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_TPU = jax.devices()[0].platform == 'tpu'


def make_small_problem(bs=16, n=128, seed=0):
    """Well-posed synthetic 6DoF problem (bench.make_problem at small scale)."""
    r = np.random.default_rng(seed)
    q = r.normal(size=(bs, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q.T
    rot = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(bs, 3, 3)
    t = np.concatenate([r.uniform(-0.2, 0.2, (bs, 2)),
                        r.uniform(2.0, 6.0, (bs, 1))], axis=-1)
    x3d = r.uniform(-0.5, 0.5, (bs, n, 3))
    K = np.array([[500., 0., 320.], [0., 500., 240.], [0., 0., 1.]])
    xc = np.einsum('bij,bnj->bni', rot, x3d) + t[:, None]
    xh = np.einsum('ij,bnj->bni', K, xc)
    x2d = xh[..., :2] / xh[..., 2:]
    x2d = x2d + r.normal(scale=0.5, size=x2d.shape)
    w2d = r.uniform(0.5, 1.5, (bs, n, 2)) / n
    cam = np.broadcast_to(K, (bs, 3, 3))
    return (jnp.asarray(x3d, jnp.float32), jnp.asarray(x2d, jnp.float32),
            jnp.asarray(w2d, jnp.float32), jnp.asarray(cam, jnp.float32))


def run_fused_vs_ref(x3d, x2d, w2d, cam, bounded, num_proposals=32):
    from epropnp_tpu.ops.pnp import (
        AdaptiveHuberPnPCost, PerspectiveCamera, RSLMSolver)

    if bounded:
        # crop-style projection bounds around the observed x2d
        # (camera.py border clamps; exercises the with_bounds kernel)
        lb = jnp.min(x2d, axis=(0, 1)) - 20.0
        ub = jnp.max(x2d, axis=(0, 1)) + 20.0
        camera = PerspectiveCamera(cam_mats=cam, lb=lb, ub=ub)
    else:
        camera = PerspectiveCamera(cam_mats=cam)
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.1).set_param(x2d, w2d)

    rs_fused = RSLMSolver(dof=6, num_points=16, num_proposals=num_proposals,
                          num_iter=3, use_pallas=True, fast_sampling=True)
    rs_ref = RSLMSolver(dof=6, num_points=16, num_proposals=num_proposals,
                        num_iter=3)
    _, _, c_fused = jax.jit(lambda k: rs_fused.solve(
        x3d, x2d, w2d, camera, cost_fun, rng=k, with_cost=True))(
        jax.random.PRNGKey(0))
    _, _, c_ref = jax.jit(lambda k: rs_ref.solve(
        x3d, x2d, w2d, camera, cost_fun, rng=k, with_cost=True))(
        jax.random.PRNGKey(0))
    return np.asarray(c_fused), np.asarray(c_ref)


@pytest.mark.skipif(not ON_TPU, reason='hardware PRNG path needs a TPU')
@pytest.mark.parametrize('bounded', [False, True])
def test_fused_init_quality_matches_jnp(bounded):
    import bench as bm

    x3d, x2d, w2d, cam, _ = (jnp.asarray(a) for a in bm.make_problem())
    c_fused, c_ref = run_fused_vs_ref(x3d, x2d, w2d, cam, bounded,
                                      num_proposals=64)
    assert np.isfinite(c_fused).all()
    # init quality within 2x of the reference-style sampler on median cost
    assert np.median(c_fused) < 2.0 * np.median(c_ref) + 1e-4


@pytest.mark.slow
@pytest.mark.parametrize('layout,bounded', [
    ('packed', False), ('packed', True), ('legacy', False)])
def test_fused_init_interpret(monkeypatch, layout, bounded):
    """Interpret-mode coverage of the fused kernels on CPU CI."""
    from epropnp_tpu.ops.pnp import pallas_lm, pallas_rslm

    monkeypatch.setattr(pallas_rslm, 'INTERPRET', True)
    # the legacy (irregular-N) path runs the jnp sampler + the fused LM
    # refinement kernel from pallas_lm — force that one to interpret too
    orig_call = pallas_lm.pl.pallas_call
    monkeypatch.setattr(pallas_lm.pl, 'pallas_call',
                        lambda *a, **k: orig_call(
                            *a, **{**k, 'interpret': True}))
    n = 128 if layout == 'packed' else 96  # 96 % 128 != 0 -> legacy kernel
    x3d, x2d, w2d, cam = make_small_problem(bs=16, n=n)
    c_fused, c_ref = run_fused_vs_ref(x3d, x2d, w2d, cam, bounded)
    assert np.isfinite(c_fused).all()
    # the software-PRNG draws differ from hardware; assert the init is in
    # the same quality regime as the jnp sampler, not bitwise-equal
    assert np.median(c_fused) < 3.0 * np.median(c_ref) + 1e-4
