"""Fused RSLM init kernel on CPU: interpret-mode coverage.

The hardware PRNG (pltpu.prng_random_bits) is stubbed to zeros by the
TPU interpreter, so randomness is injected instead: ``_uniform`` is
monkeypatched with a deterministic golden-ratio low-discrepancy stub
(advanced per trace-time call), and the kernel runs under
``pltpu.InterpretParams()`` (which lowers ``prng_seed``). This exercises
the full kernel logic — inverse-CDF weighted sampling, center-based
init, in-kernel trust-region LM on subsets, proposal argmin — on CPU CI
(VERDICT r1 Weak #3); exact quality parity vs the jnp init stays on the
hardware test (test_pallas_rslm.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import epropnp_tpu.ops.pnp.pallas_rslm as pk
from epropnp_tpu.ops.pnp import HuberPnPCost, PerspectiveCamera
from epropnp_tpu.ops.pnp.common import evaluate_pnp
from epropnp_tpu.ops.pnp.pallas_lm import camera_to_fxfycxcy

from test_core_parity import make_problem


def _stub_uniform_factory():
    state = {'calls': 0}

    def stub(shape, extra=None):
        state['calls'] += 1
        c = state['calls']
        r = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
        flat = r * shape[-1] + col
        u = jnp.mod(flat * 0.6180339887 + 0.331 * c, 1.0)
        if extra is not None:
            # per-loop-iteration salt (chunked sampling in the packed
            # kernel); keep draws distinct across chunks
            u = jnp.mod(
                u + 0.2716 * jnp.asarray(extra, jnp.float32), 1.0)
        return u

    return stub


@pytest.fixture
def interpret_kernel(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    orig = pk.pl.pallas_call
    monkeypatch.setattr(
        pk.pl, 'pallas_call',
        lambda *a, **k: orig(
            *a, **{**k, 'interpret': pltpu.InterpretParams()}))
    monkeypatch.setattr(pk, '_uniform', _stub_uniform_factory())


def _run(dof, n, bounded=False, num_points=16, num_proposals=32):
    rng = np.random.default_rng(5 + dof + n)
    p = make_problem(rng, bs=8, n=n, dof=dof, noise=0.001, outliers=0.0,
                     bounded=False)
    x3d = jnp.asarray(p['x3d'], jnp.float32)
    x2d = jnp.asarray(p['x2d'], jnp.float32)
    w2d = jnp.asarray(p['w2d'], jnp.float32)
    cams = jnp.asarray(p['cam_mats'], jnp.float32)
    delta = jnp.full((8,), 1.0, jnp.float32)
    seeds = jnp.arange(8, dtype=jnp.int32)
    bounds = None
    if bounded:
        lb = jnp.min(x2d, axis=(0, 1)) - 50.0
        ub = jnp.max(x2d, axis=(0, 1)) + 50.0
        bounds = jnp.broadcast_to(jnp.concatenate([lb, ub]), (8, 4))
    # bypass the jit wrapper so the monkeypatched internals are traced
    pose, cost = pk.rslm_init_pallas.__wrapped__(
        x3d, x2d, w2d, camera_to_fxfycxcy(cams), delta, seeds,
        bounds=bounds, dof=dof, num_points=num_points,
        num_proposals=num_proposals, num_iter=3, tile_obj=4)
    return p, x3d, x2d, w2d, cams, delta, pose, cost, bounds


@pytest.mark.parametrize('dof', [4, 6])
@pytest.mark.parametrize('layout_n', [128, 96])
def test_interpret_cost_consistency_and_quality(interpret_kernel, dof,
                                                layout_n):
    """Packed (n=128) and legacy (n=96) layouts on CPU.

    Invariants: (a) the returned cost IS the full-set Huber cost of the
    returned pose (pins the in-kernel projection/IRLS/pose-add against
    the XLA implementation), (b) the init beats a 1 m-perturbed GT pose
    on near-noiseless data.
    """
    p, x3d, x2d, w2d, cams, delta, pose, cost, _ = _run(dof, layout_n)
    assert np.all(np.isfinite(np.asarray(pose)))
    assert np.all(np.isfinite(np.asarray(cost)))

    camera = PerspectiveCamera(cam_mats=cams)
    cost_fun = HuberPnPCost(delta=delta)
    ev = evaluate_pnp(x3d, x2d, w2d, jnp.asarray(pose), camera, cost_fun,
                      out_cost=True)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ev.cost),
                               rtol=2e-3, atol=1e-2)

    bad_pose = jnp.asarray(p['pose'], jnp.float32)
    bad_pose = bad_pose.at[:, 0].add(1.0)
    ev_bad = evaluate_pnp(x3d, x2d, w2d, bad_pose, camera, cost_fun,
                          out_cost=True)
    assert np.all(np.asarray(cost) < np.asarray(ev_bad.cost))


@pytest.mark.parametrize('dof', [4, 6])
def test_interpret_bounded_packed(interpret_kernel, dof):
    """Projection-bounds variant of the packed kernel (crop cameras)."""
    p, x3d, x2d, w2d, cams, delta, pose, cost, bounds = _run(
        dof, 128, bounded=True)
    assert np.all(np.isfinite(np.asarray(pose)))
    camera = PerspectiveCamera(cam_mats=cams, lb=bounds[0, :2],
                               ub=bounds[0, 2:])
    cost_fun = HuberPnPCost(delta=delta)
    ev = evaluate_pnp(x3d, x2d, w2d, jnp.asarray(pose), camera, cost_fun,
                      out_cost=True)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ev.cost),
                               rtol=2e-3, atol=1e-2)
