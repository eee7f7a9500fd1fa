"""Fused DCN contraction kernel vs the jnp formulation (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epropnp_tpu.ops.pallas_dcn as pallas_dcn
from epropnp_tpu.ops.deform_conv import DeformConv


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_dcn, 'INTERPRET', True)


def make_input(seed, n=2, h=10, w=14, c=32, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(n, h, w, c)), dtype)
    return x


def init_with_random_offsets(module, x, seed=1):
    vs = module.init(jax.random.PRNGKey(0), x)
    r = np.random.default_rng(seed)
    # non-zero offsets (a few px, some sampling out of the map)
    vs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(r.normal(size=a.shape, scale=0.2), a.dtype),
        vs)
    return vs


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_fused_matches_jnp(dtype):
    x = make_input(0, dtype=dtype)
    m_ref = DeformConv(24, fused=False, dtype=dtype)
    m_fused = DeformConv(24, fused=True, dtype=dtype)
    vs = init_with_random_offsets(m_ref, x)
    ref = np.asarray(m_ref.apply(vs, x), np.float64)
    out = np.asarray(m_fused.apply(vs, x), np.float64)
    assert out.shape == ref.shape
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < tol


def test_fused_grad_matches_jnp():
    """custom_vjp backward (jnp reference) == autodiff of the jnp path."""
    x = make_input(2, n=1, h=8, w=9, c=16)
    m_ref = DeformConv(8, fused=False)
    m_fused = DeformConv(8, fused=True)
    vs = init_with_random_offsets(m_ref, x, seed=3)

    def loss(mod, vs, x):
        y = mod.apply(vs, x)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss, argnums=(1, 2))(m_ref, vs, x)
    g_fused = jax.grad(loss, argnums=(1, 2))(m_fused, vs, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_fused_ragged_block():
    """h*w not a multiple of the L-block: padding path."""
    x = make_input(4, n=1, h=5, w=13, c=8)
    m_ref = DeformConv(8, fused=False)
    m_fused = DeformConv(8, fused=True)
    vs = init_with_random_offsets(m_ref, x, seed=5)
    ref = np.asarray(m_ref.apply(vs, x))
    out = np.asarray(m_fused.apply(vs, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('length_pad', [0, 37])
def test_chunked_backward_matches_whole(monkeypatch, length_pad):
    """The L-chunked streaming backward (pallas_dcn._bwd_chunked) must
    match the whole-table jax.vjp backward; exercises both the exact-
    multiple and padded-final-chunk cases via the h/w choice."""
    h, w = (8, 16) if length_pad == 0 else (9, 13)
    x = make_input(5, n=1, h=h, w=w, c=16)
    m = DeformConv(8, fused=True)
    vs = init_with_random_offsets(m, x, seed=7)

    def loss(vs, x):
        y = m.apply(vs, x)
        return jnp.sum(jnp.cos(y))

    g_whole = jax.grad(loss, argnums=(0, 1))(vs, x)
    monkeypatch.setattr(pallas_dcn, 'BWD_CHUNK_ROWS', 32)
    g_chunk = jax.grad(loss, argnums=(0, 1))(vs, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_whole),
                    jax.tree_util.tree_leaves(g_chunk)):
        # chunked scatter/sum order reorders f32 accumulation; real
        # math errors show up orders of magnitude above this
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
