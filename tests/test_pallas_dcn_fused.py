"""Parity of the fully-fused DCN gather kernel vs the production path.

Runs both variants (per-row DMA / VMEM-resident table) in interpret mode
on CPU against ops/pallas_dcn._ref_contract (the formulation the
production custom_vjp differentiates) and against DeformConv's jnp path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epropnp_tpu.ops.bilinear_sample import (
    corner_rows_and_weights, pack_patches)
from epropnp_tpu.ops.pallas_dcn import _ref_contract
from epropnp_tpu.ops.pallas_dcn_fused import dcn_fused_forward


def _make_problem(seed=0, taps=9, length=300, c=32, cout=24, dtype=np.float32):
    r = np.random.default_rng(seed)
    n_rows = 17 * 23
    packed = r.normal(size=(n_rows, 4 * c)).astype(dtype)
    rows = r.integers(0, n_rows, size=(taps, length)).astype(np.int32)
    w4 = r.uniform(0, 1, size=(taps, length, 4)).astype(np.float32)
    kern = r.normal(size=(taps, c, cout)).astype(dtype) * 0.1
    return (jnp.asarray(packed), jnp.asarray(rows), jnp.asarray(w4),
            jnp.asarray(kern))


@pytest.mark.parametrize('table_in_vmem', [False, True])
def test_fused_matches_reference(table_in_vmem):
    packed, rows, w4, kern = _make_problem()
    ref = _ref_contract(packed, rows, w4, kern)
    got = dcn_fused_forward(packed, rows, w4, kern, block_l=64,
                            table_in_vmem=table_in_vmem, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('table_in_vmem', [False, True])
def test_fused_ragged_length(table_in_vmem):
    # length not a multiple of block_l exercises the pad/crop path
    packed, rows, w4, kern = _make_problem(seed=1, length=137)
    ref = _ref_contract(packed, rows, w4, kern)
    got = dcn_fused_forward(packed, rows, w4, kern, block_l=32,
                            table_in_vmem=table_in_vmem, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_deform_conv_geometry():
    """End-to-end vs the DeformConv jnp sampling on a real conv geometry."""
    from epropnp_tpu.ops.bilinear_sample import bilinear_sample_packed
    r = np.random.default_rng(2)
    h, w, c, cout, taps = 11, 13, 16, 8, 9
    feat = jnp.asarray(r.normal(size=(h, w, c)), jnp.float32)
    # random small offsets around the 3x3 tap grid
    base = np.stack(np.meshgrid(np.arange(-1, 2), np.arange(-1, 2),
                                indexing='ij'), -1)[..., ::-1].reshape(9, 2)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    grid = np.stack([xx, yy], -1).astype(np.float32)
    coords = (grid[:, :, None, :] + base
              + r.normal(scale=0.7, size=(h, w, 9, 2))).astype(np.float32)
    coords = jnp.asarray(coords)
    kern = jnp.asarray(r.normal(size=(taps, c, cout)), jnp.float32) * 0.1

    sampled = bilinear_sample_packed(feat, coords, 'zeros')  # (h, w, 9, c)
    ref = jnp.einsum('hwtc,tco->hwo', sampled, kern).reshape(-1, cout)

    packed = pack_patches(feat)
    rows, w4 = corner_rows_and_weights(coords, (h, w), 'zeros')
    rows = rows.reshape(h * w, taps).T
    w4 = w4.reshape(h * w, taps, 4).swapaxes(0, 1)
    got = dcn_fused_forward(packed.reshape(-1, 4 * c), rows, w4, kern,
                            block_l=32, table_in_vmem=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
