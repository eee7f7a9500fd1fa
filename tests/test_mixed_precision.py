"""bf16-backbone / f32-head mixed precision: finite outputs, f32 heads,
and agreement with the full-f32 forward at bf16 tolerance.

Reference models are f32/fp16-AMP torch; the TPU-native recipe instead
keeps params f32 and runs backbone (and FPN for the detector) compute in
bfloat16 (`backbone_dtype=jnp.bfloat16`), the natural TPU mixed-precision
mode (MXU-native, no loss scaling needed thanks to f32 accumulation).
"""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.models.cdpn import CDPN


def test_cdpn_bf16_backbone_matches_f32():
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    m32 = CDPN(depth=18)
    mbf = CDPN(depth=18, backbone_dtype=jnp.bfloat16)
    v = m32.init(rng, img, train=False)
    # same params usable by both (param_dtype stays f32)
    o32 = m32.apply(v, img, train=False)
    obf = mbf.apply(v, img, train=False)
    for a, b in zip(o32, obf):
        assert b.dtype == jnp.float32  # heads stay f32
        assert np.isfinite(np.asarray(b)).all()
        # bf16 has ~3 decimal digits; outputs pass through many convs
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        scale = np.abs(np.asarray(a)).max() + 1e-6
        assert err / scale < 0.15, (err, scale)


def test_det_bf16_backbone_finite():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_det_train import tiny_cfg, tiny_model, H, W

    cfg = tiny_cfg()
    model = tiny_model(cfg).clone(backbone_dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 3))
    variables = model.init(jax.random.PRNGKey(1), img, (H, W))
    det_outs, key, value = model.apply(variables, img, (H, W), train=False)
    assert key.dtype == jnp.float32 and value.dtype == jnp.float32
    assert np.isfinite(np.asarray(key)).all()
    assert np.isfinite(np.asarray(value)).all()
    for lvl in jax.tree_util.tree_leaves(det_outs):
        assert np.isfinite(np.asarray(lvl)).all()


def test_det_bf16_dense_matches_f32():
    """dense_dtype=bf16 (FCOS towers + key/value convs in bf16): outputs
    stay f32, share f32 params, and agree with the all-f32 forward at
    bf16 tolerance."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_det_train import tiny_cfg, tiny_model, H, W

    cfg = tiny_cfg()
    m32 = tiny_model(cfg)
    mbf = m32.clone(dense_dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 3))
    variables = m32.init(jax.random.PRNGKey(1), img, (H, W))
    out32 = m32.apply(variables, img, (H, W), train=False)
    outbf = mbf.apply(variables, img, (H, W), train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out32),
                    jax.tree_util.tree_leaves(outbf)):
        assert b.dtype == a.dtype  # boundary casts restore f32
        err = np.abs(np.asarray(a, np.float64)
                     - np.asarray(b, np.float64)).max()
        scale = np.abs(np.asarray(a)).max() + 1e-6
        assert err / scale < 0.15, (err, scale)
