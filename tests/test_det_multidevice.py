"""Det suite data-parallel training step over the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.det import train as dtrain
from epropnp_tpu.parallel import (data_parallel_infer, data_parallel_step,
                                  make_mesh, replicate, shard_batch)
from test_det_train import tiny_cfg, tiny_model, make_batch, H, W


def test_det_train_step_data_parallel():
    n_dev = jax.device_count()
    assert n_dev >= 2
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = make_batch(0, n_img=n_dev)  # one image per device
    variables = model.init(jax.random.PRNGKey(0), batch.img[:1], (H, W))
    tx = dtrain.make_optimizer(cfg)
    state = dtrain.DetTrainState.create(variables, tx)
    step_fn = dtrain.make_train_step(model, cfg, tx, axis_name='data')

    mesh = make_mesh()
    wrapped = data_parallel_step(step_fn, mesh, batch)
    new_state, losses = wrapped(state, shard_batch(mesh, batch),
                                jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.all(np.isfinite(np.asarray(v))), (k, v)
    moved = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.any(np.asarray(a) != np.asarray(b))),
        state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(moved))
    # EMA buffers synced across replicas -> replicated values identical
    nf = np.asarray(new_state.ema.pose_norm_factor[0].norm_factor)
    assert np.allclose(nf, nf.ravel()[0])


def test_det_inference_data_parallel_matches_single():
    """Sharded serving == single-device serving, image for image."""
    from epropnp_tpu.det.test import make_inference_fn
    n_dev = jax.device_count()
    assert n_dev >= 2
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = make_batch(3, n_img=n_dev)
    variables = model.init(jax.random.PRNGKey(0), batch.img[:1], (H, W))
    infer = make_inference_fn(model, cfg, max_obj_per_img=8,
                              min_fcos_score=0.0)
    args = (batch.img, batch.cam_intrinsic, batch.img_shapes,
            batch.ori_shapes, batch.img_flips, batch.img_dense_x2d,
            batch.img_dense_x2d_mask)
    rng = jax.random.PRNGKey(7)

    # the exact reference for a sharded run is one bs=1 run per image
    # with the SAME (replicated) rng: the solver's random init keys are
    # drawn per LOCAL object index, so a bs=8 single-device run would
    # legitimately draw different inits than eight bs=1 shards
    single = jax.jit(infer)
    per_img = [single(variables,
                      *(a[i:i + 1] for a in args), rng)
               for i in range(n_dev)]
    ref = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *per_img)

    mesh = make_mesh()
    wrapped = data_parallel_infer(infer, mesh)
    got = wrapped(replicate(mesh, variables),
                  *shard_batch(mesh, args), rng)
    rv = np.asarray(ref.valid)
    for name in ref._fields:
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        assert r.shape == g.shape, name
        if r.dtype == bool:
            np.testing.assert_array_equal(g, r, err_msg=name)
        else:
            np.testing.assert_allclose(g[rv], r[rv], rtol=1e-4,
                                       atol=1e-4, err_msg=name)
