"""Det suite data-parallel training step over the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.det import train as dtrain
from epropnp_tpu.parallel import data_parallel_step, make_mesh, shard_batch
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
