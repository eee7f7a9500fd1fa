"""Checkpoint round trip + full 6DoF train_loop smoke with a stub dataset."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.sixdof import main as main_lib
from epropnp_tpu.sixdof import train as train_lib
from epropnp_tpu.sixdof.config import (
    DataIterConfig, PnPConfig, SixDoFConfig, TrainConfig)
from epropnp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

from test_sixdof_train import make_batch, tiny_cfg


class StubDataset:
    """Synthetic in-memory dataset exposing the batches() protocol."""

    def __init__(self, n=8, inp_res=64, out_res=16):
        self.n = n
        self.inp_res = inp_res
        self.out_res = out_res

    def __len__(self):
        return self.n

    def batches(self, batch_size, shuffle=True, seed=0):
        for i in range(self.n // batch_size):
            yield make_batch(seed * 100 + i, bs=batch_size,
                             inp_res=self.inp_res, out_res=self.out_res)


def test_checkpoint_roundtrip_and_partial_load(tmp_path):
    cfg = tiny_cfg()
    model, _, tx, _ = main_lib.build_all(cfg)
    state = main_lib.init_state(cfg, model, tx)
    path = str(tmp_path / 'ck.msgpack')
    save_checkpoint(path, state)

    # full restore into a freshly initialized state
    state2 = main_lib.init_state(cfg, model, tx, jax.random.PRNGKey(7))
    restored = load_checkpoint(path, state2)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # params-only restore keeps the target's step
    bumped = state2.replace(step=jnp.asarray(5, jnp.int32))
    partial = load_checkpoint(path, bumped, filter_fn=lambda k: k == 'params')
    assert int(partial.step) == 5
    pb = jax.tree_util.tree_leaves(partial.params)
    assert all(np.array_equal(x, y) for x, y in zip(a, pb))


def test_train_loop_smoke(tmp_path):
    import dataclasses
    cfg = dataclasses.replace(
        tiny_cfg(), train=TrainConfig(end_epoch=1, train_batch_size=2,
                                      lr_epoch_step=()))
    ds = StubDataset(n=4)
    state = main_lib.train_loop(cfg, ds, str(tmp_path), log_interval=1)
    assert int(state.step) == 2
    assert (tmp_path / 'latest.msgpack').exists()
