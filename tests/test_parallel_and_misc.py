"""parallel/ mesh helpers, config overrides, KITTI dataset parsing."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.parallel import (
    data_parallel_step, make_mesh, replicate, shard_batch)
from epropnp_tpu.utils.config_override import ScheduledOverrides, override
from epropnp_tpu.det.config import DetConfig
from epropnp_tpu.det.kitti_dataset import parse_label_file


def test_mesh_and_data_parallel_step():
    mesh = make_mesh()
    n = mesh.devices.size
    assert n >= 2

    def step(state, batch, rng):
        grad = jax.lax.pmean(jnp.mean(batch), 'data')
        return state + grad, {'m': grad}

    batch = jnp.arange(n * 4, dtype=jnp.float32)
    wrapped = data_parallel_step(step, mesh, batch)
    state = replicate(mesh, jnp.zeros(()))
    batch_s = shard_batch(mesh, batch)
    new_state, metrics = wrapped(state, batch_s, jax.random.PRNGKey(0))
    # pmean of per-shard means == global mean
    np.testing.assert_allclose(float(np.ravel(new_state)[0]),
                               float(jnp.mean(batch)), rtol=1e-6)


def test_config_override_dotted():
    cfg = DetConfig.basic()
    cfg2 = override(cfg, {'pnp.lm_num_iter': 5, 'train.lr': 1e-3})
    assert cfg2.pnp.lm_num_iter == 5 and cfg2.train.lr == 1e-3
    assert cfg.pnp.lm_num_iter == 10  # original untouched

    sched = ScheduledOverrides([(100, {'pnp.mc_samples': 128})])
    c, changed = sched.maybe_apply(cfg, 50)
    assert not changed and c.pnp.mc_samples == 512
    c, changed = sched.maybe_apply(cfg, 150)
    assert changed and c.pnp.mc_samples == 128
    # applied only once
    _, changed = sched.maybe_apply(cfg, 200)
    assert not changed


def test_kitti_label_parsing(tmp_path):
    label = ('Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 '
             '1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n'
             'DontCare -1 -1 -10 503.89 169.71 590.61 190.13 '
             '-1 -1 -1 -1000 -1000 -1000 -10\n')
    p = tmp_path / '000001.txt'
    p.write_text(label)
    ann = parse_label_file(str(p))
    assert list(ann['name']) == ['Car', 'DontCare']
    np.testing.assert_allclose(ann['dimensions'][0], [3.64, 1.65, 1.67])
    np.testing.assert_allclose(ann['location'][0], [-0.65, 1.71, 46.70])
    assert ann['bbox'].shape == (2, 4)
