"""6DoF suite: CDPN forward + functional train step smoke/shape tests.

Runs a miniature CDPN (ResNet-18, 64x64 crops) through the full training
recipe — correspondence construction, AMIS Monte Carlo PnP, all five losses,
RMSprop update with NaN skip — mirroring reference lib/train.py:136-243.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.models.cdpn import CDPN
from epropnp_tpu.sixdof.config import (
    DataIterConfig, PnPConfig, SixDoFConfig, TrainConfig)
from epropnp_tpu.sixdof import train as train_lib

K = jnp.asarray([[572.4114, 0., 325.2611],
                 [0., 573.57043, 242.04899],
                 [0., 0., 1.]])


def tiny_cfg():
    return SixDoFConfig(
        dataiter=DataIterConfig(inp_res=64, out_res=16, sample_points=32),
        pnp=PnPConfig(mc_samples=32, num_iter=2, lm_num_iter=2,
                      rs_num_points=8, rs_num_proposals=2, rs_num_iter=1),
        train=TrainConfig(lr_epoch_step=()))


def make_batch(rng, bs=2, inp_res=64, out_res=16):
    r = np.random.default_rng(rng)
    # GT pose with positive z; rotation from a random quaternion
    from epropnp_tpu.ops.rotation_conversions import (
        quaternion_to_matrix, random_quaternions)
    quat = random_quaternions(jax.random.PRNGKey(rng), bs)
    rot = quaternion_to_matrix(quat)
    t = jnp.asarray(r.uniform([-.1, -.1, .5], [.1, .1, 1.0], (bs, 3)),
                    jnp.float32)
    pose = jnp.concatenate([rot, t[..., None]], axis=-1)
    return train_lib.Batch(
        inp=jnp.asarray(r.normal(size=(bs, inp_res, inp_res, 3)),
                        jnp.float32),
        target_coor=jnp.asarray(
            r.uniform(-.5, .5, (bs, out_res, out_res, 3)), jnp.float32),
        loss_msk=jnp.ones((bs, out_res, out_res, 3), jnp.float32),
        trans_local=jnp.asarray(r.normal(size=(bs, 3)), jnp.float32),
        pose=pose,
        c_box=jnp.asarray(r.uniform(200, 400, (bs, 2)), jnp.float32),
        s_box=jnp.asarray(r.uniform(100, 200, (bs,)), jnp.float32),
        dim=jnp.asarray(r.uniform(.05, .15, (bs, 3)), jnp.float32),
    )


def test_cdpn_forward_shapes():
    model = CDPN(depth=18)
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    outs = model.apply(variables, img, train=False)
    assert outs.noc.shape == (2, 16, 16, 3)
    assert outs.w2d.shape == (2, 16, 16, 2)
    assert outs.scale.shape == (2, 2)
    assert outs.trans.shape == (2, 3)


def test_train_step_runs_and_updates():
    cfg = tiny_cfg()
    model = CDPN(depth=18)
    epropnp = train_lib.build_epropnp(cfg)
    batch = make_batch(0, bs=2, inp_res=64, out_res=16)
    variables = model.init(jax.random.PRNGKey(0), batch.inp, train=False)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.TrainState.create(variables, tx)
    step_fn = jax.jit(train_lib.make_train_step(model, epropnp, cfg, tx, K))

    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), (k, v)
    assert new_state.step == 1
    moved = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.any(a != b)), state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(moved))
    # EMA norm factor moved toward the scale mean
    assert new_state.mc_state.norm_factor != state.mc_state.norm_factor


def test_train_step_multi_device_pmean():
    """Data-parallel train step over the 8-device CPU mesh via shard_map."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    n_dev = jax.device_count()
    assert n_dev >= 2
    cfg = tiny_cfg()
    model = CDPN(depth=18)
    epropnp = train_lib.build_epropnp(cfg)
    batch = make_batch(0, bs=2 * n_dev, inp_res=64, out_res=16)
    variables = model.init(jax.random.PRNGKey(0), batch.inp[:2], train=False)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.TrainState.create(variables, tx)
    step_fn = train_lib.make_train_step(model, epropnp, cfg, tx, K,
                                        axis_name='data')

    mesh = Mesh(np.array(jax.devices()), ('data',))
    batch_spec = jax.tree_util.tree_map(lambda _: P('data'), batch)

    def wrapped(state, batch, rng):
        return step_fn(state, batch, rng)

    sharded = jax.jit(shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False))
    new_state, metrics = sharded(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics['loss']))
    # replicated outputs are identical across devices after pmean
    moved = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.any(a != b)), state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(moved))


def test_out_res_mismatch_raises_clear_error():
    """A cfg/batch resolution mismatch fails fast with a named assert
    (was: an opaque reshape error deep inside the train step)."""
    import pytest
    from epropnp_tpu.sixdof.train import build_correspondences
    batch = make_batch(0, bs=2, inp_res=64, out_res=16)
    noc = jnp.zeros((2, 16, 16, 3))
    w2d = jnp.zeros((2, 16, 16, 2))
    scale = jnp.ones((2, 2))
    cam = jnp.eye(3)
    with pytest.raises(AssertionError, match='out_res'):
        build_correspondences(noc, w2d, scale, batch, cam, out_res=64)


def test_optimizer_grad_clipping_bounds_spikes():
    """clip_grad_norm keeps a huge-but-finite MC-loss spike from
    poisoning the RMSprop second-moment state (config.py clip_grad_norm)."""
    import optax
    base = tiny_cfg()
    cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, clip_grad_norm=1.0))
    tx = train_lib.make_optimizer(cfg)
    params = {'backbone': jnp.ones(4), 'rot_head': jnp.ones(4),
              'trans_head': jnp.ones(4)}
    st = tx.init(params)
    huge = jax.tree_util.tree_map(lambda a: a * 1e8, params)
    upd, st2 = tx.update(huge, st, params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree_util.tree_leaves(upd))
    # a second, normal-sized gradient still produces a sane update
    small = jax.tree_util.tree_map(lambda a: a * 1e-3, params)
    upd2, _ = tx.update(small, st2, params)
    assert float(optax.global_norm(upd2)) > 1e-8


def test_train_step_remat_matches_plain():
    """NetworkConfig.remat (jax.checkpoint over the CDPN forward) is a
    pure memory/compute trade: metrics and updated params match the
    plain step at f32 tolerance."""
    base = tiny_cfg()
    model = CDPN(depth=18)
    epropnp = train_lib.build_epropnp(base)
    batch = make_batch(0, bs=2, inp_res=64, out_res=16)
    variables = model.init(jax.random.PRNGKey(0), batch.inp, train=False)
    tx = train_lib.make_optimizer(base)
    state = train_lib.TrainState.create(variables, tx)

    outs = {}
    for name, cfg in (
            ('plain', base),
            ('remat', dataclasses.replace(
                base, network=dataclasses.replace(base.network,
                                                  remat=True)))):
        step_fn = jax.jit(
            train_lib.make_train_step(model, epropnp, cfg, tx, K))
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        outs[name] = (jax.device_get(metrics),
                      jax.device_get(new_state.params))
    for k, a in outs['plain'][0].items():
        # grad_norm wobbles at f32 lsb scale under checkpoint recompute
        rtol = 1e-2 if 'grad_norm' in k else 1e-5
        np.testing.assert_allclose(a, outs['remat'][0][k], rtol=rtol,
                                   atol=1e-6, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
        outs['plain'][1], outs['remat'][1])
