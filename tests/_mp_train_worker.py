"""Worker process for the REAL multi-process data-parallel training test.

Each worker is a separate OS process that joins a ``jax.distributed``
cluster (Gloo collectives on CPU — the DCN analogue in this image),
loads ONLY its own ``HostShardSampler`` slice of a deterministic
synthetic dataset, assembles the global batch with
``jax.make_array_from_process_local_data``, and runs the real 6DoF
training step (network forward, AMIS Monte Carlo PnP, all losses,
RMSprop update) over a mesh spanning both processes.

This is the multi-host counterpart of the reference's
``torch.distributed.launch`` + ``DistributedSampler`` + DDP stack
(SURVEY.md §2.4; /root/reference/EPro-PnP-Det/train.py:56-84) — here
gradients/EMA buffers sync via ``lax.pmean`` over the global mesh axis
instead of NCCL all-reduce.

Module-level helpers are imported by the parent test to reproduce the
equivalent single-process global batch; the distributed runtime only
starts under ``__main__``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
TESTS_DIR = os.path.join(REPO_ROOT, 'tests')
if TESTS_DIR not in sys.path:
    sys.path.insert(0, TESTS_DIR)

GLOBAL_SAMPLES = 8
INP_RES, OUT_RES = 64, 16


def make_config():
    from epropnp_tpu.sixdof.config import (
        DataIterConfig, PnPConfig, SixDoFConfig, TrainConfig)
    return SixDoFConfig(
        dataiter=DataIterConfig(inp_res=INP_RES, out_res=OUT_RES,
                                sample_points=32),
        pnp=PnPConfig(mc_samples=32, num_iter=2, lm_num_iter=2,
                      rs_num_points=8, rs_num_proposals=2, rs_num_iter=1),
        train=TrainConfig(lr_epoch_step=()))


def make_global_dataset(seed: int = 0):
    """Deterministic synthetic dataset of GLOBAL_SAMPLES training samples.

    Returns a Batch of numpy arrays with leading axis GLOBAL_SAMPLES;
    every process builds the identical array and then slices its own
    sampler indices — modelling per-host loading of disjoint shards.
    """
    from epropnp_tpu.sixdof.train import Batch
    bs = GLOBAL_SAMPLES
    r = np.random.default_rng(seed)
    quat = r.normal(size=(bs, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = quat.T
    rot = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(bs, 3, 3)
    t = np.concatenate([r.uniform(-0.1, 0.1, (bs, 2)),
                        r.uniform(0.5, 1.0, (bs, 1))], axis=-1)
    return Batch(
        inp=r.normal(size=(bs, INP_RES, INP_RES, 3)).astype(np.float32),
        target_coor=r.uniform(-.5, .5, (bs, OUT_RES, OUT_RES, 3))
        .astype(np.float32),
        loss_msk=np.ones((bs, OUT_RES, OUT_RES, 3), np.float32),
        trans_local=r.normal(size=(bs, 3)).astype(np.float32),
        pose=np.concatenate([rot, t[..., None]], axis=-1).astype(np.float32),
        c_box=r.uniform(200, 400, (bs, 2)).astype(np.float32),
        s_box=r.uniform(100, 200, (bs,)).astype(np.float32),
        dim=r.uniform(.05, .15, (bs, 3)).astype(np.float32),
    )


def host_indices(num_hosts: int, host_id: int, epoch: int = 0):
    """This host's HostShardSampler slice of the global dataset."""
    from epropnp_tpu.parallel.sampler import HostShardSampler
    sampler = HostShardSampler(num_samples=GLOBAL_SAMPLES,
                               num_hosts=num_hosts, host_id=host_id,
                               shuffle=True, seed=0)
    return sampler.epoch_indices(epoch)


def global_order(num_hosts: int, epoch: int = 0):
    """Global batch row order as assembled over the process-major mesh."""
    return np.concatenate([host_indices(num_hosts, h, epoch)
                           for h in range(num_hosts)])


CAM_K = np.asarray(
    [[572.4114, 0., 325.2611], [0., 573.57043, 242.04899], [0., 0., 1.]],
    np.float32)


def run_step_on_mesh(mesh, batch_np, axis_name='data', multiprocess=False):
    """Build model/state and run ONE jitted data-parallel train step.

    Returns (loss, param_digest) as python floats; outputs are
    replicated across the mesh so every process sees the same values.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from epropnp_tpu.models.cdpn import CDPN
    from epropnp_tpu.sixdof import train as train_lib

    cfg = make_config()
    model = CDPN(depth=18)
    epropnp = train_lib.build_epropnp(cfg)
    n_local = 2
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((n_local, INP_RES, INP_RES, 3),
                                     jnp.float32), train=False)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.TrainState.create(variables, tx)
    step_fn = train_lib.make_train_step(model, epropnp, cfg, tx,
                                        jnp.asarray(CAM_K),
                                        axis_name=axis_name)

    batch_spec = jax.tree_util.tree_map(
        lambda _: P(axis_name), type(batch_np)(*batch_np))
    if multiprocess:
        sharding = NamedSharding(mesh, P(axis_name))
        batch = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch_np)
    else:
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    def step_with_synced_metrics(state, batch, key):
        # step_fn reports the local-shard loss (grads/EMA are pmean'd,
        # metrics are per-replica like DDP's per-rank logging); pmean the
        # metrics here so the P() out_spec really is replicated and every
        # process observes the same value.
        new_state, metrics = step_fn(state, batch, key)
        return new_state, jax.lax.pmean(metrics, axis_name)

    sharded_step = jax.jit(shard_map(
        step_with_synced_metrics, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False))
    new_state, metrics = sharded_step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_state)
    loss = float(np.asarray(jax.device_get(metrics['loss'])).ravel()[0])
    digest = float(sum(
        np.abs(np.asarray(jax.device_get(leaf), np.float64)).sum()
        for leaf in jax.tree_util.tree_leaves(
            (new_state.params, new_state.batch_stats))))
    parts = {k: float(np.asarray(jax.device_get(v), np.float64).ravel()[0])
             for k, v in metrics.items()}
    return loss, digest, parts


def make_det_global_dataset(seed: int = 0):
    """Deterministic synthetic Det dataset of GLOBAL_SAMPLES images.

    Reuses the tiny-Det fixture from test_det_train (two valid GT boxes
    per image, lidar OC points, dense x2d maps) converted to numpy so it
    can feed ``jax.make_array_from_process_local_data``.
    """
    import test_det_train as det_fix
    batch = det_fix.make_batch(seed=seed, n_img=GLOBAL_SAMPLES)
    return type(batch)(*[np.asarray(a) for a in batch])


def make_det_config():
    """Minimal Det config for the cross-process step (CPU-compile-friendly).

    The tiny_cfg fixture compiles in ~8 min on CPU; shrinking the AMIS /
    LM / sampling sizes keeps the same code paths while fitting the test
    budget.
    """
    import dataclasses
    import test_det_train as det_fix
    from epropnp_tpu.det.config import DetPnPConfig, DetTrainConfig
    cfg = det_fix.tiny_cfg()
    return dataclasses.replace(
        cfg,
        num_points=2,
        pnp=DetPnPConfig(mc_samples=8, num_iter=1, lm_num_iter=1,
                         rs_num_points=4, rs_num_proposals=2, rs_num_iter=1),
        train=DetTrainConfig(num_obj_samples_per_img=2, roi_shape=(4, 4),
                             max_gt_per_img=det_fix.GMAX))


def run_det_step_on_mesh(mesh, batch_np, axis_name='data',
                         multiprocess=False):
    """Det-suite analogue of run_step_on_mesh: ONE jitted DP train step.

    Exercises the full DeformPnPHead training path (FCOS losses, AMIS
    Monte Carlo pose loss, cross-RoI projection NLL, EMA pmean sync)
    over the cross-process mesh — the reference's MMDistributedDataParallel
    step (/root/reference/EPro-PnP-Det/train.py:56-84).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    import test_det_train as det_fix
    from epropnp_tpu.det import train as dtrain

    cfg = make_det_config()
    model = det_fix.tiny_model(cfg)
    # jit the init: eager op-by-op init of the full detector takes ~6 min
    # on CPU, jitted it is seconds.
    variables = jax.jit(
        lambda k, x: model.init(k, x, (det_fix.H, det_fix.W)))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, det_fix.H, det_fix.W, 3), jnp.float32))
    tx = dtrain.make_optimizer(cfg)
    state = dtrain.DetTrainState.create(variables, tx)
    step_fn = dtrain.make_train_step(model, cfg, tx, axis_name=axis_name)

    batch_spec = jax.tree_util.tree_map(
        lambda _: P(axis_name), type(batch_np)(*batch_np))
    if multiprocess:
        sharding = NamedSharding(mesh, P(axis_name))
        batch = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch_np)
    else:
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    def step_with_synced_metrics(state, batch, key):
        new_state, losses = step_fn(state, batch, key)
        return new_state, jax.lax.pmean(losses, axis_name)

    sharded_step = jax.jit(shard_map(
        step_with_synced_metrics, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False))
    new_state, losses = sharded_step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_state)
    parts = {k: float(np.asarray(jax.device_get(v), np.float64).ravel()[0])
             for k, v in losses.items()}
    loss = float(sum(v for k, v in parts.items() if k != 'grad_norm'))
    digest = float(sum(
        np.abs(np.asarray(jax.device_get(leaf), np.float64)).sum()
        for leaf in jax.tree_util.tree_leaves(
            (new_state.params, new_state.batch_stats, new_state.ema))))
    return loss, digest, parts


def worker_main():
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]
    suite = sys.argv[5] if len(sys.argv) > 5 else 'sixdof'

    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=2').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    # match tests/conftest.py: the parent's single-process comparison runs
    # with x64 enabled; weak-typed promotions inside the det AMIS sampling
    # diverge ~0.6% between f32 and f64 otherwise
    jax.config.update('jax_enable_x64', True)
    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{port}',
        num_processes=nprocs, process_id=proc_id)
    from jax.sharding import Mesh

    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nprocs

    idx = host_indices(nprocs, proc_id)
    make_ds = (make_det_global_dataset if suite == 'det'
               else make_global_dataset)
    run_fn = run_det_step_on_mesh if suite == 'det' else run_step_on_mesh
    ds = make_ds()
    local_batch = type(ds)(*[a[idx] for a in ds])

    mesh = Mesh(np.array(jax.devices()), ('data',))
    loss, digest, parts = run_fn(mesh, local_batch, multiprocess=True)

    with open(os.path.join(outdir, f'out_{proc_id}.json'), 'w') as f:
        json.dump({'proc': proc_id, 'indices': [int(i) for i in idx],
                   'loss': loss, 'digest': digest, 'parts': parts}, f)
    print(f'worker {proc_id}: loss={loss:.6f} digest={digest:.6f}',
          flush=True)


if __name__ == '__main__':
    worker_main()
