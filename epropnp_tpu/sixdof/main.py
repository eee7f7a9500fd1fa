"""6DoF suite training/eval driver.

The TPU equivalent of the reference CLI entry (EPro-PnP-6DoF/tools/main.py:
44-106): build model + optimizer + state, per-epoch train loop (the LR step
decay lives inside the optax schedule), periodic checkpoint + eval. Data
parallelism is a 1-D device mesh with a shard_map'd train step.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.cdpn import CDPN
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import get_logger
from ..utils.meters import AverageMeter
from . import ref_constants as ref
from . import train as train_lib
from .config import SixDoFConfig


def build_all(cfg: SixDoFConfig, steps_per_epoch: int = 1,
              axis_name: Optional[str] = None, cam_intrinsic=None):
    """Model + PnP + optimizer + train step builder."""
    model = CDPN(depth=cfg.network.back_layers_num,
                 backbone_dtype=jnp.bfloat16
                 if cfg.network.bf16_backbone else None)
    epropnp = train_lib.build_epropnp(cfg)
    tx = train_lib.make_optimizer(cfg, steps_per_epoch)
    cam = jnp.asarray(
        ref.CAMERA_MATRIX if cam_intrinsic is None else cam_intrinsic,
        jnp.float32)
    step_fn = train_lib.make_train_step(model, epropnp, cfg, tx, cam,
                                        axis_name=axis_name)
    return model, epropnp, tx, step_fn


def init_state(cfg: SixDoFConfig, model, tx, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    img = jnp.zeros((1, cfg.dataiter.inp_res, cfg.dataiter.inp_res, 3),
                    jnp.float32)
    variables = model.init(rng, img, train=False)
    return train_lib.TrainState.create(variables, tx)


def make_sharded_step(step_fn, n_devices: Optional[int] = None):
    """Wrap the train step in a data-parallel shard_map over all devices.

    Returns ``(jitted_step, batch_sharding)`` — the sharding places host
    batches split along the leading axis for the prefetcher.
    """
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    mesh = Mesh(np.array(devices), ('data',))
    batch_spec = train_lib.Batch(*([P('data')] * len(train_lib.Batch._fields)))
    step = jax.jit(shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False))
    return step, NamedSharding(mesh, P('data'))


def train_loop(cfg: SixDoFConfig, dataset, save_dir: str,
               resume_from: Optional[str] = None,
               data_parallel: bool = False, log_interval: int = 20,
               test_interval: int = 5, seed: int = 0,
               prefetch: int = 2, ckpt_interval: int = 1):
    """Epoch loop over a ``LineMODDataset`` (or any Batch iterator factory).

    ``dataset.batches(batch_size, shuffle, seed)`` must yield Batch tuples.
    ``prefetch`` > 0 runs the host pipeline on a background thread and
    keeps that many batches resident on device ahead of the step
    (DataLoader-worker equivalent, see parallel/prefetch.py); 0 iterates
    synchronously.
    """
    logger = get_logger('epropnp_tpu.6dof', save_dir)
    n_batches = max(len(dataset) // cfg.train.train_batch_size, 1)
    model, _, tx, step_fn = build_all(
        cfg, steps_per_epoch=n_batches,
        axis_name='data' if data_parallel else None)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(seed))
    if cfg.load_model:
        if cfg.load_model.endswith(('.pth', '.pt', '.tar')):
            # released torch checkpoints (CDPN stage-1 / EPro-PnP 6DoF):
            # convert + graft (reference lib/model.py:79-105 filtered load)
            from ..utils.torch_convert import (
                cdpn_variables, load_torch_state_dict, merge_pretrained)
            conv = cdpn_variables(load_torch_state_dict(cfg.load_model),
                                  depth=cfg.network.back_layers_num)
            state = state.replace(
                params=merge_pretrained(state.params, conv['params']),
                batch_stats=merge_pretrained(state.batch_stats,
                                             conv['batch_stats']))
            logger.info('converted torch weights from %s', cfg.load_model)
        else:
            state = load_checkpoint(cfg.load_model, state,
                                    filter_fn=lambda k: k == 'params')
            logger.info('loaded params from %s', cfg.load_model)
    if resume_from:
        state = load_checkpoint(resume_from, state)
        logger.info('resumed full state from %s', resume_from)

    if data_parallel:
        step, batch_sharding = make_sharded_step(step_fn)
    else:
        step, batch_sharding = jax.jit(step_fn), None
    rng = jax.random.PRNGKey(seed + 1)

    for epoch in range(cfg.train.begin_epoch, cfg.train.end_epoch):
        meters = {}
        t0 = time.time()
        batches = dataset.batches(cfg.train.train_batch_size, shuffle=True,
                                  seed=seed + epoch)
        if prefetch > 0:
            from ..parallel.prefetch import (BackgroundIterator,
                                             prefetch_to_device)
            batches = prefetch_to_device(
                BackgroundIterator(batches, maxsize=prefetch + 1),
                depth=prefetch, sharding=batch_sharding)
        for i, batch in enumerate(batches):
            rng, k = jax.random.split(rng)
            state, metrics = step(state, batch, k)
            if i % log_interval == 0:
                m = jax.device_get(metrics)
                for name, v in m.items():
                    meters.setdefault(name, AverageMeter()).update(
                        float(np.ravel(v)[0]))
                logger.info(
                    'epoch %d iter %d/%d: %s (%.1fs)', epoch, i, n_batches,
                    ' '.join(f'{n}={mt.val:.4f}'
                             for n, mt in meters.items()),
                    time.time() - t0)
        if (epoch + 1) % ckpt_interval == 0 \
                or epoch + 1 == cfg.train.end_epoch:
            ckpt = os.path.join(save_dir, f'checkpoint_{epoch:03d}.msgpack')
            save_checkpoint(ckpt, state)
            save_checkpoint(os.path.join(save_dir, 'latest.msgpack'), state)
            logger.info('epoch %d done, checkpoint -> %s', epoch, ckpt)
        else:
            logger.info('epoch %d done', epoch)
    return state


def test_loop(cfg: SixDoFConfig, dataset, state, models, diameters,
              init: str = 'epnp', batch_size: int = 32, log_interval=20,
              cache_file: Optional[str] = None,
              orient_density_dir: Optional[str] = None):
    """Evaluate a trained state on a test split (reference lib/test.py).

    Args:
        dataset: yields test batches via ``batches(batch_size, ...)`` plus
            per-batch class names in ``batch.dim`` order is not tracked, so
            this driver expects homogeneous-class batches or per-sample
            iteration (default LineMODDataset ordering groups by class).
        models: {class_name: (n, 3) model points}; diameters likewise.
        cache_file: optional .npz path; if it exists, predictions are
            loaded and inference is skipped entirely, otherwise they are
            saved after the loop (reference lib/test.py:44-74).
        orient_density_dir: if set, render the SO(3) orientation-density
            sphere for every sample into this directory (reference
            lib/test.py:218-225).

    Returns the metric dicts from :class:`eval_metrics.PoseEvaluator`.
    """
    from . import ref_constants as ref
    from . import test as test_lib
    from .eval_metrics import PoseEvaluator

    logger = get_logger('epropnp_tpu.6dof')
    model = CDPN(depth=cfg.network.back_layers_num,
                 backbone_dtype=jnp.bfloat16
                 if cfg.network.bf16_backbone else None)
    evaluator = PoseEvaluator(list(models), models, diameters,
                              cam_k=np.asarray(ref.CAMERA_MATRIX))
    cam = jnp.asarray(ref.CAMERA_MATRIX, jnp.float32)

    def _metrics():
        return dict(pose=evaluator.evaluate_pose(),
                    add=evaluator.evaluate_pose_add(),
                    arp_2d=evaluator.evaluate_pose_arp_2d())

    if cache_file and os.path.exists(cache_file):
        data = np.load(cache_file)
        logger.info('loaded %d cached predictions from %s',
                    len(data['obj']), cache_file)
        for k in range(len(data['obj'])):
            evaluator.update(str(data['obj'][k]), data['pose_est'][k],
                             data['pose_gt'][k])
        return _metrics()
    refine_fn = test_lib.make_refine_fn(cfg, cam)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    # variables as an ARGUMENT: closed-over weights would be baked into
    # the compiled program as constants (~45 MB of HLO for a ResNet),
    # which bloats compiles and overflows the remote-compile transport
    @jax.jit
    def forward(variables, inp):
        return model.apply(variables, inp, train=False)
    forward = functools.partial(forward, variables)

    extents = {c: dataset.min_extents(c) for c in dataset.classes}
    n = len(dataset)
    cache = {'obj': [], 'pose_est': [], 'pose_gt': []}
    if orient_density_dir:
        os.makedirs(orient_density_dir, exist_ok=True)
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        samples = [dataset[i] for i in idx]
        from .dataset import collate
        batch = collate(samples, extents)
        outs = forward(batch.inp)
        box_wh = jnp.asarray(
            np.stack([s.box[2:] for s in samples]), jnp.float32)
        res = test_lib.infer_poses(outs, batch, box_wh, cam, cfg,
                                   refine_fn=refine_fn, init=init)
        pose_est = np.asarray(res.pose_est)
        for k, s in enumerate(samples):
            evaluator.update(s.obj, pose_est[k], np.asarray(s.pose))
            cache['obj'].append(s.obj)
            cache['pose_est'].append(pose_est[k])
            cache['pose_gt'].append(np.asarray(s.pose))
        if orient_density_dir:
            imgs = test_lib.orient_density_images(outs, batch, cam, cfg)
            import cv2
            for k, img in enumerate(imgs):
                cv2.imwrite(os.path.join(
                    orient_density_dir,
                    f'{samples[k].obj}_{start + k:06d}.png'), img)
        if (start // batch_size) % log_interval == 0:
            logger.info('eval %d/%d', start + len(samples), n)
    if cache_file:
        np.savez_compressed(
            cache_file, obj=np.asarray(cache['obj']),
            pose_est=np.stack(cache['pose_est']),
            pose_gt=np.stack(cache['pose_gt']))
        logger.info('cached %d predictions -> %s', n, cache_file)
    return _metrics()
