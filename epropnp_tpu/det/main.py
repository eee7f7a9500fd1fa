"""Det-suite training driver (epoch loop + checkpointing + data parallel).

The counterpart of the reference ``tools/train.py`` + mmdet runner
(EPro-PnP-Det/tools/train.py:89-191): builds the detector, optimizer and
functional train step, iterates batches, checkpoints per epoch, and shards
the image batch over a 1-D device mesh when requested.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import get_logger
from .api import build_detector
from .config import DetConfig
from . import train as dtrain


def init_state(cfg: DetConfig, model, tx, img_hw, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    img = jnp.zeros((1,) + tuple(img_hw) + (3,), jnp.float32)
    variables = model.init(rng, img, tuple(img_hw))
    return dtrain.DetTrainState.create(variables, tx)


def make_sharded_step(step_fn, n_devices: Optional[int] = None):
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    mesh = Mesh(np.array(devices), ('data',))
    batch_spec = dtrain.DetBatch(
        *([P('data')] * len(dtrain.DetBatch._fields)))
    step = jax.jit(shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False))
    return step, NamedSharding(mesh, P('data'))


def train_loop(cfg: DetConfig, batch_iter_factory, steps_per_epoch: int,
               save_dir: str, img_hw=(672, 1600),
               resume_from: Optional[str] = None,
               data_parallel: bool = False, log_interval: int = 50,
               seed: int = 0, prefetch: int = 2, ckpt_interval: int = 1,
               eval_fn=None, eval_interval: int = 1,
               load_torch: Optional[str] = None):
    """``batch_iter_factory(epoch) -> iterator of DetBatch``.

    ``prefetch`` > 0 advances the factory's iterator on a background
    thread and keeps that many batches on device ahead of the step
    (parallel/prefetch.py); 0 iterates synchronously. ``ckpt_interval``
    saves every N epochs (+ the final one) — serializing the state is
    expensive on thin hosts.

    ``eval_fn(state, epoch) -> dict`` runs every ``eval_interval`` epochs
    after checkpointing and its metrics are logged — the reference
    evaluates NDS each epoch (configs/epropnp_det_basic.py:223-225
    ``evaluation = dict(interval=1, metric='NDS')``).

    Default ``img_hw`` is the reference input geometry: 1600x900 frames
    sky-cropped to 1600x672 by ``Crop3D`` (crop_box=(0, 228, 1600, 900),
    basic.py:173,190).

    ``load_torch`` grafts a converted torch checkpoint (torchvision
    ImageNet backbone / mmdet backbone+neck / full released Det model)
    onto the fresh init before training — the reference starts from
    ``init_cfg=Pretrained torchvision://resnet101``
    (configs/epropnp_det_basic.py:18).
    """
    logger = get_logger('epropnp_tpu.det', save_dir)
    model = build_detector(cfg)
    tx = dtrain.make_optimizer(cfg, steps_per_epoch)
    rng0 = jax.random.PRNGKey(seed)
    if load_torch:
        from .api import load_torch_variables
        img = jnp.zeros((1,) + tuple(img_hw) + (3,), jnp.float32)
        variables = dict(model.init(rng0, img, tuple(img_hw)))
        variables = load_torch_variables(cfg, variables, load_torch)
        state = dtrain.DetTrainState.create(variables, tx)
        logger.info('grafted torch weights from %s', load_torch)
    else:
        state = init_state(cfg, model, tx, img_hw, rng0)
    if resume_from:
        state = load_checkpoint(resume_from, state)
        logger.info('resumed from %s', resume_from)
    step_fn = dtrain.make_train_step(
        model, cfg, tx, axis_name='data' if data_parallel else None)
    if data_parallel:
        step, batch_sharding = make_sharded_step(step_fn)
    else:
        step, batch_sharding = jax.jit(step_fn), None

    rng = jax.random.PRNGKey(seed + 1)
    for epoch in range(cfg.train.epochs):
        t0 = time.time()
        batches = batch_iter_factory(epoch)
        if prefetch > 0:
            from ..parallel.prefetch import (BackgroundIterator,
                                             prefetch_to_device)
            batches = prefetch_to_device(
                BackgroundIterator(batches, maxsize=prefetch + 1),
                depth=prefetch, sharding=batch_sharding)
        for i, batch in enumerate(batches):
            rng, k = jax.random.split(rng)
            state, losses = step(state, batch, k)
            if i % log_interval == 0:
                m = jax.device_get(losses)
                msg = ' '.join(
                    f'{k}={float(np.ravel(v)[0]):.4f}'
                    for k, v in sorted(m.items()))
                logger.info('epoch %d iter %d/%d: %s (%.1fs)', epoch, i,
                            steps_per_epoch, msg, time.time() - t0)
        if (epoch + 1) % ckpt_interval == 0 \
                or epoch + 1 == cfg.train.epochs:
            save_checkpoint(
                os.path.join(save_dir, f'checkpoint_{epoch:03d}.msgpack'),
                state)
            save_checkpoint(os.path.join(save_dir, 'latest.msgpack'), state)
        if eval_fn is not None and (epoch + 1) % eval_interval == 0:
            metrics = eval_fn(state, epoch)
            logger.info('epoch %d eval: %s', epoch, ' '.join(
                f'{k}={v:.4f}' for k, v in sorted(metrics.items())
                if isinstance(v, (int, float))))
        logger.info('epoch %d done', epoch)
    return state


class CBGSWrapper:
    """Class-balanced group sampling (reference dataset_wrappers.py:12).

    Duplicates sample indices so every class appears with near-uniform
    frequency; wraps any dataset exposing per-sample class sets.
    """

    def __init__(self, dataset, sample_classes):
        """``sample_classes[i]`` = iterable of class ids in sample i."""
        self.dataset = dataset
        num_classes = max((max(c, default=0) for c in sample_classes),
                          default=0) + 1
        cls_to_samples = [[] for _ in range(num_classes)]
        for i, cls_set in enumerate(sample_classes):
            for c in set(cls_set):
                cls_to_samples[c].append(i)
        counts = np.array([max(len(s), 1) for s in cls_to_samples])
        frac = 1.0 / num_classes
        ratios = frac / (counts / counts.sum())
        indices = []
        for c, samples in enumerate(cls_to_samples):
            n_take = int(len(samples) * ratios[c])
            if samples:
                indices += list(np.random.default_rng(c).choice(
                    samples, n_take, replace=True))
        self.indices = indices or list(range(len(dataset)))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]
