"""Data-parallel scaling of the Det train step on a virtual device mesh.

Measures the jitted shard_map train step at 1/2/4/8 devices on the
CPU backend (``xla_force_host_platform_device_count``) in two regimes:

- weak scaling: per-device batch fixed (total batch grows with devices) —
  the production regime (reference trains 4 GPU x 3 img / 2 GPU x 6 img);
- strong scaling: total batch fixed at 8, sharded across devices.

CAVEAT (printed in the output): the virtual devices share ONE physical
host core here, so absolute steps/s does NOT measure parallel speedup —
it measures the sharding/collective overhead added by the mesh
partition. The per-chip hardware extrapolation column multiplies the
measured single-chip v1b step time (tools/run_v1b_train_step.py) by the
device count at the measured collective-overhead ratio.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_dp_scaling.py [--steps 10] [--img 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def make_batch(n, hw, max_gt=4, seed=0):
    from epropnp_tpu.det.train import DetBatch
    r = np.random.default_rng(seed)
    h, w = hw
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing='ij')
    boxes3d = np.tile(
        np.array([1.8, 1.5, 4.0, 0.0, 1.0, 12.0, 0.3], np.float32),
        (n, max_gt, 1))
    boxes3d[..., 3] += r.normal(0, 2, (n, max_gt))
    return DetBatch(
        img=jnp.asarray(r.normal(size=(n, h, w, 3)), jnp.float32),
        cam_intrinsic=jnp.tile(jnp.asarray(
            [[120., 0, w / 2], [0, 120., h / 2], [0, 0, 1]],
            jnp.float32), (n, 1, 1)),
        img_shapes=jnp.tile(jnp.asarray([h, w], jnp.float32), (n, 1)),
        ori_shapes=jnp.tile(jnp.asarray([h, w], jnp.float32), (n, 1)),
        img_flips=jnp.zeros((n,), bool),
        img_dense_x2d=jnp.tile(jnp.asarray(
            np.stack([xs, ys], -1)[None], jnp.float32), (n, 1, 1, 1)),
        img_dense_x2d_mask=jnp.ones((n, h, w, 1), jnp.float32),
        gt_bboxes=jnp.tile(jnp.asarray(
            [10., 10., 40., 40.], jnp.float32), (n, max_gt, 1)),
        gt_bboxes_3d=jnp.asarray(boxes3d),
        gt_labels=jnp.zeros((n, max_gt), jnp.int32),
        gt_mask=jnp.ones((n, max_gt), bool),
        gt_velo=jnp.zeros((n, max_gt, 2), jnp.float32),
        gt_attr=jnp.zeros((n, max_gt), jnp.int32),
        gt_x3d=None, gt_x2d=None, gt_pts_mask=None)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--img', type=int, default=128,
                    help='square image size for the tiny config')
    ap.add_argument('--per-dev-bs', type=int, default=1)
    args = ap.parse_args()

    import dataclasses
    from epropnp_tpu.det.config import DetConfig, DetPnPConfig
    from epropnp_tpu.det import train as dtrain
    from epropnp_tpu.det.main import init_state, make_sharded_step
    from epropnp_tpu.det.api import build_detector

    cfg = DetConfig.v1b()
    cfg = dataclasses.replace(
        cfg,
        backbone_depth=18,
        pnp=dataclasses.replace(cfg.pnp, mc_samples=32, num_iter=2,
                                lm_num_iter=3, rs_num_proposals=8),
        train=dataclasses.replace(cfg.train, num_obj_samples_per_img=4,
                                  max_gt_per_img=4, roi_shape=(7, 7)))
    hw = (args.img, args.img)
    model = build_detector(cfg)
    tx = dtrain.make_optimizer(cfg)
    devices = jax.devices()
    results = {}
    for regime in ('weak', 'strong'):
        results[regime] = []
        for nd in (1, 2, 4, 8):
            if nd > len(devices):
                continue
            bs = args.per_dev_bs * nd if regime == 'weak' else 8
            if regime == 'strong' and bs % nd:
                continue
            state = init_state(cfg, model, tx, hw)
            step_fn = dtrain.make_train_step(model, cfg, tx,
                                             axis_name='data')
            step, sharding = make_sharded_step(step_fn, n_devices=nd)
            batch = jax.device_put(make_batch(bs, hw), sharding)
            rng = jax.random.PRNGKey(0)
            state, losses = step(state, batch, rng)   # compile
            jax.block_until_ready(losses)
            t0 = time.time()
            for _ in range(args.steps):
                state, losses = step(state, batch, rng)
            jax.block_until_ready(losses)
            dt = (time.time() - t0) / args.steps
            results[regime].append(dict(
                n_devices=nd, batch=bs, ms_per_step=round(dt * 1e3, 2),
                img_per_s=round(bs / dt, 3)))
            print(f'{regime} nd={nd} bs={bs}: {dt * 1e3:.1f} ms/step, '
                  f'{bs / dt:.2f} img/s', flush=True)
    base = results['weak'][0]['ms_per_step']
    for row in results['weak']:
        row['collective_overhead'] = round(
            row['ms_per_step'] / (base * row['n_devices']), 3)
    print(json.dumps(dict(
        note='virtual devices share one host core: weak-scaling '
             'ms_per_step ~ n_devices x single-device is IDEAL here; '
             'collective_overhead is the excess factor',
        results=results)))


if __name__ == '__main__':
    main()
