"""Static HBM envelope of the Det suite via XLA memory analysis.

The device tunnel exposes no runtime ``memory_stats``, so this reports
the compiler's own accounting (``compile().memory_analysis()``): argument
+ output + temp + generated-code bytes for

  * the v1b TRAIN step at the published per-device batch (6 img/GPU,
    reference configs/epropnp_det_v1b_220411.py) — the "does the
    reference's training envelope fit one chip" question, and
  * the serving path at bs 1..N, f32 vs bf16 dense.

Usage: python tools/mem_envelope_det.py [--train-bs 6] [--serve-bs 1 2]
       [--height 672] [--width 1600] [--train-tiny-pnp]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def report(name, lowered):
    try:
        c = lowered.compile()
    except Exception as e:  # noqa: BLE001 — compile-OOM IS the datapoint
        msg = str(e)
        m = re.search(r'Used ([\d.]+[GMK]?) of ([\d.]+[GMK]?) hbm', msg)
        req = re.search(r'Program hbm requirement ([\d.]+[GMK]?)', msg)
        if m or req:
            print(f'{name}: DOES NOT FIT — compiler HBM requirement '
                  f'{req.group(1) if req else m.group(1)}'
                  f'{" of " + m.group(2) + " available" if m else ""}')
        else:
            print(f'{name}: compile failed: {msg[:300]}')
        return None
    ma = c.memory_analysis()
    if ma is None:
        print(f'{name}: memory_analysis unavailable')
        return None
    gib = 1 / 2**30
    args_b = getattr(ma, 'argument_size_in_bytes', 0)
    out_b = getattr(ma, 'output_size_in_bytes', 0)
    tmp_b = getattr(ma, 'temp_size_in_bytes', 0)
    alias_b = getattr(ma, 'alias_size_in_bytes', 0)
    code_b = getattr(ma, 'generated_code_size_in_bytes', 0)
    total = args_b + out_b + tmp_b + code_b - alias_b
    print(f'{name}: args {args_b * gib:.2f} + out {out_b * gib:.2f} + '
          f'temp {tmp_b * gib:.2f} - alias {alias_b * gib:.2f} + code '
          f'{code_b * gib:.3f} = {total * gib:.2f} GiB')
    return total


def serve_batch(bs, h, w):
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(bs, h, w, 3)), jnp.float32)
    cam = jnp.asarray(np.tile(
        np.array([[1266.4, 0, 816.3], [0, 1266.4, 491.5], [0, 0, 1]],
                 np.float32), (bs, 1, 1)))
    img_shapes = jnp.asarray(np.tile([h, w], (bs, 1)), jnp.float32)
    ori_shapes = jnp.asarray(np.tile([900, 1600], (bs, 1)), jnp.float32)
    flips = jnp.zeros((bs,), bool)
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing='ij')
    x2d = jnp.asarray(np.tile(np.stack([xs, ys], -1)[None], (bs, 1, 1, 1)),
                      jnp.float32)
    msk = jnp.ones((bs, h, w, 1), jnp.float32)
    return img, cam, img_shapes, ori_shapes, flips, x2d, msk


def train_batch(bs, h, w, gmax=32, pts=64):
    from epropnp_tpu.det.train import DetBatch
    img, cam, img_shapes, ori_shapes, flips, x2d, msk = serve_batch(
        bs, h, w)
    r = np.random.default_rng(1)
    boxes = np.tile(np.array([100., 100., 300., 300.], np.float32),
                    (bs, gmax, 1))
    b3d = np.tile(np.array([4.0, 1.5, 1.8, 1.0, 1.0, 20.0, 0.3],
                           np.float32), (bs, gmax, 1))
    return DetBatch(
        img=img, cam_intrinsic=cam, img_shapes=img_shapes,
        ori_shapes=ori_shapes, img_flips=flips, img_dense_x2d=x2d,
        img_dense_x2d_mask=msk,
        gt_bboxes=jnp.asarray(boxes), gt_bboxes_3d=jnp.asarray(b3d),
        gt_labels=jnp.zeros((bs, gmax), jnp.int32),
        gt_mask=jnp.asarray(r.uniform(size=(bs, gmax)) < 0.5),
        gt_velo=jnp.zeros((bs, gmax, 2), jnp.float32),
        gt_attr=jnp.zeros((bs, gmax), jnp.int32),
        gt_x3d=jnp.zeros((bs, gmax, pts, 3), jnp.float32),
        gt_x2d=jnp.zeros((bs, gmax, pts, 2), jnp.float32),
        gt_pts_mask=jnp.ones((bs, gmax, pts), jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--height', type=int, default=672)
    ap.add_argument('--width', type=int, default=1600)
    ap.add_argument('--train-bs', type=int, nargs='*', default=[6])
    ap.add_argument('--serve-bs', type=int, nargs='*', default=[1, 2])
    ap.add_argument('--skip-train', action='store_true')
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 backbone + dense stage')
    ap.add_argument('--remat', action='store_true',
                    help='rematerialize the dense forward in backward '
                         '(DetConfig.remat_dense)')
    args = ap.parse_args()

    from epropnp_tpu.det.api import build_detector
    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.det import train as dtrain
    from epropnp_tpu.det.test import make_inference_fn

    cfg = DetConfig.v1b()
    if args.bf16:
        cfg = dataclasses.replace(cfg, bf16_backbone=True, bf16_dense=True)
    if args.remat:
        cfg = dataclasses.replace(cfg, remat_dense=True)
    model = build_detector(cfg)
    h, w = args.height, args.width
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32), (h, w)))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    for bs in args.serve_bs:
        infer = make_inference_fn(model, cfg)
        batch = serve_batch(bs, h, w)
        lowered = jax.jit(infer).lower(variables, *batch,
                                       jax.random.PRNGKey(0))
        report(f'serve bs={bs} bf16={args.bf16}', lowered)

    if not args.skip_train:
        tx = dtrain.make_optimizer(cfg)
        state = dtrain.DetTrainState.create(variables, tx)
        step_fn = dtrain.make_train_step(model, cfg, tx)
        for bs in args.train_bs:
            batch = train_batch(bs, h, w)
            lowered = jax.jit(step_fn).lower(state, batch,
                                             jax.random.PRNGKey(0))
            report(f'train bs={bs} bf16={args.bf16} remat={args.remat}',
                   lowered)


if __name__ == '__main__':
    main()
