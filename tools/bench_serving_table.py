"""Batched Det serving throughput/latency/MFU table on real hardware.

VERDICT-r2 #2 deliverable: one fused end-to-end inference compile per
batch size (the cheap way — tools/bench_det_stages.py attributes
per-stage cost, this tool sweeps batch), reporting per-bs latency,
img/s, and XLA-cost-analysis MFU at the reference serving geometry
(1600x672 after Crop3D, configs/epropnp_det_basic.py:173,190).

The reference publishes no throughput at all (SURVEY.md §6); the
comparison axis is our own FLOP ceiling (cost-analysis FLOPs / chip
peak).

Usage: python tools/bench_serving_table.py [--bs 1,2,4,6] [--bf16]
           [--iters 20] [--json-out serving_table.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from epropnp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from epropnp_tpu.det.api import build_detector
from epropnp_tpu.det.config import DetConfig
from epropnp_tpu.det.test import make_inference_fn


@jax.jit
def _probe(x):
    return sum(jnp.ravel(leaf)[0].astype(jnp.float32)
               for leaf in jax.tree_util.tree_leaves(x))


def _sync(out):
    np.asarray(_probe(out))


def make_args(bs, h, w):
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(bs, h, w, 3)), jnp.float32)
    cam = jnp.asarray(np.tile(
        np.array([[1266.4, 0, 816.3], [0, 1266.4, 491.5 - 228.0],
                  [0, 0, 1]], np.float32), (bs, 1, 1)))
    img_shapes = jnp.asarray(np.tile([h, w], (bs, 1)), jnp.float32)
    ori_shapes = jnp.asarray(np.tile([h, w], (bs, 1)), jnp.float32)
    img_flips = jnp.zeros((bs,), bool)
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing='ij')
    dense_x2d = jnp.asarray(
        np.tile(np.stack([xs, ys], -1)[None], (bs, 1, 1, 1)), jnp.float32)
    dense_mask = jnp.ones((bs, h, w, 1), jnp.float32)
    return (img, cam, img_shapes, ori_shapes, img_flips, dense_x2d,
            dense_mask, jax.random.PRNGKey(0))


def main():
    # bounded-backoff device probe: a tunnel wedge must fail
    # loudly here, not hang the whole measurement session
    from epropnp_tpu.utils.backend_retry import wait_for_backend
    wait_for_backend(fallback_cpu=False)
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=str, default='1,2,4,6')
    ap.add_argument('--height', type=int, default=672)
    ap.add_argument('--width', type=int, default=1600)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--max-obj', type=int, default=256)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--pallas', action='store_true')
    ap.add_argument('--level-packed', action='store_true',
                    help='composite-canvas FCOS towers (level_pack)')
    ap.add_argument('--int8-gather', action='store_true',
                    help='int8-quantized DCN gather tables (serving)')
    ap.add_argument('--peak-tflops', type=float, default=197.0)
    ap.add_argument('--json-out', type=str, default='')
    args = ap.parse_args()

    cfg = DetConfig.v1b()
    if args.bf16:
        cfg = dataclasses.replace(cfg, bf16_backbone=True, bf16_dense=True)
    if args.level_packed:
        cfg = dataclasses.replace(cfg, level_packed_towers=True)
    if args.int8_gather:
        cfg = dataclasses.replace(cfg, int8_dcn_gather=True)
    if args.pallas:
        cfg = dataclasses.replace(
            cfg, pnp=dataclasses.replace(cfg.pnp, use_pallas=True))
    model = build_detector(cfg)
    h, w = args.height, args.width
    infer = make_inference_fn(model, cfg, max_obj_per_img=args.max_obj)

    variables = jax.jit(
        lambda k, x: model.init(k, x, (h, w)))(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))

    print(f'devices={jax.devices()}  {h}x{w} bf16={args.bf16} '
          f'pallas={args.pallas}')
    rows = []
    for bs in [int(b) for b in args.bs.split(',')]:
        a = make_args(bs, h, w)
        jfn = jax.jit(infer)
        t0 = time.time()
        lowered = jfn.lower(variables, *a)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get('flops', float('nan')))
        out = jfn(variables, *a)
        _sync(out)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(variables, *a)
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        mfu = flops / dt / (args.peak_tflops * 1e12)
        row = dict(bs=bs, ms=dt * 1e3, img_s=bs / dt,
                   ms_per_img=dt * 1e3 / bs, gflops=flops / 1e9,
                   mfu_pct=mfu * 100, compile_s=compile_s)
        rows.append(row)
        print(f'bs={bs}: {dt*1e3:7.2f} ms  {bs/dt:6.2f} img/s  '
              f'{dt*1e3/bs:6.2f} ms/img  {flops/1e9:7.1f} GFLOP  '
              f'MFU {mfu*100:5.1f}%  (compile {compile_s:.0f}s)',
              flush=True)

    if args.json_out:
        with open(args.json_out, 'w') as f:
            json.dump(dict(height=h, width=w, bf16=args.bf16,
                           pallas=args.pallas,
                           peak_tflops=args.peak_tflops, rows=rows), f,
                      indent=1)
        print(f'wrote {args.json_out}')


if __name__ == '__main__':
    main()
