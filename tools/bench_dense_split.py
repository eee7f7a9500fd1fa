"""Micro-benchmark of the det_dense stage: backbone vs FPN vs dense head.

Attributes the ~300 ms/img det_dense serving time (tools/bench_det_stages.py)
to its subcomponents, including deformable-conv on/off variants — the
decision input for TPU kernel work on the DCN gather path.

Usage: python tools/bench_dense_split.py [--height 672] [--width 1600]
       [--iters 10] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from epropnp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from epropnp_tpu.models.backbones.resnet import ResNetBackbone
from epropnp_tpu.models.necks.fpn import FPN


@jax.jit
def _probe(x):
    return sum(jnp.ravel(leaf)[0].astype(jnp.float32)
               for leaf in jax.tree_util.tree_leaves(x))


def _sync(out):
    np.asarray(_probe(out))


def timed(fn, args, iters, name):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    print(f'{name:>28}: compile+1 {time.perf_counter() - t0:6.1f} s',
          end='', flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'   {dt * 1e3:8.2f} ms')
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--height', type=int, default=672)
    ap.add_argument('--width', type=int, default=1600)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--skip-backbone', action='store_true',
                    help='only run FPN + head-dense variants')
    args = ap.parse_args()
    h, w = args.height, args.width
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(1, h, w, 3)), jnp.float32)
    print(f'devices={jax.devices()}  {h}x{w}  dtype={dt.__name__}')

    results = {}
    variants = (('backbone R101 plain', ()),) if args.skip_backbone else \
        (('backbone R101-DCN(3,4)', (3, 4)), ('backbone R101 plain', ()))
    for name, dcn in variants:
        bb = ResNetBackbone(depth=101, out_indices=(1, 2, 3, 4),
                            dcn_stages=dcn, dtype=dt)
        vs = jax.jit(bb.init)(jax.random.PRNGKey(0), img)
        f = jax.jit(lambda vs, img, bb=bb: bb.apply(vs, img, train=False))
        feats, results[name] = timed(f, (vs, img), args.iters, name)

    fpn = FPN(in_channels=(256, 512, 1024, 2048), out_channels=256,
              num_outs=6, dtype=dt)
    vs = jax.jit(fpn.init)(jax.random.PRNGKey(0), feats)
    f = jax.jit(lambda vs, feats: fpn.apply(vs, feats))
    pyramid, results['fpn'] = timed(f, (vs, feats), args.iters, 'fpn')

    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.det.api import build_detector
    for name, dcn_last in (('head dense (dcn_on_last)', True),
                           ('head dense (no dcn)', False)):
        import dataclasses
        cfg = DetConfig.v1b()
        if args.bf16:
            cfg = dataclasses.replace(cfg, bf16_backbone=True)
        model = build_detector(cfg, dcn_on_last_conv=dcn_last)
        vs = model.init(jax.random.PRNGKey(0), img, (h, w))

        def f_head(vs, pyramid, model=model):
            return model.apply(vs, pyramid, (h, w),
                               method=lambda m, p, s:
                               m.head.forward_det_dense(p, s))
        f = jax.jit(f_head)
        pyr = [p.astype(jnp.float32) for p in pyramid]
        _, results[name] = timed(f, (vs, pyr), args.iters, name)

    print('\nsummary (ms):')
    for k, v in results.items():
        print(f'  {k:>28}: {v * 1e3:8.2f}')
    if 'backbone R101-DCN(3,4)' in results:
        print(f'  {"DCN gather overhead":>28}: '
              f'{(results["backbone R101-DCN(3,4)"] - results["backbone R101 plain"]) * 1e3:8.2f}')


if __name__ == '__main__':
    main()
