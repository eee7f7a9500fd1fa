"""Measure the device-tunnel dispatch overhead vs argument-tree size.

The stage timings in bench_det_stages.py dispatch one jitted call per
iteration with the full v1b variables pytree (~500 arrays) as argument.
If per-dispatch host overhead scales with the number of argument buffers,
those timings overstate device time. This probe times trivial jitted
functions with (a) one array arg, (b) the full variables tree, and (c)
the real det_dense stage repeated K times inside one dispatch via a
data-dependent fori_loop — the dispatch-free device number.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _probe(x):
    return sum(jnp.ravel(leaf)[0].astype(jnp.float32)
               for leaf in jax.tree_util.tree_leaves(x))


def wall(fn, args, iters, name):
    out = fn(*args)
    np.asarray(_probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(_probe(out))
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:>26}: {dt * 1e3:8.2f} ms/call', flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--height', type=int, default=672)
    ap.add_argument('--width', type=int, default=1600)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--inner', type=int, default=8)
    args = ap.parse_args()

    import dataclasses
    from epropnp_tpu.det.api import build_detector
    from epropnp_tpu.det.config import DetConfig

    cfg = dataclasses.replace(DetConfig.v1b(), bf16_backbone=True,
                              bf16_dense=True)
    model = build_detector(cfg)
    h, w = args.height, args.width
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(1, h, w, 3)), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init(k, x, (h, w)))(jax.random.PRNGKey(0), img)
    nleaves = len(jax.tree_util.tree_leaves(variables))
    print(f'devices={jax.devices()} variables leaves={nleaves}', flush=True)

    it = args.iters
    small = jnp.zeros((8, 128), jnp.float32)
    wall(jax.jit(lambda x: x + 1.0), (small,), it, 'trivial 1-arg')
    wall(jax.jit(lambda v, x: x + 1.0), (variables, small), it,
         f'trivial {nleaves}-leaf arg')

    img_shape = (h, w)

    def head_dense_fn(m, feats):
        return m.head.forward_det_dense(feats, img_shape)

    feat_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, x: m.extract_feat(x, train=False)))
    feats = feat_fn(variables, img)

    dense_1 = jax.jit(lambda v, f: model.apply(v, f, method=head_dense_fn))
    wall(dense_1, (variables, feats), it, 'head_dense 1x/dispatch')

    inner = args.inner

    def dense_rep(v, f):
        def body(i, carry):
            f2 = jax.tree_util.tree_map(
                lambda a: a + 0.0 * jnp.float32(i).astype(a.dtype), f)
            det_outs, key, value = model.apply(v, f2, method=head_dense_fn)
            return carry + jnp.mean(value).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    d1 = wall(jax.jit(dense_rep), (variables, feats), max(3, it // 4),
              f'head_dense {inner}x/dispatch')
    print(f'  -> per-application device time ~ {d1 / inner * 1e3:.2f} ms',
          flush=True)

    fcos_fn = lambda m, feats: m.head.detector(  # noqa: E731
        feats[m.head.det_lvl_range[0]:m.head.det_lvl_range[1]])
    fcos_1 = jax.jit(lambda v, f: model.apply(v, f, method=fcos_fn))
    wall(fcos_1, (variables, feats), it, 'fcos_towers 1x/dispatch')

    def fcos_rep(v, f):
        def body(i, carry):
            f2 = jax.tree_util.tree_map(
                lambda a: a + 0.0 * jnp.float32(i).astype(a.dtype), f)
            outs = model.apply(v, f2, method=fcos_fn)
            return carry + jnp.mean(outs[0].cls_score).astype(jnp.float32)
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    d2 = wall(jax.jit(fcos_rep), (variables, feats), max(3, it // 4),
              f'fcos_towers {inner}x/dispatch')
    print(f'  -> per-application device time ~ {d2 / inner * 1e3:.2f} ms',
          flush=True)


if __name__ == '__main__':
    main()
