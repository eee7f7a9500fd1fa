"""Micro-benchmarks of the FCOS-tower constituent ops at serving shapes.

Times each primitive at the v1b stride-8 shape (the level that owns ~75%
of all tower positions). Each op is applied ``--inner`` times inside ONE
jitted fori_loop (output feeding input), because the device tunnel costs
~1.5 ms per dispatch — single-call timings measure the tunnel, not the op.

Usage: python tools/probe_dense_ops.py [--h 112] [--w 200] [--c 256]
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
import flax.linen as nn


@jax.jit
def _probe(x):
    return sum(jnp.ravel(leaf)[0].astype(jnp.float32)
               for leaf in jax.tree_util.tree_leaves(x))


def timed_inner(step, x0, inner, iters, name, flops=None):
    """Time ``inner`` chained applications of ``step`` per dispatch."""
    fn = jax.jit(lambda x: jax.lax.fori_loop(
        0, inner, lambda i, x: step(x), x))
    out = fn(x0)
    np.asarray(_probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    np.asarray(_probe(out))
    dt = (time.perf_counter() - t0) / (iters * inner)
    extra = ''
    if flops:
        extra = (f'  {flops / 1e9:7.1f} GFLOP  '
                 f'{flops / dt / 1e12:6.2f} TFLOP/s')
    print(f'{name:>28}: {dt * 1e3:8.3f} ms{extra}', flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--h', type=int, default=112)
    ap.add_argument('--w', type=int, default=200)
    ap.add_argument('--c', type=int, default=256)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--inner', type=int, default=20)
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    args = ap.parse_args()
    h, w, c = args.h, args.w, args.c
    dt = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    it, inner = args.iters, args.inner
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(1, h, w, c)), dt)
    k33 = jnp.asarray(r.normal(size=(3, 3, c, c)) * 0.02, dt)
    print(f'devices={jax.devices()} shape=1x{h}x{w}x{c} dtype={args.dtype} '
          f'inner={inner}', flush=True)

    fl = h * w * 9 * c * c * 2
    conv = lambda x: jax.lax.conv_general_dilated(  # noqa: E731
        x, k33, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    timed_inner(lambda x: jnp.tanh(conv(x)), x, inner, it,
                'conv3x3 (tanh-stabilized)', fl)

    gn = nn.GroupNorm(32, dtype=dt)
    gv = gn.init(jax.random.PRNGKey(0), x)
    timed_inner(lambda x: gn.apply(gv, x), x, inner, it, 'groupnorm')
    timed_inner(jnp.sin, x, inner, it, 'sin (elementwise floor)')
    timed_inner(lambda x: nn.relu(gn.apply(gv, conv(x))), x, inner, it,
                'conv+gn+relu layer', fl)

    # the DCN as the head uses it
    from epropnp_tpu.ops.deform_conv import DeformConv
    dcn = DeformConv(c, dtype=dt)
    dv = jax.jit(dcn.init)(jax.random.PRNGKey(1), x)
    timed_inner(lambda x: dcn.apply(dv, x), x, inner, it,
                'DeformConv (fused kernel)', fl)
    dcn_np = DeformConv(c, dtype=dt, fused=False)
    timed_inner(lambda x: dcn_np.apply(dv, x), x, inner, it,
                'DeformConv (jnp path)', fl)

    from epropnp_tpu.ops.pallas_dcn import pack_patches_mxu

    def pp_step(x):
        out = pack_patches_mxu(x[0])
        return out[None, :h, :w, :c]
    timed_inner(pp_step, x, inner, it, 'pack_patches_mxu',
                h * w * 4 * c * 4 * c * 2)


if __name__ == '__main__':
    main()
