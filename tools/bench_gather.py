"""Microbenchmark: XLA gather shapes on TPU for the DCN sampling path.

Decides between gather layouts for deformable conv: many small-row
gathers (4 corners x C channels) vs fewer wide-row gathers (one 2x2
patch row of 4C), f32 vs bf16 — i.e. whether TPU gather throughput is
bound by bytes or by gathered-row count.

Usage: python tools/bench_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _probe(x):
    return jnp.ravel(x)[0].astype(jnp.float32)


def timed(fn, args, iters, name):
    out = fn(*args)
    np.asarray(_probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(_probe(out))
    dt = (time.perf_counter() - t0) / iters
    gb = out.size * out.dtype.itemsize / 1e9
    print(f'{name:>42}: {dt * 1e3:8.3f} ms  ({gb / dt:6.1f} GB/s out)')
    return dt


def main():
    r = np.random.default_rng(0)
    h, w = 56, 100
    n_pos = h * w * 9  # positions x taps for one DCN layer at stride 16
    print(f'devices={jax.devices()}  rows={n_pos}')
    iters = 20

    for dtype in (jnp.float32, jnp.bfloat16):
        for c, rows in ((256, n_pos * 4), (512, n_pos * 2),
                        (1024, n_pos), (2048, n_pos // 2)):
            feat = jnp.asarray(r.normal(size=(h * w, c)), dtype)
            idx = jnp.asarray(r.integers(0, h * w, rows), jnp.int32)
            f = jax.jit(lambda feat, idx: feat[idx])
            timed(f, (feat, idx), iters,
                  f'{dtype.__name__} rows={rows} c={c}')

    # 2D advanced-index form used by bilinear_sample (c-vector per (y, x))
    for dtype in (jnp.float32,):
        feat = jnp.asarray(r.normal(size=(h, w, 256)), dtype)
        yi = jnp.asarray(r.integers(0, h, n_pos * 4), jnp.int32)
        xi = jnp.asarray(r.integers(0, w, n_pos * 4), jnp.int32)
        f = jax.jit(lambda feat, yi, xi: feat[yi, xi])
        timed(f, (feat, yi, xi), iters, f'{dtype.__name__} 2d-index 4x rows c=256')


if __name__ == '__main__':
    main()
