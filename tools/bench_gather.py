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
    # bounded-backoff device probe: a tunnel wedge must fail
    # loudly here, not hang the whole measurement session
    from epropnp_tpu.utils.backend_retry import wait_for_backend
    wait_for_backend(fallback_cpu=False)
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

    # int8 rows — the decision input for a quantized DCN gather table:
    # if gather is BYTE-bound at these row widths, int8 4c rows halve
    # the dominant dense-stage traffic (STATUS round-4 roofline); if it
    # is ROW-RATE-bound (the bf16-at-half-byte-rate observation above
    # suggests it may be), int8 buys nothing and the idea dies here.
    for c in (1024, 2048):   # 4C patch rows of a C=256 / C=512 DCN
        q = r.integers(-127, 127, size=(h * w, c)).astype(np.int8)
        idx = jnp.asarray(r.integers(0, h * w, n_pos), jnp.int32)
        feat8 = jnp.asarray(q)
        f = jax.jit(lambda feat, idx: feat[idx])
        timed(f, (feat8, idx), iters, f'int8 rows={n_pos} c={c}')
        # same bytes viewed as int32 lanes (the bf16->f32 bitcast trick)
        feat32 = jax.lax.bitcast_convert_type(
            feat8.reshape(h * w, c // 4, 4), jnp.int32)
        f2 = jax.jit(lambda feat, idx: feat[idx])
        timed(f2, (feat32, idx), iters,
              f'int8-as-int32 rows={n_pos} lanes={c // 4}')


if __name__ == '__main__':
    main()
