"""Measure the fully-fused DCN gather kernel vs the production path.

The round-4 roofline (STATUS.md) says the XLA-gather + Pallas-contract
production path pays 2x77 MB of avoidable HBM round-trip per stride-16
DCN block at v1b serving geometry; the open question is whether a
Pallas kernel that gathers in-kernel can beat XLA's gather engine
(~115 GB/s on 2 KB rows = ~18 ns/row). This bench answers it on real
hardware at the production shape:

  stage-3 DCN block @ 672x1600 serving: h=42, w=100, C=256 (4c rows of
  1 KB bf16 / 2 KB f32), taps=9, cout=256.

Variants timed (each = one jitted call, median of repeats):
  xla_gather      packed[rows] alone (the gather floor)
  production      XLA gather -> pallas contract (ops/pallas_dcn.py)
  fused_dma       per-row DMAs from HBM inside the kernel
  fused_vmem      whole table resident in VMEM, dynamic row loads

Usage: python tools/bench_dcn_fused.py [--dtype bf16] [--block-l 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    p.add_argument('--block-l', type=int, default=128)
    p.add_argument('--h', type=int, default=42)
    p.add_argument('--w', type=int, default=100)
    p.add_argument('--c', type=int, default=256)
    p.add_argument('--repeats', type=int, default=20)
    p.add_argument('--out', default=None, help='append JSON line here')
    args = p.parse_args()

    from epropnp_tpu.utils.backend_retry import wait_for_backend
    platform = wait_for_backend(fallback_cpu=False)
    print(f'# backend: {platform}')

    import jax
    import jax.numpy as jnp
    import numpy as np
    from epropnp_tpu.ops.pallas_dcn import (
        dcn_gather_contract, dcn_gather_contract_q, quantize_packed_table)
    from epropnp_tpu.ops.pallas_dcn_fused import dcn_fused_forward

    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    h, w, c = args.h, args.w, args.c
    taps, cout = 9, c
    length = h * w * 1  # positions
    n_rows = (h + 2) * (w + 2)
    r = np.random.default_rng(0)
    packed = jnp.asarray(r.normal(size=(n_rows, 4 * c)), dtype)
    rows = jnp.asarray(r.integers(0, n_rows, size=(taps, length)), jnp.int32)
    w4 = jnp.asarray(r.uniform(0, 1, size=(taps, length, 4)), jnp.float32)
    kern = jnp.asarray(r.normal(size=(taps, c, cout)) * 0.05, dtype)

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0].astype(jnp.float32)

    def timed(fn, name, tag, results):
        try:
            out = fn()
            np.asarray(probe(out))
        except Exception as e:  # noqa: BLE001
            print(f'{name:>12}: FAILED {type(e).__name__}: {e}')
            results[tag] = dict(error=f'{type(e).__name__}: {e}')
            return None
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(probe(out))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        gather_gb = taps * length * 4 * c * packed.dtype.itemsize / 1e9
        print(f'{name:>12}: {dt * 1e3:8.3f} ms '
              f'({gather_gb / dt:6.1f} GB/s of gathered rows)')
        results[tag] = dict(ms=round(dt * 1e3, 4),
                            row_gbps=round(gather_gb / dt, 2))
        return out

    results = dict(shape=dict(h=h, w=w, c=c, taps=taps, cout=cout,
                              dtype=args.dtype, block_l=args.block_l),
                   platform=platform)

    f_gather = jax.jit(lambda: packed[rows])
    f_prod = jax.jit(lambda: dcn_gather_contract(packed, rows, w4, kern))
    f_dma = jax.jit(lambda: dcn_fused_forward(
        packed, rows, w4, kern, block_l=args.block_l, table_in_vmem=False))
    f_vmem = jax.jit(lambda: dcn_fused_forward(
        packed, rows, w4, kern, block_l=args.block_l, table_in_vmem=True))

    # int8 decision inputs (VERDICT-r4 #4): quantized table gather rate
    # + end-to-end quantized path (quantization recomputed per call, as
    # serving would from live activations)
    q0, kern_s0 = quantize_packed_table(packed, kern)
    q0 = jax.block_until_ready(q0)
    f_gather8 = jax.jit(lambda: q0[rows])

    def _prod8():
        q, kern_s = quantize_packed_table(packed, kern)
        return dcn_gather_contract_q(q, rows, w4, kern_s)

    f_prod8 = jax.jit(_prod8)

    timed(f_gather, 'xla_gather', 'xla_gather', results)
    timed(f_gather8, 'xla_gather_i8', 'xla_gather_i8', results)
    ref = timed(f_prod, 'production', 'production', results)
    timed(f_prod8, 'production_i8', 'production_i8', results)
    got = timed(f_dma, 'fused_dma', 'fused_dma', results)
    if ref is not None and got is not None:
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f'  fused_dma max|err| vs production: {err:.2e}')
        results['fused_dma']['max_err'] = err
    got = timed(f_vmem, 'fused_vmem', 'fused_vmem', results)
    if ref is not None and got is not None:
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f'  fused_vmem max|err| vs production: {err:.2e}')
        results['fused_vmem']['max_err'] = err

    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, 'a') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
