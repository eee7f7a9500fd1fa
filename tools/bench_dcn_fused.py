"""Settle the DCN gather decision: production path vs int8 tables.

Round-4 roofline (STATUS.md) question: can a fully-fused Pallas kernel
that gathers patch rows in-kernel beat XLA's gather engine at the
production stage-3 DCN shape (672x1600 serving: h=42, w=100, C=256,
4c rows of 1 KB bf16, taps=9)?

ANSWERED round 5, on hardware (dcn_fused_decision_r5.json): **no** —
both fused prototypes (per-row HBM DMA with scalar-prefetched indices,
and a VMEM-resident table with dynamic row loads) fail Mosaic
compilation outright: single-row slices of a tiled (8,128) memref are
not expressible ("Slice shape along dimension 0 must be aligned to
tiling (8)" / "cannot statically prove that index in dimension 0 is a
multiple of 8"). Re-laying the table out 1-D would only re-expose the
second blocker, the issue rate: 9x4200 = 37.8k rows/block through a
scalar-core DMA/load loop at O(100 ns)/row is 4-40 ms vs the gather
engine's ~18 ns/row (~0.7 ms). The prototypes were deleted per the
round plan; this bench keeps the decision measurable.

What remains measured here (amortized over an in-dispatch scan so the
device-tunnel's ~25 ms sync floor cancels):

  xla_gather      packed[rows] alone (the gather floor)
  xla_gather_i8   same rows from an int8 table (is the gather
                  byte-bound -> int8 halves traffic, or
                  descriptor-bound -> no help?)
  production      XLA gather -> pallas corner-combine+contract
                  (ops/pallas_dcn.py, the serving path)
  production_i8   int8 table + dequant folded into the kernel

Timing: each variant runs inside a jax.lax.scan whose carry feeds back
into the gather indices (prevents hoisting/CSE); reported ms/iter is
(t[2n] - t[n]) / n so the constant dispatch + device_get overhead of
the tunnel cancels exactly.

Usage: python tools/bench_dcn_fused.py [--dtype bf16] [--inner 24]
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
    p.add_argument('--h', type=int, default=42)
    p.add_argument('--w', type=int, default=100)
    p.add_argument('--c', type=int, default=256)
    p.add_argument('--inner', type=int, default=24,
                   help='scan length n; timed as (t[2n]-t[n])/n')
    p.add_argument('--repeats', type=int, default=10)
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

    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    h, w, c = args.h, args.w, args.c
    taps, cout = 9, c
    length = h * w
    n_rows = (h + 2) * (w + 2)
    r = np.random.default_rng(0)
    packed = jnp.asarray(r.normal(size=(n_rows, 4 * c)), dtype)
    rows = jnp.asarray(r.integers(0, n_rows, size=(taps, length)), jnp.int32)
    w4 = jnp.asarray(r.uniform(0, 1, size=(taps, length, 4)), jnp.float32)
    kern = jnp.asarray(r.normal(size=(taps, c, cout)) * 0.05, dtype)
    q0, kern_s0 = quantize_packed_table(packed, kern)
    q0 = jax.block_until_ready(q0)

    def scanner(fn_of_rows, n):
        """Run fn_of_rows n times; the carry perturbs the indices so no
        iteration can be hoisted out of the loop or CSE'd."""

        @jax.jit
        def run():
            def body(carry, _):
                acc, shift = carry
                rows_i = (rows + shift) % n_rows
                out = fn_of_rows(rows_i)
                val = jnp.sum(jnp.ravel(out)[:8].astype(jnp.float32))
                return (acc + val, (val.astype(jnp.int32) & 7) + 1), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.float32(0), jnp.int32(0)), None, length=n)
            return acc

        return run

    def timed(fn_of_rows, name, tag, results):
        n = args.inner
        run1, run2 = scanner(fn_of_rows, n), scanner(fn_of_rows, 2 * n)
        try:
            np.asarray(run1())
            np.asarray(run2())
        except Exception as e:  # noqa: BLE001
            msg = f'{type(e).__name__}: {e}'
            print(f'{name:>13}: FAILED {msg}')
            results[tag] = dict(error=msg.splitlines()[0])
            return
        diffs = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(run1())
            t1 = time.perf_counter()
            np.asarray(run2())
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / n)
        dt = float(np.median(diffs))
        gather_gb = taps * length * 4 * c * packed.dtype.itemsize / 1e9
        print(f'{name:>13}: {dt * 1e3:8.3f} ms/iter '
              f'({gather_gb / dt:6.1f} GB/s of gathered rows)')
        results[tag] = dict(ms=round(dt * 1e3, 4),
                            row_gbps=round(gather_gb / dt, 2))

    results = dict(shape=dict(h=h, w=w, c=c, taps=taps, cout=cout,
                              dtype=args.dtype, inner=args.inner),
                   platform=platform, timing='scan-amortized diff')

    def _prod8(rows_i):
        q, kern_s = quantize_packed_table(packed, kern)
        return dcn_gather_contract_q(q, rows_i, w4, kern_s)

    timed(lambda ri: packed[ri], 'xla_gather', 'xla_gather', results)
    timed(lambda ri: q0[ri], 'xla_gather_i8', 'xla_gather_i8', results)
    timed(lambda ri: dcn_gather_contract(packed, ri, w4, kern),
          'production', 'production', results)
    timed(_prod8, 'production_i8', 'production_i8', results)

    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, 'a') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
