"""Execute REAL v1b train steps on the attached chip and time them.

The proof-of-fit companion to tools/mem_envelope_det.py: compiles the
full v1b training step (672x1600, synthetic batch) at the requested
batch size / precision / remat setting, runs it for real on the device,
and reports ms/step. With the chunked DCN backward
(ops/pallas_dcn.py::_bwd_chunked) and bf16, the reference's published
per-device batch sizes become executable on a single 16G v5e — the
number the reference only achieves per 24G GPU
(configs/epropnp_det_v1b_220411.py, 2 GPU x 6 img).

Usage: python tools/run_v1b_train_step.py [--bs 2] [--bf16] [--remat]
       [--steps 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # bounded-backoff device probe: a tunnel wedge must fail
    # loudly here, not hang the whole measurement session
    from epropnp_tpu.utils.backend_retry import wait_for_backend
    wait_for_backend(fallback_cpu=False)
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=2)
    ap.add_argument('--height', type=int, default=672)
    ap.add_argument('--width', type=int, default=1600)
    ap.add_argument('--steps', type=int, default=5)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--remat', action='store_true')
    args = ap.parse_args()

    from mem_envelope_det import train_batch  # synthetic fixed-shape batch
    from epropnp_tpu.det.api import build_detector
    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.det import train as dtrain

    cfg = DetConfig.v1b()
    if args.bf16:
        cfg = dataclasses.replace(cfg, bf16_backbone=True, bf16_dense=True)
    if args.remat:
        cfg = dataclasses.replace(cfg, remat_dense=True)
    model = build_detector(cfg)
    h, w = args.height, args.width

    print(f'devices={jax.devices()} bs={args.bs} bf16={args.bf16} '
          f'remat={args.remat}', flush=True)
    t0 = time.time()
    variables = jax.jit(
        lambda k, x: model.init(k, x, (h, w)))(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    tx = dtrain.make_optimizer(cfg)
    state = dtrain.DetTrainState.create(variables, tx)
    step_fn = jax.jit(dtrain.make_train_step(model, cfg, tx))
    batch = train_batch(args.bs, h, w)
    print(f'init: {time.time() - t0:.1f}s', flush=True)

    t0 = time.time()
    state, losses = step_fn(state, batch, jax.random.PRNGKey(1))
    l0 = {k: float(v) for k, v in jax.device_get(losses).items()}
    print(f'first step (incl. compile): {time.time() - t0:.1f}s  '
          f'loss_cls={l0["loss_cls"]:.4f} grad_norm={l0["grad_norm"]:.3g}',
          flush=True)

    t0 = time.time()
    for i in range(args.steps):
        state, losses = step_fn(state, batch,
                                jax.random.PRNGKey(2 + i))
    lf = jax.device_get(losses)
    dt = (time.time() - t0) / args.steps
    finite = all(np.all(np.isfinite(np.asarray(v))) for v in lf.values())
    print(f'{args.steps} steps: {dt * 1e3:.1f} ms/step  all_finite={finite}')
    print(f'imgs/s (train): {args.bs / dt:.2f}')


if __name__ == '__main__':
    main()
