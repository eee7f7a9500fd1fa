"""Data-parallel scaling of the Det train step on a virtual device mesh.

Measures steps/s of the full small-but-real Det training step
(tools/validate_det_synthetic.py::small_cfg — backbone + FPN + FCOS +
deformable head + AMIS MC pose loss) under ``shard_map`` data
parallelism at 1/2/4/8 devices, in BOTH scaling regimes:

- weak:   per-device batch fixed (global batch = N * bs) — the regime
  the reference trains in (12-img global batch over GPUs, DDP;
  /root/reference/EPro-PnP-Det/configs/epropnp_det_basic.py:245).
- strong: global batch fixed, shards shrink with N.

Device counts come from ``--xla_force_host_platform_device_count``,
which is process-level, so the parent re-execs itself once per N
(child mode: ``--child N``).

HONESTY CAVEAT (printed in the output): on this image the virtual
devices all share ONE physical CPU core, so weak-scaling wall time
grows ~linearly with N no matter what — the meaningful numbers here are
(a) the collective/partition overhead: t_weak(N) / (N * t(1)), which
would be the parallel efficiency loss on real chips where each shard
runs on its own core/chip, and (b) strong-scaling t(N) vs t(1), where
total compute is constant and any growth is pure sharding overhead.
The real-chip extrapolation multiplies the measured single-chip v5e
ms/step (tools/run_v1b_train_step.py) by the efficiency from (a).

Usage: python tools/bench_dp_scaling.py [--devices 1,2,4,8] [--bs 1]
           [--global-bs 8] [--steps 6] [--json-out dp_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))


def child(n: int, bs_weak: int, global_bs: int, steps: int):
    import jax
    import numpy as np
    from validate_det_synthetic import (small_cfg, build_model,
                                        scenes_to_batch, IM_HW)
    from epropnp_tpu.det.synthetic import SyntheticDetSceneGenerator
    from epropnp_tpu.det import train as dtrain
    from epropnp_tpu.det.main import make_sharded_step

    assert len(jax.devices()) >= n, (n, jax.devices())
    cfg = small_cfg()
    model = build_model(cfg)
    gen = SyntheticDetSceneGenerator(im_hw=IM_HW, num_classes=3,
                                     max_gt=4, lidar_points=16)
    rng_np = np.random.default_rng(0)
    tx = dtrain.make_optimizer(cfg)
    step_fn = dtrain.make_train_step(model, cfg, tx)

    out = {'n_devices': n}
    for mode, gbs in (('weak', n * bs_weak), ('strong', global_bs)):
        batch = scenes_to_batch(gen, gen.sample_batch(rng_np, gbs))
        variables = model.init(jax.random.PRNGKey(0), batch.img[:1], IM_HW)
        state = dtrain.DetTrainState.create(variables, tx)
        step, sharding = make_sharded_step(step_fn, n_devices=n)
        batch = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), batch)
        state, losses = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(losses)  # compile + step 0
        t0 = time.time()
        for i in range(steps):
            state, losses = step(state, batch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(losses)
        dt = (time.time() - t0) / steps
        out[mode] = {'global_bs': gbs, 'ms_per_step': dt * 1e3,
                     'imgs_per_s': gbs / dt}
    print('CHILD_JSON ' + json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--devices', type=str, default='1,2,4,8')
    ap.add_argument('--bs', type=int, default=1,
                    help='per-device batch for weak scaling')
    ap.add_argument('--global-bs', type=int, default=8,
                    help='fixed global batch for strong scaling')
    ap.add_argument('--steps', type=int, default=6)
    ap.add_argument('--json-out', type=str, default='')
    ap.add_argument('--child', type=int, default=0)
    args = ap.parse_args()

    if args.child:
        child(args.child, args.bs, args.global_bs, args.steps)
        return

    rows = []
    for n in [int(x) for x in args.devices.split(',')]:
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                            f' --xla_force_host_platform_device_count={n}')
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child', str(n),
             '--bs', str(args.bs), '--global-bs', str(args.global_bs),
             '--steps', str(args.steps)],
            env=env, capture_output=True, text=True)
        line = [l for l in proc.stdout.splitlines()
                if l.startswith('CHILD_JSON ')]
        if not line:
            print(f'n={n} FAILED:\n{proc.stdout[-2000:]}\n'
                  f'{proc.stderr[-2000:]}')
            sys.exit(1)
        row = json.loads(line[0][len('CHILD_JSON '):])
        row['wall_s'] = time.time() - t0
        rows.append(row)
        print(f"n={n}: weak {row['weak']['ms_per_step']:.0f} ms/step "
              f"(gbs {row['weak']['global_bs']}), "
              f"strong {row['strong']['ms_per_step']:.0f} ms/step "
              f"(gbs {row['strong']['global_bs']})  "
              f"[{row['wall_s']:.0f}s incl. compile]", flush=True)

    t1w = rows[0]['weak']['ms_per_step']
    t1s = rows[0]['strong']['ms_per_step']
    print('\nN  weak ms/step  eff_weak=N*t1/tN  strong ms/step  '
          'overhead_strong=tN/t1')
    table = []
    for r in rows:
        n = r['n_devices']
        eff = n * t1w / r['weak']['ms_per_step']
        ovh = r['strong']['ms_per_step'] / t1s
        table.append({'n': n, 'weak_ms': r['weak']['ms_per_step'],
                      'eff_weak': eff,
                      'strong_ms': r['strong']['ms_per_step'],
                      'strong_vs_1dev': ovh})
        print(f"{n}  {r['weak']['ms_per_step']:12.1f}  {eff:16.2f}  "
              f"{r['strong']['ms_per_step']:14.1f}  {ovh:20.2f}")
    print('\nNOTE: all N virtual devices share ONE physical core; '
          'eff_weak ~1.0 means the sharded program adds no overhead '
          'beyond the serialized compute — the real-chip expectation '
          'is t(N) ~ t(1) * eff_weak^-1 per step at N-fold batch.')
    if args.json_out:
        with open(args.json_out, 'w') as f:
            json.dump({'rows': rows, 'table': table,
                       'note': 'virtual CPU mesh, 1 physical core'},
                      f, indent=1)
        print(f'wrote {args.json_out}')


if __name__ == '__main__':
    main()
