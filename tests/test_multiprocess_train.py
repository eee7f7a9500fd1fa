"""REAL multi-process data-parallel training over jax.distributed.

The in-repo multi-device tests use one process with 8 virtual CPU
devices; this test goes further and launches TWO separate OS processes
that form a ``jax.distributed`` cluster (Gloo collectives — the DCN
analogue available in this image), each loading only its own
``HostShardSampler`` shard, and runs the full 6DoF training step over
the cross-process mesh. This exercises the exact mechanics of a
multi-host TPU pod run: per-host data loading, global-array assembly
via ``jax.make_array_from_process_local_data``, and cross-host
``lax.pmean`` gradient/EMA sync.

Reference counterpart: ``torch.distributed.launch`` self-spawn + DDP
(/root/reference/EPro-PnP-Det/train.py:56-84) — which the reference
repo itself never tests in-tree (SURVEY.md §4).

Checks:
  * the two hosts' sampler shards are disjoint and cover the dataset;
  * both processes finish and report identical (replicated) loss and
    post-step parameter digest — i.e. the cross-process grad sync works;
  * the multi-process result matches a single-process run on the same
    global batch (same mesh size), pinning collective correctness.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import _mp_train_worker as worker

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROCS = 2


def _free_port() -> str:
    """Bind an ephemeral port so concurrent runs never collide."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(('127.0.0.1', 0))
        return str(s.getsockname()[1])


def test_host_shards_disjoint_cover():
    idx = [worker.host_indices(NPROCS, h) for h in range(NPROCS)]
    flat = np.concatenate(idx)
    assert len(flat) == worker.GLOBAL_SAMPLES
    assert sorted(flat.tolist()) == list(range(worker.GLOBAL_SAMPLES))


@pytest.mark.slow
@pytest.mark.parametrize('suite', ['sixdof', 'det'])
def test_two_process_train_step_matches_single_process(tmp_path, suite):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env.pop('PYTEST_CURRENT_TEST', None)
    script = os.path.join(REPO_ROOT, 'tests', '_mp_train_worker.py')
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(NPROCS), port,
             str(tmp_path), suite],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(NPROCS)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-4000:]}'

    results = []
    for pid in range(NPROCS):
        with open(tmp_path / f'out_{pid}.json') as f:
            results.append(json.load(f))

    # disjoint shards, full coverage (as actually used by the workers)
    flat = sorted(i for r in results for i in r['indices'])
    assert flat == list(range(worker.GLOBAL_SAMPLES))

    # replicated outputs identical across processes (pmean sync worked)
    assert np.isfinite(results[0]['loss'])
    assert results[0]['loss'] == pytest.approx(results[1]['loss'], rel=1e-6)
    assert results[0]['digest'] == pytest.approx(results[1]['digest'],
                                                 rel=1e-6)

    # single-process equivalent on the same global batch and mesh size
    import jax
    from jax.sharding import Mesh
    order = worker.global_order(NPROCS)
    make_ds = (worker.make_det_global_dataset if suite == 'det'
               else worker.make_global_dataset)
    run_fn = (worker.run_det_step_on_mesh if suite == 'det'
              else worker.run_step_on_mesh)
    ds = make_ds()
    global_batch = type(ds)(*[a[order] for a in ds])
    mesh = Mesh(np.array(jax.devices()[:2 * NPROCS]), ('data',))
    loss, digest, parts = run_fn(mesh, global_batch, multiprocess=False)
    mp_parts = results[0].get('parts', {})
    diag = '\n'.join(
        f'{k}: single={parts.get(k)!r} multi={mp_parts.get(k)!r}'
        for k in sorted(set(parts) | set(mp_parts)))
    if suite == 'det':
        # The det step routes every pose-related loss through discrete
        # Monte Carlo choices (RSLM proposal argmin, AMIS resampling):
        # last-bit numeric differences between the single- and multi-
        # process compiles flip near-tie selections and amplify to ~1%
        # on those components. The sampling-free losses must still agree
        # tightly; the MC-routed total only loosely.
        for k in ('loss_cls', 'loss_rp', 'loss_centerness', 'loss_dim'):
            assert parts[k] == pytest.approx(mp_parts[k], rel=1e-3), \
                f'{k} mismatch\n{diag}'
        assert loss == pytest.approx(results[0]['loss'], rel=3e-2), diag
        assert digest == pytest.approx(results[0]['digest'], rel=1e-3), diag
    else:
        assert loss == pytest.approx(results[0]['loss'], rel=2e-4), diag
        assert digest == pytest.approx(results[0]['digest'], rel=2e-5), diag
