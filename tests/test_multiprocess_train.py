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
import subprocess
import sys
import tempfile

import numpy as np
import pytest

import _mp_train_worker as worker

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROCS = 2
PORT = '19753'


def test_host_shards_disjoint_cover():
    idx = [worker.host_indices(NPROCS, h) for h in range(NPROCS)]
    flat = np.concatenate(idx)
    assert len(flat) == worker.GLOBAL_SAMPLES
    assert sorted(flat.tolist()) == list(range(worker.GLOBAL_SAMPLES))


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env.pop('PYTEST_CURRENT_TEST', None)
    script = os.path.join(REPO_ROOT, 'tests', '_mp_train_worker.py')
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(NPROCS), PORT,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(NPROCS)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
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
    ds = worker.make_global_dataset()
    global_batch = type(ds)(*[a[order] for a in ds])
    mesh = Mesh(np.array(jax.devices()[:2 * NPROCS]), ('data',))
    loss, digest = worker.run_step_on_mesh(mesh, global_batch,
                                           multiprocess=False)
    assert loss == pytest.approx(results[0]['loss'], rel=2e-4)
    assert digest == pytest.approx(results[0]['digest'], rel=2e-5)
