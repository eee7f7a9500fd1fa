"""Demo-notebook parity: our fit_identity vs the reference torch recipe.

The committed artifact (fit_identity_parity.json, 4096x3 epochs) pins
torch MTE/MOE 0.366/2.138 vs jax 0.375/2.077 — within 3%. This slow
test re-derives a smaller version of the same comparison so regressions
in either the demo or the core trip CI.
"""

import os
import sys

import pytest

torch = pytest.importorskip('torch')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))
sys.path.insert(0, os.path.join(REPO, 'demo'))

pytestmark = pytest.mark.skipif(
    not os.path.isdir('/root/reference/epropnp'),
    reason='reference checkout unavailable')


@pytest.mark.slow
def test_fit_identity_tracks_reference_recipe():
    from fit_identity_parity import run_torch
    import fit_identity as demo

    cfg = dict(n_data=1024, batch_size=256, n_epoch=2, noise=0.01)
    t = run_torch(cfg['n_data'], cfg['batch_size'], cfg['n_epoch'],
                  cfg['noise'], seed=0, verbose=False)
    j = demo.run(**cfg, seed=0, verbose=False)
    # 8 steps is early training: generous ratio + absolute slack, the
    # committed 48-step artifact shows ~1.0x on both metrics
    assert j['mean_orient_err'] < 1.5 * t['mean_orient_err'] + 0.3, (j, t)
    assert j['mean_trans_err'] < 1.5 * t['mean_trans_err'] + 0.1, (j, t)
