"""6DoF evaluation loop driver (structure smoke with a stub dataset)."""

import numpy as np
import jax
import jax.numpy as jnp

from epropnp_tpu.sixdof import main as main_lib
from epropnp_tpu.sixdof.dataset import Sample
from test_sixdof_train import tiny_cfg


class StubTestDataset:
    classes = ['ape', 'cat']

    def __init__(self, n=4, inp_res=64, out_res=16):
        r = np.random.default_rng(0)
        self.samples = []
        for i in range(n):
            rot = np.eye(3)
            t = np.array([0.02 * i, -0.01, 0.6 + 0.1 * i])
            self.samples.append(Sample(
                obj=self.classes[i % 2], obj_id=1 + (i % 2),
                inp=r.random((inp_res, inp_res, 3)).astype(np.float32),
                target_coor=np.zeros((out_res, out_res, 3), np.float32),
                mask=np.ones((out_res, out_res), np.float32),
                loss_msk=np.ones((out_res, out_res, 3), np.float32),
                trans_local=np.zeros(3, np.float32),
                pose=np.concatenate([rot, t[:, None]], 1).astype(np.float32),
                c_box=np.array([300., 240.], np.float32),
                s_box=120.0,
                box=np.array([260., 200., 80., 80.], np.float32)))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    def min_extents(self, cls):
        return np.full(3, 0.05, np.float32)


def test_test_loop_structure():
    cfg = tiny_cfg()
    model, _, tx, _ = main_lib.build_all(cfg)
    state = main_lib.init_state(cfg, model, tx)
    ds = StubTestDataset()
    pts = np.random.default_rng(1).uniform(-.05, .05, (50, 3))
    models = {c: pts for c in ds.classes}
    diameters = {c: 0.1 for c in ds.classes}
    metrics = main_lib.test_loop(cfg, ds, state, models, diameters,
                                 init='rslm', batch_size=4)
    assert set(metrics) == {'pose', 'add', 'arp_2d'}
    assert 'mean' in metrics['add']
    for key in ('0.02', '0.05', '0.10', 'auc'):
        assert np.isfinite(metrics['add']['mean'][key])


def test_test_loop_cache_roundtrip_and_density(tmp_path):
    """Prediction caching (ref lib/test.py:44-74): a second run loads the
    .npz instead of running inference and reproduces identical metrics;
    the orientation-density hook (ref :218-225) writes one image per
    sample."""
    cfg = tiny_cfg()
    model, _, tx, _ = main_lib.build_all(cfg)
    state = main_lib.init_state(cfg, model, tx)
    ds = StubTestDataset()
    pts = np.random.default_rng(1).uniform(-.05, .05, (50, 3))
    models = {c: pts for c in ds.classes}
    diameters = {c: 0.1 for c in ds.classes}
    cache = str(tmp_path / 'preds.npz')
    dens_dir = str(tmp_path / 'density')
    m1 = main_lib.test_loop(cfg, ds, state, models, diameters,
                            init='rslm', batch_size=4, cache_file=cache,
                            orient_density_dir=dens_dir)
    assert len(list((tmp_path / 'density').glob('*.png'))) == len(ds)

    class Exploding(StubTestDataset):
        def __getitem__(self, i):
            raise AssertionError('cache hit must skip inference')

    m2 = main_lib.test_loop(cfg, Exploding(), state, models, diameters,
                            init='rslm', batch_size=4, cache_file=cache)
    assert m1['add']['mean'] == m2['add']['mean']
