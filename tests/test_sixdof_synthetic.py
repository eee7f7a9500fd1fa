"""Synthetic LineMOD-format scene generator (sixdof/synthetic.py).

Checks the generator's geometric self-consistency — the rendered coord
map must reproject onto its own pixels under the written pose — and the
round trip through the real LineMODDataset pipeline.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from epropnp_tpu.sixdof import ref_constants as ref  # noqa: E402
from epropnp_tpu.sixdof import synthetic  # noqa: E402


def test_render_frame_reprojection_consistency():
    rng = np.random.default_rng(0)
    ext = np.array([0.038, 0.039, 0.046], np.float32)
    pts = synthetic.cuboid_surface(ext, 64)
    rot, trans = synthetic.random_pose(rng)
    fr = synthetic.render_frame(pts, ext, rot, trans, rng=rng, noise=0.0)
    msk = fr['mask'] > 0
    assert msk.sum() > 500
    ys, xs = np.nonzero(msk)
    coords = fr['coord'][ys, xs]                     # object coords
    cam = coords @ rot.T + trans[None]
    uvw = cam @ ref.CAMERA_MATRIX.T
    uv = uvw[:, :2] / uvw[:, 2:]
    # each filled pixel's stored coordinate projects back onto it
    err = np.abs(uv - np.stack([xs, ys], -1))
    assert np.median(err) < 1.0, np.median(err)
    assert np.percentile(err, 95) < 2.0
    # RGB encodes the NOC
    noc = coords / ext[None]
    rgb = fr['rgb'][ys, xs].astype(np.float32) / 255.0
    assert np.abs(rgb - (noc * 0.5 + 0.5)).mean() < 0.02
    # box covers the mask
    x, y, w, h = fr['box']
    assert x <= xs.min() and x + w > xs.max()
    assert y <= ys.min() and y + h > ys.max()


def test_generate_dataset_roundtrip(tmp_path):
    from epropnp_tpu.sixdof.config import DataIterConfig, SixDoFConfig
    from epropnp_tpu.sixdof.dataset import LineMODDataset, collate

    info = synthetic.generate_dataset(str(tmp_path), cls='ape', n_train=3,
                                      n_test=2, pts_per_face=48)
    assert info['ape']['diameter'] > 0
    cfg = SixDoFConfig(dataiter=DataIterConfig(inp_res=64, out_res=16,
                                               sample_points=32))
    ds = LineMODDataset(cfg, str(tmp_path), split='train', classes=['ape'],
                        model_info=info)
    assert len(ds) == 3
    s = ds[0]
    assert s.inp.shape == (64, 64, 3) and s.inp.max() <= 1.0
    assert s.target_coor.shape == (16, 16, 3)
    # normalized coords stay in ~[-1, 1] where masked
    masked = s.target_coor[s.mask > 0]
    assert np.abs(masked).max() < 1.5
    assert np.isfinite(s.trans_local).all()
    batch = collate([ds[i] for i in range(3)],
                    {'ape': ds.min_extents('ape')})
    assert batch.inp.shape == (3, 64, 64, 3)
    assert batch.pose.shape == (3, 3, 4)

    test_ds = LineMODDataset(cfg, str(tmp_path), split='test',
                             classes=['ape'], model_info=info)
    assert len(test_ds) == 2
