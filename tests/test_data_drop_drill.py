"""Data-drop drill: drive the real CLIs against on-disk dataset trees.

VERDICT-r4 missing #1 / next #5: every transform was unit-tested but the
on-disk ingestion paths (directory indexing, VOC background lists, PLY /
models_info parsing, nuScenes info-pickle + OC-cache layout) had never
been exercised end-to-end. These tests build tiny fake dataset trees in
the exact layouts the loaders document, then run the actual command-line
entry points as subprocesses — the same code path a user hits on first
real-data contact.

Reference layouts: EPro-PnP-6DoF/lib/datasets/lm.py:34-100 (LineMOD
tree + VOC2012 background list), EPro-PnP-Det/tools/data_converter/
nuscenes_converter.py:156-503 (info pickles + OC caches).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd=REPO, timeout=3000):
    env = os.environ.copy()
    env.setdefault('JAX_PLATFORMS', 'cpu')
    proc = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise AssertionError(
            f'CLI failed ({args}):\nSTDOUT:\n{proc.stdout[-4000:]}\n'
            f'STDERR:\n{proc.stderr[-4000:]}')
    return proc


def _write_voc_tree(root):
    """PASCAL-VOC layout with the diningtable list the reference reads."""
    import cv2
    jpeg = os.path.join(root, 'VOC2012', 'JPEGImages')
    lists = os.path.join(root, 'VOC2012', 'ImageSets', 'Main')
    os.makedirs(jpeg)
    os.makedirs(lists)
    r = np.random.default_rng(7)
    stems = []
    for i in range(3):
        stem = f'2008_{i:06d}'
        img = r.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(jpeg, stem + '.jpg'), img)
        stems.append(stem)
    with open(os.path.join(lists, 'diningtable_trainval.txt'), 'w') as f:
        # last entry labeled -1 must be EXCLUDED (reference filter)
        f.write(f'{stems[0]}  1\n{stems[1]}  1\n{stems[2]} -1\n')
    return [stems[0], stems[1]]


def _write_models_dir(root, info, cls='ape'):
    """models/models_info.txt (mm) + ascii PLY (mm), eval-path inputs."""
    from epropnp_tpu.sixdof import ref_constants as ref
    from epropnp_tpu.sixdof.synthetic import cuboid_surface
    mdir = os.path.join(root, 'models')
    os.makedirs(mdir, exist_ok=True)
    i = info[cls]
    with open(os.path.join(mdir, 'models_info.txt'), 'w') as f:
        f.write(f'{ref.OBJ2IDX[cls]}: diameter: {i["diameter"] * 1e3:.2f}, '
                f'min_x: {i["min_x"] * 1e3:.2f}, '
                f'min_y: {i["min_y"] * 1e3:.2f}, '
                f'min_z: {i["min_z"] * 1e3:.2f}, '
                f'size_x: {i["size_x"] * 1e3:.2f}, '
                f'size_y: {i["size_y"] * 1e3:.2f}, '
                f'size_z: {i["size_z"] * 1e3:.2f}\n')
    ext = np.array([i['size_x'], i['size_y'], i['size_z']]) / 2.0
    pts = cuboid_surface(ext.astype(np.float32), pts_per_face=6) * 1e3
    ply = os.path.join(mdir, f'obj_{ref.OBJ2IDX[cls]:02d}.ply')
    with open(ply, 'w') as f:
        f.write('ply\nformat ascii 1.0\n'
                f'element vertex {len(pts)}\n'
                'property float x\nproperty float y\nproperty float z\n'
                'end_header\n')
        for p in pts:
            f.write(f'{p[0]:.3f} {p[1]:.3f} {p[2]:.3f}\n')


def test_sixdof_cli_drill(tmp_path):
    """Fake LineMOD tree + VOC bg -> train_6dof CLI -> test_6dof CLI."""
    from epropnp_tpu.sixdof import synthetic
    data = str(tmp_path / 'lm')
    info = synthetic.generate_dataset(data, cls='ape', n_train=8, n_test=4,
                                      pts_per_face=24, seed=0)
    _write_models_dir(data, info)
    voc = str(tmp_path / 'voc')
    _write_voc_tree(voc)
    save = str(tmp_path / 'run')

    _run_cli(['tools/train_6dof.py', '--exp', 'epropnp_basic',
              '--data', data, '--save', save, '--smoke',
              '--batch-size', '4', '--epochs', '1',
              '--bg-dir', voc, '--change-bg-ratio', '1.0'])
    ckpt = os.path.join(save, 'latest.msgpack')
    assert os.path.isfile(ckpt), os.listdir(save)

    proc = _run_cli(['tools/test_6dof.py', '--exp', 'epropnp_basic',
                     '--data', data, '--checkpoint', ckpt, '--smoke',
                     '--batch-size', '4'])
    # the CLI prints a JSON metrics dict ending the stdout
    tail = proc.stdout[proc.stdout.index('{'):]
    metrics = json.loads(tail)
    assert any('add' in k.lower() for k in metrics), metrics


def test_nuscenes_converter_and_det_cli_drill(tmp_path, monkeypatch):
    """Fake devkit world -> REAL converter -> train_det -> test_det.

    Exercises: converter camera-frame geometry/truncation/velocity/OC
    caching, info-pickle + OC-pickle ingestion (parse_ann_info),
    image loading from the dataroot, the training CLI, checkpoint
    restore through init_detector, batched inference, multicam fusion,
    submission JSON, and the self-contained NDS evaluation.
    """
    import pickle
    import fake_nuscenes

    root = str(tmp_path / 'nusc')
    os.makedirs(root)
    fake_nuscenes.install(monkeypatch)
    # build the world on disk (images + lidar) as a side effect
    prefix = str(tmp_path / 'infos')
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    try:
        from nuscenes_converter import convert
        convert(root, 'v1.0-trainval', prefix, with_obj_points=True)
    finally:
        sys.path.pop(0)

    with open(prefix + '_train.pkl', 'rb') as f:
        train_infos = pickle.load(f)
    with open(prefix + '_val.pkl', 'rb') as f:
        val_infos = pickle.load(f)
    # 1 scene x 2 samples x 6 cams per split
    assert len(train_infos) == 12 and len(val_infos) == 12
    info = train_infos[0]
    assert os.path.isfile(os.path.join(root, info['img_path']))
    assert info['annotations'], 'converter kept no annotations'
    ann = info['annotations'][0]
    # camera-frame sanity: objects were authored 6-22 m in front
    assert 5.0 < ann['translation'][2] < 25.0
    assert 0.0 <= ann['truncation'] <= 1.0
    assert ann['category'] in ('car', 'truck', 'pedestrian')
    # OC caches exist and contain in-box lidar points
    assert os.path.isfile(info['oc_path'])
    with open(info['oc_path'], 'rb') as f:
        oc = pickle.load(f)
    assert len(oc['oc_list']) == len(info['annotations'])
    assert sum(len(o) for o in oc['oc_list']) > 0
    assert info['bike_racks'], 'bike-rack records missing'

    # ingest through the real dataset class
    from epropnp_tpu.det.nuscenes_dataset import NuScenes3DDataset
    ds = NuScenes3DDataset(prefix + '_train.pkl', img_prefix=root)
    gt = ds.parse_ann_info(ds.data_infos[0])
    assert len(gt['labels']) > 0
    assert 'x3d' in gt and len(gt['x3d']) == len(gt['labels'])

    save = str(tmp_path / 'run')
    _run_cli(['tools/train_det.py', '--config', 'smoke',
              '--ann', prefix + '_train.pkl', '--data', root,
              '--save', save, '--img-hw', '128', '256', '--no-crop'])
    ckpts = [f for f in os.listdir(save) if f.endswith('.msgpack')]
    assert ckpts, os.listdir(save)
    ckpt = os.path.join(
        save, 'latest.msgpack' if 'latest.msgpack' in ckpts else ckpts[0])

    out = str(tmp_path / 'eval')
    proc = _run_cli(['tools/test_det.py', '--config', 'smoke',
                     '--checkpoint', ckpt, '--ann', prefix + '_val.pkl',
                     '--data', root, '--out', out, '--batch-size', '2',
                     '--img-hw', '128', '256'])
    # submission JSON written with all val sample tokens
    subs = [f for f in os.listdir(out) if f.endswith('.json')]
    assert subs, os.listdir(out)
    with open(os.path.join(out, subs[0])) as f:
        sub = json.load(f)
    res_key = 'results' if 'results' in sub else next(iter(sub))
    assert len(sub[res_key]) == 2  # two val keyframes
    # metric printout: devkit 'NDS' or the self-contained 'nd_score'
    assert 'NDS' in proc.stdout or 'nd_score' in proc.stdout

    # flip-TTA path through the same CLI (was silently a no-op before
    # round 5; now it must execute the TTA inference graph end-to-end)
    out_tta = str(tmp_path / 'eval_tta')
    proc = _run_cli(['tools/test_det.py', '--config', 'smoke',
                     '--checkpoint', ckpt, '--ann', prefix + '_val.pkl',
                     '--data', root, '--out', out_tta, '--batch-size', '2',
                     '--img-hw', '128', '256', '--tta'])
    assert 'NDS' in proc.stdout or 'nd_score' in proc.stdout
    assert any(f.endswith('.json') for f in os.listdir(out_tta))

    # demo scripts against the same files (VERDICT-r4 §2.3 partial:
    # they were import-checked only, never driven end-to-end)
    import fake_nuscenes as fn
    vis = str(tmp_path / 'vis')
    _run_cli(['demo/infer_imgs.py', '--dir', os.path.join(root, 'samples'),
              '--checkpoint', ckpt, '--config', 'smoke',
              '--intrinsic', f'{fn.FOCAL},0,{fn.IMG_W / 2},'
                             f'0,{fn.FOCAL},{fn.IMG_H / 2},0,0,1',
              '--out', vis, '--score-thr', '0.0'])
    assert any(f.endswith('.png') or f.endswith('.jpg')
               for f in os.listdir(vis)), os.listdir(vis)
    seq = str(tmp_path / 'seq')
    _run_cli(['demo/infer_nuscenes_sequence.py',
              '--ann', prefix + '_val.pkl', '--data', root,
              '--checkpoint', ckpt, '--config', 'smoke',
              '--cam', 'CAM_FRONT', '--out', seq, '--max-frames', '2',
              '--score-thr', '0.0'])
    assert len(os.listdir(seq)) >= 1, os.listdir(seq)


def test_kitti_tree_ingestion_and_eval(tmp_path):
    """Fake KITTI label_2/calib/image_2 tree -> dataset -> AP eval."""
    import cv2
    from epropnp_tpu.det.kitti_dataset import (
        KITTI3DCarDataset, KITTI3DDataset)

    root = str(tmp_path / 'kitti')
    for sub in ('label_2', 'calib', 'image_2'):
        os.makedirs(os.path.join(root, sub))
    r = np.random.default_rng(11)
    n = 4
    for i in range(n):
        sid = f'{i:06d}'
        rows = []
        for j in range(2):
            x1, y1 = 100 + 80 * j, 120
            rows.append(
                f'Car 0.00 0 -1.57 {x1:.2f} {y1:.2f} {x1 + 60:.2f} '
                f'{y1 + 50:.2f} 1.53 1.63 3.88 '
                f'{-2 + 2 * j:.2f} 1.65 {8 + 3 * j:.2f} -1.56')
        rows.append('DontCare -1 -1 -10 0 0 30 30 -1 -1 -1 '
                    '-1000 -1000 -1000 -10')
        with open(os.path.join(root, 'label_2', sid + '.txt'), 'w') as f:
            f.write('\n'.join(rows) + '\n')
        p2 = '721.5 0 609.6 44.9 0 721.5 172.9 0.2 0 0 1 0.003'
        with open(os.path.join(root, 'calib', sid + '.txt'), 'w') as f:
            f.write('P0: ' + p2 + '\nP2: ' + p2 + '\n')
        cv2.imwrite(os.path.join(root, 'image_2', sid + '.png'),
                    r.integers(0, 255, (370, 1224, 3)).astype(np.uint8))
    # split file selects a subset
    split = str(tmp_path / 'train.txt')
    with open(split, 'w') as f:
        f.write('000000\n000001\n000002\n')

    ds = KITTI3DDataset(root)
    assert len(ds) == n
    ds_split = KITTI3DCarDataset(root, split_file=split)
    assert len(ds_split) == 3
    ann = ds.get_ann(0)
    assert (np.asarray(ann['name']) == 'Car').sum() == 2
    k = ds.get_calib(0)
    assert k.shape == (3, 3) and abs(k[0, 0] - 721.5) < 1e-6
    assert os.path.isfile(ds.image_path(0))

    # perfect detections (GT echoed with scores) -> near-perfect AP
    dts = []
    for i in range(len(ds_split)):
        gt = ds_split.get_ann(i)
        dt = {key: np.asarray(val) for key, val in gt.items()}
        keep = np.asarray(gt['name']) == 'Car'
        dt = {key: np.asarray(val)[keep] for key, val in dt.items()}
        dt['score'] = np.linspace(0.9, 0.8, keep.sum())
        dts.append(dt)
    out = ds_split.evaluate(dts, coco_style=True)
    assert out, 'empty eval output'
    # echoed-GT detections must score near-perfect AP on some Car metric
    car_aps = [v for key, v in out.items()
               if 'Car' in key and np.isscalar(v)]
    assert car_aps and max(car_aps) > 0.9, out


def test_linemod_voc_bg_ingestion(tmp_path):
    """LineMODDataset reads VOC-layout backgrounds and substitutes them."""
    import cv2
    from epropnp_tpu.sixdof import synthetic
    from epropnp_tpu.sixdof.config import SixDoFConfig
    from epropnp_tpu.sixdof.dataset import LineMODDataset

    data = str(tmp_path / 'lm')
    synthetic.generate_dataset(data, cls='ape', n_train=2, n_test=1,
                               pts_per_face=24, seed=1)
    voc = str(tmp_path / 'voc')
    kept = _write_voc_tree(voc)

    cfg = SixDoFConfig()
    ds = LineMODDataset(cfg, data, split='train', bg_dir=voc,
                        change_bg_ratio=1.0, seed=3)
    assert len(ds._bg_files) == 2  # the -1 entry is filtered out
    for p in ds._bg_files:
        assert os.path.basename(p).split('.')[0] in kept
        assert os.path.isfile(p)
    s = ds[0]  # runs change_bg with a VOC image (ratio 1.0)
    assert s.inp.shape == (cfg.dataiter.inp_res, cfg.dataiter.inp_res, 3)
    assert np.isfinite(s.inp).all()
