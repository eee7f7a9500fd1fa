"""Offline nuScenes converter: devkit records -> per-camera info pickles.

Counterpart of the reference converter
(EPro-PnP-Det/tools/data_converter/nuscenes_converter.py:156-503): walks
the scenes, emits one info dict per camera sample with image path,
intrinsics, sensor/ego calibration, parsed annotations (visibility,
truncation from projected-corner clipping, attributes, velocity in the
camera frame), and optionally caches lidar object-coordinate points per
box (the ``loss_regr`` supervision).

Requires the nuscenes devkit; the output format is consumed by
``epropnp_tpu.det.nuscenes_dataset.NuScenes3DDataset``.

  python tools/nuscenes_converter.py --root /data/nuscenes \
      --version v1.0-trainval --out infos
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAMS = ('CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_FRONT_LEFT', 'CAM_BACK',
        'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')


def convert(root: str, version: str, out_prefix: str,
            with_obj_points: bool = False, max_sweeps: int = 0):
    try:
        from nuscenes import NuScenes
        from nuscenes.utils import splits
        from nuscenes.utils.geometry_utils import box_in_image, BoxVisibility
    except ImportError as e:
        raise SystemExit(
            'The nuScenes devkit is required for conversion '
            '(pip install nuscenes-devkit on a machine with network '
            f'access): {e}')

    nusc = NuScenes(version=version, dataroot=root, verbose=True)
    if version.endswith('mini'):
        train_scenes, val_scenes = splits.mini_train, splits.mini_val
    else:
        train_scenes, val_scenes = splits.train, splits.val

    infos = {'train': [], 'val': []}
    for sample in nusc.sample:
        scene_name = nusc.get('scene', sample['scene_token'])['name']
        split = ('train' if scene_name in train_scenes
                 else 'val' if scene_name in val_scenes else None)
        if split is None:
            continue
        # global-frame bike-rack boxes of this sample: the devkit's
        # filter_eval_boxes drops bicycle/motorcycle eval boxes centered
        # inside one (nuscenes/eval/common/loaders.py); the self-contained
        # evaluator reproduces that from these records
        bike_racks = []
        for ann_token in sample['anns']:
            ann = nusc.get('sample_annotation', ann_token)
            if ann['category_name'] == 'static_object.bicycle_rack':
                bike_racks.append(dict(
                    translation=[float(v) for v in ann['translation']],
                    size=[float(v) for v in ann['size']],
                    rotation=[float(v) for v in ann['rotation']]))
        for cam in CAMS:
            sd = nusc.get('sample_data', sample['data'][cam])
            cs = nusc.get('calibrated_sensor',
                          sd['calibrated_sensor_token'])
            pose = nusc.get('ego_pose', sd['ego_pose_token'])
            boxes = nusc.get_boxes(sd['token'])
            k = np.asarray(cs['camera_intrinsic'])
            anns = []
            kept_boxes = []  # camera-frame boxes, aligned with anns
            for box in boxes:
                ann = nusc.get('sample_annotation', box.token)
                vis = int(ann['visibility_token'])
                # into the camera frame
                from pyquaternion import Quaternion
                box.translate(-np.array(pose['translation']))
                box.rotate(Quaternion(pose['rotation']).inverse)
                box.translate(-np.array(cs['translation']))
                box.rotate(Quaternion(cs['rotation']).inverse)
                if box.center[2] < 0.1:
                    continue
                corners = box.corners()
                uvw = k @ corners
                uv = uvw[:2] / uvw[2:]
                x1, y1 = uv.min(axis=1)
                x2, y2 = uv.max(axis=1)
                w_img, h_img = sd['width'], sd['height']
                bx1, by1 = max(x1, 0), max(y1, 0)
                bx2, by2 = min(x2, w_img), min(y2, h_img)
                if bx2 <= bx1 or by2 <= by1:
                    continue
                area = (x2 - x1) * (y2 - y1)
                trunc = 1.0 - (bx2 - bx1) * (by2 - by1) / max(area, 1e-6)
                attrs = [nusc.get('attribute', t)['name']
                         for t in ann['attribute_tokens']]
                # velocity: global frame -> CAMERA frame, store (vx, vz)
                # (reference nuscenes_converter.py:364-370: cam_velo3d =
                # global_velo3d @ inv(e2g_R).T @ inv(c2e_R).T, [0::2])
                velo_g = nusc.box_velocity(box.token)
                e2g_r = Quaternion(pose['rotation']).rotation_matrix
                s2e_r = Quaternion(cs['rotation']).rotation_matrix
                velo_cam = np.array([velo_g[0], velo_g[1], 0.0]) \
                    @ np.linalg.inv(e2g_r).T @ np.linalg.inv(s2e_r).T
                anns.append(dict(
                    category=_category(ann['category_name']),
                    bbox=[float(bx1), float(by1), float(bx2), float(by2)],
                    translation=[float(v) for v in box.center],
                    size=[float(v) for v in box.wlh],
                    rotation=[float(v) for v in box.orientation.elements],
                    velocity=[float(velo_cam[0]), float(velo_cam[2])],
                    attribute=attrs[0] if attrs else '',
                    visibility=vis,
                    truncation=float(trunc),
                    # for the self-contained evaluator: cross-camera GT
                    # dedup + the devkit's num_pts>0 GT filter
                    ann_token=box.token,
                    num_pts=int(ann['num_lidar_pts'])
                    + int(ann['num_radar_pts'])))
                kept_boxes.append(box)
            info = dict(
                img_path=sd['filename'],
                cam_id=CAMS.index(cam),
                sample_token=sample['token'],
                cam_intrinsic=k.tolist(),
                sensor2ego_rotation=cs['rotation'],
                sensor2ego_translation=cs['translation'],
                ego2global_rotation=pose['rotation'],
                ego2global_translation=pose['translation'],
                annotations=anns,
                bike_racks=bike_racks,
                version=version)
            if with_obj_points:
                info['oc_path'] = _write_obj_points(
                    nusc, sample, sd, cs, pose, k, kept_boxes,
                    out_prefix)
            infos[split].append(info)
    for split, data in infos.items():
        path = f'{out_prefix}_{split}.pkl'
        with open(path, 'wb') as f:
            pickle.dump(data, f)
        print(f'{split}: {len(data)} camera samples -> {path}')


def _write_obj_points(nusc, sample, cam_sd, cam_cs, cam_pose, k,
                      kept_boxes, out_prefix):
    """Cache per-object lidar points as object-frame coords + projections.

    Counterpart of the reference ``get_obj_crd``
    (EPro-PnP-Det/tools/data_converter/nuscenes_converter.py:468-503):
    the keyframe LIDAR_TOP cloud is chained lidar->ego->global->ego->cam
    (the two ego poses differ by the sensor timestamps), projected with
    the camera intrinsics, masked to the canvas, and for each kept
    annotation the in-box points are stored in the BOX frame (``oc``)
    alongside their image projections (``uv``). The per-image pickle path
    is recorded as ``oc_path`` in the info dict; it feeds ``loss_regr``
    via ``NuScenes3DDataset.parse_ann_info``.
    """
    from pyquaternion import Quaternion
    lid_sd = nusc.get('sample_data', sample['data']['LIDAR_TOP'])
    lid_cs = nusc.get('calibrated_sensor',
                      lid_sd['calibrated_sensor_token'])
    lid_pose = nusc.get('ego_pose', lid_sd['ego_pose_token'])
    pts = np.fromfile(os.path.join(nusc.dataroot, lid_sd['filename']),
                      np.float32).reshape(-1, 5)[:, :3]
    # lidar -> ego(lidar ts) -> global -> ego(cam ts) -> camera
    pts = pts @ Quaternion(lid_cs['rotation']).rotation_matrix.T \
        + np.asarray(lid_cs['translation'])
    pts = pts @ Quaternion(lid_pose['rotation']).rotation_matrix.T \
        + np.asarray(lid_pose['translation'])
    pts = (pts - np.asarray(cam_pose['translation'])) \
        @ Quaternion(cam_pose['rotation']).rotation_matrix
    pts = (pts - np.asarray(cam_cs['translation'])) \
        @ Quaternion(cam_cs['rotation']).rotation_matrix
    in_front = pts[:, 2] > 0.1
    pts = pts[in_front]
    uvz = pts @ np.asarray(k).T
    uv = uvz[:, :2] / uvz[:, 2:]
    w_img, h_img = cam_sd['width'], cam_sd['height']
    in_canvas = ((uv >= -0.5)
                 & (uv < np.array([w_img, h_img]) - 0.5)).min(axis=1)
    pts, uv = pts[in_canvas], uv[in_canvas]

    oc_list, uv_list = [], []
    for box in kept_boxes:
        oc = (pts - box.center) @ box.rotation_matrix
        w, l, h = box.wlh
        ub = np.array([l / 2, w / 2, h / 2])
        mask = ((oc >= -ub) & (oc <= ub)).min(axis=1)
        oc_list.append(oc[mask].astype(np.float32))
        uv_list.append(uv[mask].astype(np.float32))

    oc_dir = f'{out_prefix}_oc'
    os.makedirs(oc_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(cam_sd['filename']))[0]
    path = os.path.join(oc_dir, name + '__OC.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(oc_list=oc_list, uv_list=uv_list), f)
    return path


_CATEGORY_MAP = {
    'vehicle.car': 'car', 'vehicle.truck': 'truck',
    'vehicle.trailer': 'trailer', 'vehicle.bus': 'bus',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.bicycle': 'bicycle', 'vehicle.motorcycle': 'motorcycle',
    'human.pedestrian': 'pedestrian',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.barrier': 'barrier',
}


def _category(name: str) -> str:
    for prefix, cls in _CATEGORY_MAP.items():
        if name.startswith(prefix):
            return cls
    return name


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--root', required=True)
    p.add_argument('--version', default='v1.0-trainval')
    p.add_argument('--out', default='nuscenes_infos')
    p.add_argument('--with-obj-points', action='store_true')
    args = p.parse_args()
    convert(args.root, args.version, args.out, args.with_obj_points)


if __name__ == '__main__':
    main()
