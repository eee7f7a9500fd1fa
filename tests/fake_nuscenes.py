"""A minimal in-memory nuScenes devkit double for the converter drill.

Implements exactly the API surface ``tools/nuscenes_converter.py``
touches — ``NuScenes`` record tables, global-frame ``get_boxes``,
``box_velocity``, the ``splits`` lists, and a ``pyquaternion.Quaternion``
stand-in — backed by a tiny generated world written to disk (camera PNGs
+ a LIDAR_TOP ``.bin``), so the REAL converter code runs end-to-end and
its pickles feed the real dataset/training/eval CLIs.

Install into ``sys.modules`` with :func:`install` before importing the
converter. Geometry is self-consistent: boxes are authored in each
camera's frame, lifted to the global frame through the same
ego/sensor chain the converter inverts.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np


# ----------------------------------------------------------- quaternions

def _q_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _q_to_mat(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])


class Quaternion:
    """pyquaternion.Quaternion double (list/tuple of [w, x, y, z])."""

    def __init__(self, elements=(1.0, 0.0, 0.0, 0.0), axis=None,
                 angle=None):
        if axis is not None:
            axis = np.asarray(axis, np.float64)
            axis = axis / np.linalg.norm(axis)
            half = 0.5 * float(angle)
            self.elements = np.concatenate(
                [[np.cos(half)], np.sin(half) * axis])
        elif isinstance(elements, Quaternion):
            self.elements = elements.elements.copy()
        else:
            self.elements = np.asarray(elements, np.float64)

    @property
    def rotation_matrix(self):
        return _q_to_mat(self.elements)

    @property
    def inverse(self):
        w, x, y, z = self.elements
        n = self.elements @ self.elements
        return Quaternion(np.array([w, -x, -y, -z]) / n)

    def __mul__(self, other):
        return Quaternion(_q_mul(self.elements, other.elements))


# ------------------------------------------------------------------ boxes

class Box:
    """nuscenes.utils.data_classes.Box double (mutable frame)."""

    def __init__(self, center, wlh, orientation, token=''):
        self.center = np.asarray(center, np.float64)
        self.wlh = np.asarray(wlh, np.float64)
        self.orientation = Quaternion(orientation)
        self.token = token

    @property
    def rotation_matrix(self):
        return self.orientation.rotation_matrix

    def translate(self, vec):
        self.center = self.center + np.asarray(vec, np.float64)

    def rotate(self, q):
        self.center = q.rotation_matrix @ self.center
        self.orientation = q * self.orientation

    def corners(self):
        w, l, h = self.wlh
        x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
        y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
        z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
        pts = self.rotation_matrix @ np.vstack([x, y, z])
        return pts + self.center[:, None]

    def copy(self):
        return Box(self.center, self.wlh, self.orientation, self.token)


class BoxVisibility:
    ALL = 3
    ANY = 1
    NONE = 0


def box_in_image(box, intrinsic, imsize, vis_level=BoxVisibility.ANY):
    corners = box.corners()
    if (corners[2] <= 0.1).all():
        return False
    uvw = intrinsic @ corners
    uv = uvw[:2] / np.maximum(uvw[2:], 1e-6)
    inside = ((uv[0] >= 0) & (uv[0] < imsize[0])
              & (uv[1] >= 0) & (uv[1] < imsize[1]) & (corners[2] > 0.1))
    return inside.any() if vis_level == BoxVisibility.ANY else inside.all()


# ------------------------------------------------------------ fake world

# camera yaw (about global z) per camera name; camera looks along its
# +z after the cam->ego base rotation below
_CAM_YAWS = {'CAM_FRONT': 0.0, 'CAM_FRONT_RIGHT': -0.96,
             'CAM_FRONT_LEFT': 0.96, 'CAM_BACK': np.pi,
             'CAM_BACK_LEFT': np.pi - 0.96, 'CAM_BACK_RIGHT': 0.96 - np.pi}
# cam->ego base: camera +z -> ego +x, +x -> -y(left-handed img x to ego
# right), +y -> -z; standard nuScenes front-cam orientation
_CAM_BASE = Quaternion(axis=(0, 0, 1), angle=-np.pi / 2) * Quaternion(
    axis=(1, 0, 0), angle=-np.pi / 2)

IMG_W, IMG_H = 256, 128
FOCAL = 160.0
_CATS = ('vehicle.car', 'vehicle.truck', 'human.pedestrian.adult')
_ATTRS = {'vehicle.car': 'vehicle.moving',
          'vehicle.truck': 'vehicle.parked',
          'human.pedestrian.adult': 'pedestrian.moving'}
_SIZES = {'vehicle.car': (1.9, 4.6, 1.7),       # (w, l, h)
          'vehicle.truck': (2.5, 7.0, 2.9),
          'human.pedestrian.adult': (0.7, 0.8, 1.8)}


class NuScenes:
    """In-memory record DB over a generated on-disk dataroot.

    Scenes: ``fake-scene-0`` (train split) and ``fake-scene-1`` (val),
    ``samples_per_scene`` keyframes each; every keyframe has all 6
    cameras + LIDAR_TOP. Objects are authored per camera at 6-22 m.
    """

    def __init__(self, version, dataroot, verbose=False,
                 samples_per_scene=2, seed=0):
        self.version = version
        self.dataroot = dataroot
        self._tables = dict(scene={}, sample={}, sample_data={},
                            calibrated_sensor={}, ego_pose={},
                            sample_annotation={}, attribute={},
                            visibility={})
        self.sample = []
        self._boxes_by_sd = {}
        self._velo = {}
        self._build(np.random.default_rng(seed), samples_per_scene)

    # -- devkit API ----------------------------------------------------
    def get(self, table, token):
        return self._tables[table][token]

    def get_boxes(self, sd_token):
        return [b.copy() for b in self._boxes_by_sd[sd_token]]

    def box_velocity(self, ann_token):
        return self._velo[ann_token].copy()

    # -- construction --------------------------------------------------
    def _add(self, table, token, rec):
        rec['token'] = token
        self._tables[table][token] = rec
        return rec

    def _build(self, rng, samples_per_scene):
        try:
            import cv2
        except ImportError:
            cv2 = None
        k = np.array([[FOCAL, 0, IMG_W / 2],
                      [0, FOCAL, IMG_H / 2], [0, 0, 1]], np.float64)
        for a_name in set(_ATTRS.values()):
            self._add('attribute', f'attr-{a_name}', dict(name=a_name))
        os.makedirs(os.path.join(self.dataroot, 'samples'), exist_ok=True)

        ann_counter = 0
        for si in range(2):
            scene_tok = f'scene-{si}'
            self._add('scene', scene_tok, dict(name=f'fake-scene-{si}'))
            for fi in range(samples_per_scene):
                samp_tok = f'sample-{si}-{fi}'
                ego_t = np.array([10.0 * si + 2.0 * fi, 1.0 * fi, 0.0])
                ego_q = Quaternion(axis=(0, 0, 1), angle=0.05 * fi)
                pose = self._add('ego_pose', f'pose-{samp_tok}', dict(
                    translation=ego_t.tolist(),
                    rotation=ego_q.elements.tolist()))
                sample = self._add('sample', samp_tok, dict(
                    scene_token=scene_tok, data={}, anns=[]))
                self.sample.append(sample)

                # one bike rack near the ego (exercises the eval filter)
                rack_tok = f'ann-rack-{samp_tok}'
                sample['anns'].append(rack_tok)
                self._add('sample_annotation', rack_tok, dict(
                    category_name='static_object.bicycle_rack',
                    translation=(ego_t + [3.0, 5.0, 0.5]).tolist(),
                    size=[2.0, 3.0, 1.0],
                    rotation=[1.0, 0, 0, 0],
                    attribute_tokens=[], visibility_token='4',
                    num_lidar_pts=5, num_radar_pts=0))
                self._velo[rack_tok] = np.zeros(3)

                lidar_pts = []
                for cam_i, (cam, yaw) in enumerate(_CAM_YAWS.items()):
                    cs_q = Quaternion(axis=(0, 0, 1), angle=yaw) * _CAM_BASE
                    cs_t = np.array([1.0, 0.0, 1.6])
                    cs = self._add(
                        'calibrated_sensor', f'cs-{samp_tok}-{cam}', dict(
                            translation=cs_t.tolist(),
                            rotation=cs_q.elements.tolist(),
                            camera_intrinsic=k.tolist()))
                    img_rel = os.path.join(
                        'samples', f'{cam}_{samp_tok}.png')
                    sd = self._add('sample_data', f'sd-{samp_tok}-{cam}',
                                   dict(filename=img_rel,
                                        width=IMG_W, height=IMG_H,
                                        calibrated_sensor_token=cs['token'],
                                        ego_pose_token=pose['token']))
                    sample['data'][cam] = sd['token']

                    # author 2 objects in THIS camera's frame
                    boxes, img = [], np.full(
                        (IMG_H, IMG_W, 3), 60, np.uint8)
                    for oi in range(2):
                        cat = _CATS[(cam_i + oi + fi) % len(_CATS)]
                        w, l, h = _SIZES[cat]
                        zc = 7.0 + 5.0 * oi + 1.5 * ((cam_i + fi) % 3)
                        xc = (-2.0 + 2.5 * oi + 0.5 * cam_i % 2) \
                            * zc / 10.0
                        cam_center = np.array([xc, 1.0, zc])
                        cam_yaw = rng.uniform(-np.pi, np.pi)
                        cam_q = Quaternion(axis=(0, 1, 0), angle=cam_yaw) \
                            * Quaternion(axis=(1, 0, 0), angle=-np.pi / 2)
                        # lift camera -> ego -> global
                        g_center = ego_q.rotation_matrix @ (
                            cs_q.rotation_matrix @ cam_center + cs_t) \
                            + ego_t
                        g_q = ego_q * cs_q * cam_q
                        ann_tok = f'ann-{ann_counter}'
                        ann_counter += 1
                        sample['anns'].append(ann_tok)
                        self._add('sample_annotation', ann_tok, dict(
                            category_name=cat,
                            translation=g_center.tolist(),
                            size=[w, l, h],
                            rotation=g_q.elements.tolist(),
                            attribute_tokens=[f'attr-{_ATTRS[cat]}'],
                            visibility_token='4',
                            num_lidar_pts=40, num_radar_pts=2))
                        self._velo[ann_tok] = np.array(
                            [0.5 * oi, 0.2, 0.0])
                        boxes.append(Box(g_center, [w, l, h], g_q,
                                         token=ann_tok))

                        # draw the projected box so images correlate
                        uvw = k @ cam_center
                        u, v = uvw[:2] / uvw[2]
                        s = int(FOCAL * h / zc / 2)
                        if cv2 is not None:
                            cv2.rectangle(
                                img, (int(u) - s, int(v) - s),
                                (int(u) + s, int(v) + s),
                                (int(50 + 60 * oi), 200, 90), -1)

                        # lidar points on the box surface, in global
                        n_pts = 60
                        local = (rng.uniform(-0.5, 0.5, (n_pts, 3))
                                 * np.array([l, w, h]) * 0.98)
                        gpts = local @ g_q.rotation_matrix.T + g_center
                        lidar_pts.append(gpts)
                    self._boxes_by_sd[sd['token']] = boxes
                    if cv2 is not None:
                        cv2.imwrite(os.path.join(self.dataroot, img_rel),
                                    img)

                # LIDAR_TOP: identity lidar extrinsics; cloud stored in
                # the lidar frame = ego frame here
                lid_rel = os.path.join('samples', f'LIDAR_{samp_tok}.bin')
                lid_cs = self._add(
                    'calibrated_sensor', f'cs-{samp_tok}-lidar',
                    dict(translation=[0.0, 0.0, 0.0],
                         rotation=[1.0, 0, 0, 0], camera_intrinsic=[]))
                lid_sd = self._add('sample_data', f'sd-{samp_tok}-lidar',
                                   dict(filename=lid_rel, width=0, height=0,
                                        calibrated_sensor_token=
                                        lid_cs['token'],
                                        ego_pose_token=pose['token']))
                sample['data']['LIDAR_TOP'] = lid_sd['token']
                pts_g = np.concatenate(lidar_pts, axis=0)
                # global -> ego(=lidar) frame
                pts_l = (pts_g - ego_t) @ ego_q.rotation_matrix
                cloud = np.zeros((len(pts_l), 5), np.float32)
                cloud[:, :3] = pts_l
                cloud.tofile(os.path.join(self.dataroot, lid_rel))


def install(monkeypatch=None):
    """Register fake ``nuscenes`` + ``pyquaternion`` in sys.modules."""
    nusc_mod = types.ModuleType('nuscenes')
    nusc_mod.NuScenes = NuScenes
    utils_mod = types.ModuleType('nuscenes.utils')
    splits_mod = types.ModuleType('nuscenes.utils.splits')
    splits_mod.train = ['fake-scene-0']
    splits_mod.val = ['fake-scene-1']
    splits_mod.mini_train = ['fake-scene-0']
    splits_mod.mini_val = ['fake-scene-1']
    geom_mod = types.ModuleType('nuscenes.utils.geometry_utils')
    geom_mod.box_in_image = box_in_image
    geom_mod.BoxVisibility = BoxVisibility
    utils_mod.splits = splits_mod
    utils_mod.geometry_utils = geom_mod
    nusc_mod.utils = utils_mod
    pyq_mod = types.ModuleType('pyquaternion')
    pyq_mod.Quaternion = Quaternion
    mods = {'nuscenes': nusc_mod, 'nuscenes.utils': utils_mod,
            'nuscenes.utils.splits': splits_mod,
            'nuscenes.utils.geometry_utils': geom_mod,
            'pyquaternion': pyq_mod}
    if monkeypatch is not None:
        for name, mod in mods.items():
            monkeypatch.setitem(sys.modules, name, mod)
    else:
        sys.modules.update(mods)
    return mods
