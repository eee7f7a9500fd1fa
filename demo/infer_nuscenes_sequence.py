"""Run Det-suite inference over a nuScenes camera sequence and render a
side-by-side image + BEV video directory.

Counterpart of the reference demo/infer_nuscenes_sequence.py:27-72.

  python demo/infer_nuscenes_sequence.py --ann val_infos.pkl \
      --data /data/nuscenes --checkpoint ck.msgpack --cam CAM_FRONT \
      --out seq_vis/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--ann', required=True)
    p.add_argument('--data', default='')
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--config', default='basic',
                   choices=['basic', 'coord_regr', 'v1b', 'smoke'])
    p.add_argument('--cam', default='CAM_FRONT')
    p.add_argument('--out', default='seq_vis')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--max-frames', type=int, default=100)
    args = p.parse_args()

    import numpy as np
    import cv2
    from epropnp_tpu.det.api import init_detector, inference_detector
    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.det.nuscenes_dataset import CAMS, NuScenes3DDataset
    from epropnp_tpu.visualization import draw_box_3d_pred, show_bev

    cfg = getattr(DetConfig, args.config)()
    if not os.path.isfile(args.ann):
        p.error(f'annotation file not found: {args.ann}')
    dataset = NuScenes3DDataset(args.ann, img_prefix=args.data)
    cam_id = CAMS.index(args.cam)
    infos = [i for i in dataset.data_infos
             if i.get('cam_id', 0) == cam_id][:args.max_frames]
    if not infos:
        p.error(f'no {args.cam} frames in {args.ann}')

    first = cv2.imread(os.path.join(args.data, infos[0]['img_path']))
    # init at the post-crop geometry (inference_detector auto-applies
    # the reference sky-band crop to full nuScenes frames)
    from epropnp_tpu.det.pipelines import REFERENCE_CROP_BOX as _CB
    hw = first.shape[:2]
    if hw[0] >= _CB[3] and hw[1] >= _CB[2]:
        hw = (_CB[3] - _CB[1], _CB[2] - _CB[0])
    model, variables = init_detector(cfg, args.checkpoint, img_hw=hw)
    os.makedirs(args.out, exist_ok=True)
    # jit once; reused across frames (shapes are constant per sequence)
    import jax
    from epropnp_tpu.det import test as dtest
    infer_fn = jax.jit(dtest.make_inference_fn(model, cfg))
    for fi, info in enumerate(infos):
        img = cv2.imread(os.path.join(args.data, info['img_path']))
        k = np.asarray(info['cam_intrinsic'])
        _, out3d = inference_detector(model, variables, cfg,
                                      [img[..., ::-1]], [k],
                                      infer_fn=infer_fn)
        boxes, labels = [], []
        for c, arr in enumerate(out3d[0]):
            for row in arr:
                if row[7] >= args.score_thr:
                    boxes.append(row[:7])
                    labels.append(c)
        if boxes:
            boxes = np.stack(boxes)
            labels = np.asarray(labels)
            vis = draw_box_3d_pred(img, boxes, k, labels)
            bev = show_bev(boxes, labels)
        else:
            vis = img
            bev = np.full((600, 600, 3), 245, np.uint8)
        h = vis.shape[0]
        bev = cv2.resize(bev, (h, h))
        cv2.imwrite(os.path.join(args.out, f'{fi:05d}.jpg'),
                    np.concatenate([vis, bev], axis=1))
        print(f'\rframe {fi + 1}/{len(infos)}', end='')
    print(f'\nwrote {len(infos)} frames to {args.out}/')


if __name__ == '__main__':
    main()
