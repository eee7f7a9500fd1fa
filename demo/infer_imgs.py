"""Run Det-suite inference on a folder of images and save visualizations.

Counterpart of the reference demo/infer_imgs.py:15-42.

  python demo/infer_imgs.py --dir imgs/ --checkpoint ck.msgpack \
      --intrinsic "1260,0,800,0,1260,450,0,0,1" --out vis/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dir', required=True)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--config', default='basic',
                   choices=['basic', 'coord_regr', 'v1b', 'smoke'])
    p.add_argument('--intrinsic', required=True,
                   help='9 comma-separated values of K, row major')
    p.add_argument('--out', default='vis')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import numpy as np
    import cv2
    from epropnp_tpu.det.api import init_detector, inference_detector
    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.visualization import draw_box_3d_pred, show_bev

    if not os.path.isdir(args.dir):
        p.error(f'image directory not found: {args.dir}')
    k = np.asarray([float(v) for v in args.intrinsic.split(',')]).reshape(3, 3)
    cfg = getattr(DetConfig, args.config)()
    files = sorted(
        f for f in os.listdir(args.dir)
        if f.lower().endswith(('.jpg', '.png', '.jpeg')))
    if not files:
        p.error(f'no images in {args.dir}')
    first = cv2.imread(os.path.join(args.dir, files[0]))
    # init at the post-crop geometry (inference_detector auto-applies
    # the reference sky-band crop to full nuScenes frames)
    from epropnp_tpu.det.pipelines import REFERENCE_CROP_BOX as _CB
    hw = first.shape[:2]
    if hw[0] >= _CB[3] and hw[1] >= _CB[2]:
        hw = (_CB[3] - _CB[1], _CB[2] - _CB[0])
    model, variables = init_detector(cfg, args.checkpoint, img_hw=hw)

    os.makedirs(args.out, exist_ok=True)
    # jit once; reused across frames (shapes are constant per folder)
    import jax
    from epropnp_tpu.det import test as dtest
    infer_fn = jax.jit(dtest.make_inference_fn(model, cfg))
    for fn in files:
        img = cv2.imread(os.path.join(args.dir, fn))
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
            img_vis = draw_box_3d_pred(img, boxes, k, labels)
            bev = show_bev(boxes, labels)
        else:
            img_vis, bev = img, np.full((600, 600, 3), 245, np.uint8)
        cv2.imwrite(os.path.join(args.out, fn), img_vis)
        cv2.imwrite(os.path.join(args.out, 'bev_' + fn), bev)
        print(f'{fn}: {len(labels) if len(boxes) else 0} detections')


if __name__ == '__main__':
    main()
