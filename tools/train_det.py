"""CLI: train the Det suite on nuScenes.

  python tools/train_det.py --config basic --ann train_infos.pkl \
      --data /path/to/nuscenes --save runs/det_basic --data-parallel
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epropnp_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--config', default='basic',
                   choices=['basic', 'coord_regr', 'coord_regr_trainval',
                            'no_reproj', 'v1b', 'v1b_220312', 'smoke'])
    p.add_argument('--ann', required=True, nargs='+',
                   help='converter pickle(s); pass train+val for trainval')
    p.add_argument('--data', default='', help='nuScenes dataroot')
    p.add_argument('--save', default='runs/det')
    p.add_argument('--resume-from', default=None)
    p.add_argument('--load-torch', default=None,
                   help='torch checkpoint to graft before training: '
                        'torchvision ImageNet ResNet (the reference '
                        'init_cfg=Pretrained torchvision://resnet101), '
                        'an mmdet backbone+neck file, or a full released '
                        'EPro-PnP-Det checkpoint')
    p.add_argument('--data-parallel', action='store_true')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--img-hw', type=int, nargs=2, default=(672, 1600),
                   help='post-crop geometry (reference: 1600x900 sky-'
                        'cropped to 1600x672)')
    p.add_argument('--no-crop', action='store_true',
                   help='disable the reference Crop3D sky-band crop')
    args = p.parse_args()

    import dataclasses
    import numpy as np
    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.det.main import train_loop
    from epropnp_tpu.det.nuscenes_dataset import NuScenes3DDataset
    from epropnp_tpu.det.pipelines import (
        REFERENCE_CROP_BOX, collate_det_batch, default_pipeline)
    try:
        import cv2
    except ImportError:
        p.error('cv2 required')

    cfg = getattr(DetConfig, args.config)()
    if args.load_torch:
        # checkpoints trained with mmcv DCN (conv_offset keys present)
        # need exact DCNv2 modulation; plain torchvision files keep the
        # identity-like from-scratch scale
        from epropnp_tpu.utils.torch_convert import load_torch_state_dict
        if any('conv_offset' in k for k in
               load_torch_state_dict(args.load_torch)):
            cfg = dataclasses.replace(cfg, dcn_modulation_scale=1.0)
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch_size))
    dataset = NuScenes3DDataset(args.ann, img_prefix=args.data)
    if len(dataset) == 0:
        p.error(f'no samples in {args.ann}')
    bs = cfg.train.batch_size
    steps = max(len(dataset) // bs, 1)
    max_gt = cfg.train.max_gt_per_img

    def load_sample(j, rng):
        info = dataset.data_infos[j]
        img = cv2.imread(
            os.path.join(args.data, info['img_path']))[..., ::-1]
        gt = dataset.parse_ann_info(info)
        s = dict(img=img,
                 cam_intrinsic=np.asarray(info['cam_intrinsic']),
                 gt_bboxes=gt['bboxes'], gt_labels=gt['labels'],
                 gt_bboxes_3d=gt['bboxes_3d'], gt_velo=gt['velos'],
                 gt_attr=gt['attrs'],
                 gt_bboxes_ignore=gt['bboxes_ignore'],
                 truncation=gt['truncation'])
        if 'x3d' in gt:
            s.update(gt_x3d=gt['x3d'], gt_x2d=gt['x2d'])
        # returns None when the crop leaves no valid GT (reference
        # allow_negative_crop=False skips such samples)
        return default_pipeline(
            s, rng, training=True,
            crop_box=None if args.no_crop else REFERENCE_CROP_BOX)

    def batch_iter(epoch):
        rng = np.random.default_rng(epoch)
        order = iter(rng.permutation(len(dataset)))
        for _ in range(steps):
            samples, attempts = [], 0
            while len(samples) < bs:
                attempts += 1
                if attempts > 100 * bs:
                    raise RuntimeError(
                        'every drawn sample was dropped by the pipeline '
                        '(no valid GT after the crop) — check annotations')
                j = next(order, None)
                if j is None:  # backfill dropped samples: fixed batch
                    j = int(rng.integers(len(dataset)))
                s = load_sample(j, rng)
                if s is not None:
                    samples.append(s)
            yield collate_det_batch(
                samples, max_gt,
                max_pts=128 if cfg.with_loss_regr else 0)

    train_loop(cfg, batch_iter, steps, args.save, img_hw=tuple(args.img_hw),
               resume_from=args.resume_from,
               data_parallel=args.data_parallel,
               load_torch=args.load_torch)


if __name__ == '__main__':
    main()
