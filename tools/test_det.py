"""CLI: evaluate the Det suite on nuScenes (fusion + submission + NDS).

Counterpart of the reference root ``test.py``/``tools/test.py``.

  python tools/test_det.py --config basic --checkpoint ck.msgpack \
      --ann val_infos.pkl --data /path/to/nuscenes --out runs/eval
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
                   choices=['basic', 'coord_regr', 'v1b', 'smoke'])
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--ann', required=True, help='converter pickle')
    p.add_argument('--data', default='', help='nuScenes dataroot')
    p.add_argument('--out', default='runs/det_eval')
    p.add_argument('--batch-size', type=int, default=6)
    p.add_argument('--img-hw', type=int, nargs=2, default=(672, 1600),
                   help='inference geometry for model build (the jitted '
                        'fn re-specializes to the actual batch shapes)')
    p.add_argument('--tta', action='store_true',
                   help='horizontal-flip test-time augmentation')
    p.add_argument('--data-parallel', action='store_true',
                   help='shard the image batch over all devices '
                        '(batch size must divide by the device count)')
    p.add_argument('--timer', action='store_true')
    args = p.parse_args()

    import numpy as np
    import jax
    from epropnp_tpu.det.config import DetConfig
    from epropnp_tpu.det.api import init_detector, inference_detector
    from epropnp_tpu.det.nuscenes_dataset import NuScenes3DDataset
    from epropnp_tpu.utils.timer import IterTimers
    try:
        import cv2
    except ImportError:
        p.error('cv2 required for image loading')

    cfg = getattr(DetConfig, args.config)()
    if not os.path.isfile(args.ann):
        p.error(f'annotation file not found: {args.ann}')
    if args.checkpoint.endswith(('.pth', '.pt', '.tar')):
        from epropnp_tpu.det.api import torch_checkpoint_has_dcn_offsets
        if torch_checkpoint_has_dcn_offsets(args.checkpoint):
            # mmcv-trained DCNv2 weights expect plain-sigmoid modulation;
            # plain torchvision files (no conv_offset keys) instead keep
            # the configured scale so the zero-offset graft stays
            # identity-like (init_detector applies the same detection)
            import dataclasses
            cfg = dataclasses.replace(cfg, dcn_modulation_scale=1.0)
    dataset = NuScenes3DDataset(args.ann, img_prefix=args.data)
    model, variables = init_detector(cfg, args.checkpoint,
                                     img_hw=tuple(args.img_hw))
    timers = IterTimers(enabled=args.timer)

    # jit ONCE and reuse across batches (a fresh make_inference_fn per
    # batch would recompile every call); the tracer re-specializes per
    # distinct batch shape only
    from epropnp_tpu.det import test as dtest
    make_fn = (dtest.make_tta_inference_fn if args.tta
               else dtest.make_inference_fn)
    if args.data_parallel and jax.device_count() > 1:
        # reference dist-test equivalent: shard images over the mesh
        from epropnp_tpu.parallel import data_parallel_infer, make_mesh
        if args.batch_size % jax.device_count():
            p.error(f'--batch-size {args.batch_size} must divide by '
                    f'{jax.device_count()} devices')
        n_args = 9 if args.tta else 7
        infer_fn = data_parallel_infer(make_fn(model, cfg),
                                       make_mesh(), n_batch_args=n_args)
        # ragged final batch falls back to a single-device jit
        infer_fn_tail = jax.jit(make_fn(model, cfg))
    else:
        infer_fn = infer_fn_tail = jax.jit(make_fn(model, cfg))
    tta = args.tta

    results = []
    bs = args.batch_size
    for i in range(0, len(dataset), bs):
        infos = dataset.data_infos[i:i + bs]
        imgs = [cv2.imread(os.path.join(args.data, info['img_path']))[..., ::-1]
                for info in infos]
        cams = [np.asarray(info['cam_intrinsic']) for info in infos]
        fn = (infer_fn if len(infos) % jax.device_count() == 0
              else infer_fn_tail)
        _, out3d = inference_detector(model, variables, cfg, imgs, cams,
                                      infer_fn=fn, timers=timers,
                                      tta=tta)
        for per_img in out3d:
            results.append(dict(bbox_3d_results=per_img))
        print(f'\r{min(i + bs, len(dataset))}/{len(dataset)}', end='')
    print()
    if args.timer:
        print(timers.summary())
    metrics = dataset.evaluate(results, args.out)
    print(metrics)


if __name__ == '__main__':
    main()
