"""CLI: train the 6DoF suite on LineMOD.

Mirrors the reference entry point (EPro-PnP-6DoF/tools/main.py) with the
typed-config system: ``--exp`` picks one of the released experiment configs.

  python tools/train_6dof.py --exp epropnp_basic --data /path/to/lm \
      --save runs/epropnp_basic
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epropnp_tpu.sixdof.config import SixDoFConfig  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--exp', default='epropnp_basic',
                   choices=['epropnp_basic', 'epropnp_reg_loss',
                            'epropnp_cdpn_init', 'epropnp_cdpn_init_long'])
    p.add_argument('--data', required=True, help='LineMOD root directory')
    p.add_argument('--save', default='runs/sixdof')
    p.add_argument('--load-model', default=None,
                   help='checkpoint for CDPN-init experiments')
    p.add_argument('--resume-from', default=None)
    p.add_argument('--data-parallel', action='store_true')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--bg-dir', default=None,
                   help='background-substitution images: a PASCAL VOC '
                        'root (VOC2012/... layout, reference behavior) '
                        'or a flat image directory')
    p.add_argument('--change-bg-ratio', type=float, default=0.5)
    p.add_argument('--smoke', action='store_true',
                   help='CI smoke mode: tiny backbone/solver so the '
                        'full CLI path runs in minutes on CPU '
                        '(NOT a training recipe)')
    args = p.parse_args()

    if args.exp in ('epropnp_cdpn_init', 'epropnp_cdpn_init_long'):
        if not args.load_model:
            p.error(f'--load-model is required for {args.exp}')
        cfg = getattr(SixDoFConfig, args.exp)(args.load_model)
    else:
        cfg = getattr(SixDoFConfig, args.exp)()
    if args.batch_size or args.epochs:
        import dataclasses
        train = cfg.train
        if args.batch_size:
            train = dataclasses.replace(train,
                                        train_batch_size=args.batch_size)
        if args.epochs:
            train = dataclasses.replace(train, end_epoch=args.epochs)
        cfg = dataclasses.replace(cfg, train=train)

    if args.smoke:
        import dataclasses
        from epropnp_tpu.sixdof.config import (
            DataIterConfig, NetworkConfig, PnPConfig)
        cfg = dataclasses.replace(
            cfg,
            network=dataclasses.replace(cfg.network, back_layers_num=18),
            pnp=PnPConfig(mc_samples=16, num_iter=2, lm_num_iter=3,
                          rs_num_points=8, rs_num_proposals=4,
                          rs_num_iter=1),
            dataiter=dataclasses.replace(cfg.dataiter, sample_points=64))

    from epropnp_tpu.sixdof.dataset import LineMODDataset
    from epropnp_tpu.sixdof.main import train_loop
    dataset = LineMODDataset(cfg, args.data, split='train',
                             bg_dir=args.bg_dir,
                             change_bg_ratio=args.change_bg_ratio)
    if len(dataset) == 0:
        p.error(f'no samples found under {args.data}')
    train_loop(cfg, dataset, args.save, resume_from=args.resume_from,
               data_parallel=args.data_parallel)


if __name__ == '__main__':
    main()
