"""CLI: evaluate the 6DoF suite on LineMOD (ADD/n-deg-n-cm/ARP metrics).

Counterpart of the reference eval entry (tools/main.py --test).

  python tools/test_6dof.py --exp epropnp_basic --data /data/lm \
      --checkpoint runs/6dof/latest.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--exp', default='epropnp_basic')
    p.add_argument('--data', required=True)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--init', default='epnp', choices=['epnp', 'rslm'])
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--smoke', action='store_true',
                   help='CI smoke mode: tiny backbone/refiner matching '
                        'train_6dof.py --smoke checkpoints')
    args = p.parse_args()

    import numpy as np
    from epropnp_tpu.sixdof.config import SixDoFConfig
    from epropnp_tpu.sixdof.dataset import LineMODDataset
    from epropnp_tpu.sixdof import main as main_lib
    from epropnp_tpu.sixdof.model_points import (
        load_models_info, load_ply_vertices)
    from epropnp_tpu.sixdof import ref_constants as ref
    from epropnp_tpu.utils.checkpoint import load_checkpoint

    cfg = SixDoFConfig(exp_id=args.exp)
    if args.smoke:
        import dataclasses
        from epropnp_tpu.sixdof.config import PnPConfig
        cfg = dataclasses.replace(
            cfg,
            network=dataclasses.replace(cfg.network, back_layers_num=18),
            pnp=PnPConfig(mc_samples=16, num_iter=2, lm_num_iter=3,
                          rs_num_points=8, rs_num_proposals=4,
                          rs_num_iter=1))
    info_path = os.path.join(args.data, 'models', 'models_info.txt')
    if not os.path.isfile(info_path):
        p.error(f'missing {info_path}')
    infos = load_models_info(info_path)
    model_info = {ref.IDX2OBJ[i]: v for i, v in infos.items()
                  if i in ref.IDX2OBJ}
    models, diameters = {}, {}
    for cls in ref.LM_OBJECTS:
        ply = os.path.join(args.data, 'models', f'obj_{ref.OBJ2IDX[cls]:02d}.ply')
        if os.path.isfile(ply) and cls in model_info:
            models[cls] = load_ply_vertices(ply) / 1000.0
            diameters[cls] = model_info[cls]['diameter'] / 1000.0

    dataset = LineMODDataset(cfg, args.data, split='test',
                             classes=list(models),
                             model_info=model_info)
    if len(dataset) == 0:
        p.error(f'no test samples under {args.data}')

    model_net, _, tx, _ = main_lib.build_all(cfg)
    state = main_lib.init_state(cfg, model_net, tx)
    state = load_checkpoint(args.checkpoint, state)

    metrics = main_lib.test_loop(cfg, dataset, state, models, diameters,
                                 init=args.init, batch_size=args.batch_size)
    print(json.dumps(
        {k: {c: v for c, v in m.items() if c == 'mean'}
         for k, m in metrics.items() if isinstance(m, dict)},
        default=lambda o: o.tolist() if hasattr(o, 'tolist') else str(o),
        indent=2))


if __name__ == '__main__':
    main()
