"""Side-by-side parity artifact for the reference fit_identity demo.

The reference ships a notebook (/root/reference/demo/fit_identity.ipynb)
that fits ``out_pose = EProPnP(MLP(in_pose))`` to a noisy identity map
and reports Mean Translation / Orientation Error on 1024 held-out poses
— but records no output cells, so there is no published end state to
compare against. This study produces one: it runs

  * the TORCH side — the notebook's recipe assembled from the
    reference's own core modules (/root/reference/epropnp via
    tests/ref_loader.py's pyro shim) with the notebook's MLP / static
    log_weight_scale / Adam groups / Monte-Carlo loss re-expressed from
    its spec (cells 7-10);
  * the JAX side — our production ``demo/fit_identity.py`` unchanged;

at a matched reduced scale on the same machine, and writes both final
metric sets to one JSON (``--out``). The slow CI test pins our side
within a margin of the torch side.

Usage:
    python tools/fit_identity_parity.py --n-data 4096 --epochs 3 \
        --out fit_identity_parity.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))
sys.path.insert(0, os.path.join(REPO, 'demo'))


def run_torch(n_data: int, batch_size: int, n_epoch: int, noise: float,
              num_points: int = 64, hidden: int = 1024, seed: int = 0,
              verbose: bool = True):
    """Notebook recipe (cells 6-12) on the reference torch core."""
    import torch
    import torch.nn.functional as F
    from ref_loader import load_reference_epropnp

    ref = load_reference_epropnp()
    if ref is None:
        raise SystemExit('reference core unavailable')
    torch.manual_seed(seed)

    epropnp = ref.epropnp.EProPnP6DoF(
        mc_samples=512, num_iter=4,
        solver=ref.levenberg_marquardt.LMSolver(
            dof=6, num_iter=10,
            init_solver=ref.levenberg_marquardt.RSLMSolver(
                dof=6, num_points=8, num_proposals=128, num_iter=5)))
    camera = ref.camera.PerspectiveCamera()
    cost_fun = ref.cost_fun.AdaptiveHuberPnPCost(relative_delta=0.5)

    # notebook cell 7: Linear(7, hidden) + LeakyReLU + Linear(hidden,
    # num_points * 7); static log_weight_scale (homoscedastic noise)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(7, hidden), torch.nn.LeakyReLU(),
        torch.nn.Linear(hidden, num_points * 7))
    log_weight_scale = torch.nn.Parameter(torch.zeros(2))

    def correspondence(in_pose):
        out = mlp(in_pose).reshape(-1, num_points, 7)
        x3d, x2d, w2d = out.split([3, 2, 2], dim=-1)
        w2d = (w2d.log_softmax(dim=-2) + log_weight_scale).exp()
        return x3d, x2d, w2d

    # notebook cell 9: identity data with noise, unit quaternions
    in_pose = torch.randn(n_data, 7)
    in_pose[:, 2] += 5
    in_pose[:, 3:] = F.normalize(in_pose[:, 3:], dim=-1)
    out_pose = in_pose + torch.randn(n_data, 7) * noise
    out_pose[:, 3:] = F.normalize(out_pose[:, 3:], dim=-1)
    cam_mats = torch.eye(3)

    opt = torch.optim.Adam([
        {'params': mlp.parameters()},
        {'params': [log_weight_scale], 'lr': 1e-2}], lr=1e-4)
    # notebook cell 8: EMA-normalized Monte Carlo pose loss
    norm_factor_buf = torch.tensor(1.0)
    momentum = 0.1

    n_batches = n_data // batch_size
    t0 = time.time()
    last = {}
    for epoch in range(n_epoch):
        perm = torch.randperm(n_data)
        for i in range(n_batches):
            idx = perm[i * batch_size:(i + 1) * batch_size]
            bi, bo = in_pose[idx], out_pose[idx]
            x3d, x2d, w2d = correspondence(bi)
            camera.set_param(cam_mats.expand(bi.size(0), -1, -1))
            cost_fun.set_param(x2d.detach(), w2d)
            (_, _, pose_opt_plus, _, pose_sample_logweights,
             cost_tgt) = epropnp.monte_carlo_forward(
                x3d, x2d, w2d, camera, cost_fun, pose_init=bo,
                force_init_solve=True, with_pose_opt_plus=True)

            norm_factor = log_weight_scale.detach().exp().mean()
            with torch.no_grad():
                norm_factor_buf = norm_factor_buf * (1 - momentum) \
                    + momentum * norm_factor
            loss_pose = cost_tgt \
                + torch.logsumexp(pose_sample_logweights, dim=0)
            loss_pose = torch.where(torch.isnan(loss_pose),
                                    torch.zeros_like(loss_pose), loss_pose)
            loss_mc = loss_pose.mean() / norm_factor_buf

            dist_t = (pose_opt_plus[:, :3] - bo[:, :3]).norm(dim=-1)
            loss_t = torch.where(dist_t < 1.0, 0.5 * dist_t.square(),
                                 dist_t - 0.5).mean()
            dot_quat = (pose_opt_plus[:, None, 3:]
                        @ bo[:, 3:, None]).reshape(-1)
            loss_r = ((1 - dot_quat.square()) * 2).mean()
            loss = loss_mc + 0.1 * loss_t + 0.1 * loss_r

            opt.zero_grad()
            loss.backward()
            opt.step()
            last = dict(loss=float(loss), loss_mc=float(loss_mc),
                        loss_t=float(loss_t), loss_r=float(loss_r))
        if verbose:
            print(f'[torch] epoch {epoch + 1}: {last} '
                  f'({time.time() - t0:.0f}s)', flush=True)

    # notebook cells 11-12: held-out eval via the deterministic solve
    with torch.no_grad():
        test = torch.randn(min(1024, n_data), 7)
        test[:, 2] += 5
        test[:, 3:] = F.normalize(test[:, 3:], dim=-1)
        x3d, x2d, w2d = correspondence(test)
        camera.set_param(cam_mats.expand(test.size(0), -1, -1))
        cost_fun.set_param(x2d, w2d)
        pose_opt, _, _, _ = epropnp(x3d, x2d, w2d, camera, cost_fun)
        dist_t = (pose_opt[:, :3] - test[:, :3]).norm(dim=-1)
        dot_quat = (pose_opt[:, None, 3:] @ test[:, 3:, None]).reshape(-1)
        dist_theta = 2 * torch.acos(dot_quat.abs().clamp(max=1.0))
    return {
        'mean_trans_err': float(dist_t.mean()),
        'mean_orient_err': float(dist_theta.mean()),
        'final_loss': last.get('loss'),
        'wall_s': time.time() - t0,
    }


def main():
    # both sides run on the host CPU: the artifact is a parity
    # comparison, so the two recipes must share hardware and scale
    import jax
    jax.config.update('jax_platforms', 'cpu')
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n-data', type=int, default=4096)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--epochs', type=int, default=3)
    p.add_argument('--noise', type=float, default=0.01)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--out', default='fit_identity_parity.json')
    args = p.parse_args()

    print('=== torch reference recipe', flush=True)
    torch_res = run_torch(args.n_data, args.batch_size, args.epochs,
                          args.noise, seed=args.seed)
    print('torch:', torch_res, flush=True)

    print('=== jax (demo/fit_identity.run)', flush=True)
    import fit_identity as demo
    t0 = time.time()
    jax_res = demo.run(n_data=args.n_data, batch_size=args.batch_size,
                       n_epoch=args.epochs, noise=args.noise,
                       seed=args.seed, verbose=True)
    jax_out = {
        'mean_trans_err': jax_res['mean_trans_err'],
        'mean_orient_err': jax_res['mean_orient_err'],
        'final_loss': jax_res['final_loss'],
        'wall_s': time.time() - t0,
    }
    print('jax:', jax_out, flush=True)

    blob = {
        'config': dict(n_data=args.n_data, batch_size=args.batch_size,
                       epochs=args.epochs, noise=args.noise,
                       seed=args.seed),
        'torch_reference': torch_res,
        'jax': jax_out,
        'note': ('matched reduced scale of the reference '
                 'demo/fit_identity.ipynb (cells 6-12); the notebook '
                 'ships without output cells, so this IS the pinned '
                 'reference end state'),
    }
    with open(args.out, 'w') as f:
        json.dump(blob, f, indent=1)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
