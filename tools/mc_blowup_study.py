"""Reproduce-or-refute: the Monte-Carlo cost blow-up vs the torch reference.

Round-1 STATUS characterized a late-training failure mode on clean
synthetic data: the reference recipe's unbounded weight scale drives the
MC pose cost toward 1e24 -> inf gradients -> the NaN-skip freezes
training. This study pins whether that dynamic is *recipe-inherent*
(the PyTorch reference does it too) or *our numerics bug*:

  * One tiny conv network (identical architecture), weights initialized
    in torch and copied into flax — both frameworks start from the SAME
    parameters.
  * One synthetic LineMOD-format data stream (sixdof/synthetic.py),
    precomputed as numpy batches and fed to BOTH trainers in the same
    order.
  * Torch side: the faithful reference recipe re-assembled from the
    reference's own modules (/root/reference/epropnp core via
    tests/ref_loader.py incl. the pyro shim, plus the reference
    MonteCarloPoseLoss and matrix_to_quaternion loaded from
    EPro-PnP-6DoF) — lib/train.py:136-243 semantics.
  * JAX side: our production train step (sixdof/train.py) unchanged.
  * Monte Carlo sampling and the point subsample are inherently
    stochastic, so parity is judged against a *seed envelope*: the JAX
    trainer is run with two seeds; torch must track seed-0 within a
    multiple of the seed-0-vs-seed-1 spread (smoothed curves).

Usage:
    python tools/mc_blowup_study.py --steps 200 --bs 8 --out study.json

Outputs one JSON with per-step traces for torch / jax-seed0 / jax-seed1
and a computed verdict block (tracking gap vs envelope + weight-scale
growth slopes).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

OUT_RES = 16
INP_RES = 64
N_DENSE = OUT_RES * OUT_RES
SAMPLE_PTS = N_DENSE // 8  # 1/8 subsample, lib/train.py:157
REF_6DOF = '/root/reference/EPro-PnP-6DoF'


# --------------------------------------------------------------- data stream

def make_stream(n_frames: int, bs: int, steps: int, seed: int = 0):
    """Synthetic cuboid frames -> numpy Batch tuples, cycled over steps."""
    from epropnp_tpu.sixdof import synthetic
    from epropnp_tpu.sixdof.config import (DataIterConfig, SixDoFConfig,
                                           TrainConfig)
    from epropnp_tpu.sixdof.dataset import build_sample, collate

    cfg = SixDoFConfig(dataiter=DataIterConfig(
        inp_res=INP_RES, out_res=OUT_RES, sample_points=SAMPLE_PTS),
        train=TrainConfig(lr_epoch_step=()))
    rng = np.random.default_rng(seed)
    extents = np.array([0.04, 0.05, 0.06], np.float32)
    pts = synthetic.cuboid_surface(extents, 24)
    samples = []
    for _ in range(n_frames):
        rot, trans = synthetic.random_pose(rng, max_angle=2.0)
        fr = synthetic.render_frame(pts, extents, rot, trans, rng=rng)
        samples.append(build_sample(
            cfg, 'ape', fr['rgb'], fr['coord'], fr['mask'], fr['pose'],
            fr['box'], extents, split='train', rng=rng))
    min_extents = {'ape': extents}
    batches = []
    order = rng.permutation(n_frames)
    i = 0
    for _ in range(steps):
        if i + bs > n_frames:
            order = rng.permutation(n_frames)
            i = 0
        sel = [samples[j] for j in order[i:i + bs]]
        i += bs
        b = collate(sel, min_extents)
        batches.append(type(b)(*[np.asarray(a) for a in b]))
    return cfg, batches


# ------------------------------------------------------------ tiny networks

def torch_model(seed: int = 0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class TinyTorch(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 32, 3, 2, 1)
            self.conv2 = nn.Conv2d(32, 64, 3, 2, 1)
            self.out = nn.Conv2d(64, 5, 1)
            self.fc = nn.Linear(64, 2)

        def forward(self, img):
            # img (bs, 3, 64, 64) -> noc (bs,3,16,16), w2d, scale (bs,2)
            x = torch.relu(self.conv1(img))
            x = torch.relu(self.conv2(x))
            o = self.out(x)
            scale = torch.exp(self.fc(x.mean((2, 3))))
            return o[:, :3], o[:, 3:], scale

    return TinyTorch()


def flax_model():
    import flax.linen as nn
    import jax.numpy as jnp
    from epropnp_tpu.models.cdpn import CDPNOutputs

    class TinyFlax(nn.Module):
        @nn.compact
        def __call__(self, img, train: bool = True):
            x = nn.relu(nn.Conv(32, (3, 3), (2, 2),
                                padding=((1, 1), (1, 1)))(img))
            x = nn.relu(nn.Conv(64, (3, 3), (2, 2),
                                padding=((1, 1), (1, 1)))(x))
            o = nn.Conv(5, (1, 1))(x)
            scale = jnp.exp(nn.Dense(2)(x.mean((1, 2))))
            trans = jnp.zeros((img.shape[0], 3), img.dtype)
            return CDPNOutputs(noc=o[..., :3], w2d=o[..., 3:],
                               scale=scale, trans=trans)

    return TinyFlax()


def torch_params_to_flax(tmodel):
    """torch state_dict -> flax params dict (OIHW -> HWIO)."""
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    conv = lambda w: np.transpose(w, (2, 3, 1, 0))  # noqa: E731
    return {
        'Conv_0': {'kernel': conv(sd['conv1.weight']),
                   'bias': sd['conv1.bias']},
        'Conv_1': {'kernel': conv(sd['conv2.weight']),
                   'bias': sd['conv2.bias']},
        'Conv_2': {'kernel': conv(sd['out.weight']),
                   'bias': sd['out.bias']},
        'Dense_0': {'kernel': sd['fc.weight'].T, 'bias': sd['fc.bias']},
    }


# ------------------------------------------------------------- torch runner

def _load_ref_module(path, name, package_ctx=None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def run_torch(cfg, batches, lr: float, seed: int = 0,
              mc_samples=128, mc_iter=4, lm_iter=5,
              rs_points=16, rs_proposals=4, rs_iter=3, log=print):
    """Faithful reference recipe (lib/train.py:136-243) on the tiny net."""
    import torch
    # the parity oracles (tests/test_core_parity.py) set the process-wide
    # torch default dtype to float64; this study is a float32 recipe
    torch.set_default_dtype(torch.float32)
    from ref_loader import load_reference_epropnp
    ref = load_reference_epropnp()
    assert ref is not None, 'reference/torch unavailable'
    mcl_mod = _load_ref_module(
        os.path.join(REF_6DOF, 'lib/models/monte_carlo_pose_loss.py'),
        'ref_mc_loss')
    rc_mod = _load_ref_module(
        os.path.join(REF_6DOF, 'lib/ops/rotation_conversions.py'),
        'ref_rot_conv')

    torch.manual_seed(seed + 1)
    np.random.seed(seed + 2)  # reference uses np.random for the subsample
    model = torch_model(seed)
    mc_loss_mod = mcl_mod.MonteCarloPoseLoss().train()
    opt = torch.optim.RMSprop(model.parameters(), lr=lr)

    epropnp = ref.epropnp.EProPnP6DoF(
        mc_samples=mc_samples, num_iter=mc_iter,
        solver=ref.levenberg_marquardt.LMSolver(
            dof=6, num_iter=lm_iter,
            init_solver=ref.levenberg_marquardt.RSLMSolver(
                dof=6, num_points=rs_points, num_proposals=rs_proposals,
                num_iter=rs_iter)))
    from epropnp_tpu.sixdof import ref_constants
    cam_intrinsic = torch.tensor(np.asarray(ref_constants.CAMERA_MATRIX),
                                 dtype=torch.float32)

    trace = []
    for step, b in enumerate(batches):
        inp = torch.tensor(b.inp).permute(0, 3, 1, 2)
        noc, w2d, scale = model(inp)
        bs = inp.shape[0]
        dim = torch.tensor(b.dim)
        x3d = noc * dim[..., None, None]

        s = torch.tensor(b.s_box).to(torch.int64)
        wh_begin = torch.tensor(b.c_box).to(torch.int64) - s[:, None] / 2.
        wh_unit = s.to(torch.float32) / OUT_RES
        wh_arange = torch.arange(OUT_RES, dtype=torch.float32)
        y, x = torch.meshgrid(wh_arange, wh_arange, indexing='ij')
        x2d = torch.stack(
            (wh_begin[:, 0, None, None] + x * wh_unit[:, None, None],
             wh_begin[:, 1, None, None] + y * wh_unit[:, None, None]), dim=1)

        pose = torch.tensor(b.pose)
        rot_quat = rc_mod.matrix_to_quaternion(pose[:, :, :3])
        pose_gt = torch.cat((pose[:, :, 3], rot_quat), dim=-1)

        sample_pts = [np.random.choice(N_DENSE, size=SAMPLE_PTS,
                                       replace=False) for _ in range(bs)]
        sample_inds = x2d.new_tensor(np.array(sample_pts),
                                     dtype=torch.int64)
        batch_inds = torch.arange(bs)[:, None]
        x3d = x3d.flatten(2).transpose(-1, -2)[batch_inds, sample_inds]
        x2d = x2d.flatten(2).transpose(-1, -2)[batch_inds, sample_inds]
        w2d_s = w2d.flatten(2).transpose(-1, -2)[batch_inds, sample_inds]
        w2d_s = (w2d_s - w2d_s.mean(dim=1, keepdim=True)
                 - math.log(w2d_s.size(1))).exp() * scale[:, None, :]

        allowed_border = 30 * wh_unit
        camera = ref.camera.PerspectiveCamera(
            cam_mats=cam_intrinsic[None].expand(bs, -1, -1), z_min=0.01,
            lb=wh_begin - allowed_border[:, None],
            ub=(wh_begin + (OUT_RES - 1) * wh_unit[:, None]
                + allowed_border[:, None]))
        cost_fun = ref.cost_fun.AdaptiveHuberPnPCost(relative_delta=0.1)
        cost_fun.set_param(x2d, w2d_s)
        _, _, pose_opt_plus, _, logweights, cost_tgt = \
            epropnp.monte_carlo_forward(
                x3d, x2d, w2d_s, camera, cost_fun, pose_init=pose_gt,
                force_init_solve=True, with_pose_opt_plus=True)

        loss_mc = mc_loss_mod(logweights, cost_tgt, scale.detach().mean())
        loss_t = (pose_opt_plus[:, :3] - pose_gt[:, :3]).norm(dim=-1)
        beta = 0.05
        loss_t = torch.where(loss_t < beta, 0.5 * loss_t.square() / beta,
                             loss_t - 0.5 * beta).mean()
        dot_quat = (pose_opt_plus[:, None, 3:]
                    @ pose_gt[:, 3:, None]).squeeze(-1).squeeze(-1)
        loss_r = ((1 - dot_quat.square()) * 2).mean()
        loss_msk = torch.tensor(b.loss_msk).permute(0, 3, 1, 2)
        target = torch.tensor(b.target_coor).permute(0, 3, 1, 2)
        loss_rot = torch.nn.functional.l1_loss(loss_msk * noc,
                                               loss_msk * target)
        loss = 1.0 * loss_rot + 0.02 * loss_mc + 0.0 * (loss_t + loss_r)

        opt.zero_grad()
        loss.backward()
        grads = [p.grad for p in model.parameters() if p.grad is not None]
        grad_norm = torch.sqrt(sum((g ** 2).sum() for g in grads))
        if torch.isnan(grad_norm):
            opt.zero_grad()  # NaN skip, lib/train.py:242
        opt.step()
        rec = dict(step=step, loss=float(loss), loss_mc=float(loss_mc),
                   loss_rot=float(loss_rot),
                   scale_mean=float(scale.mean()),
                   norm_factor=float(mc_loss_mod.norm_factor),
                   grad_norm=float(grad_norm))
        trace.append(rec)
        if step % 20 == 0:
            log(f'[torch] {rec}')
    return trace


# --------------------------------------------------------------- jax runner

def run_jax(cfg, batches, lr: float, seed: int = 0,
            mc_samples=128, mc_iter=4, lm_iter=5,
            rs_points=16, rs_proposals=4, rs_iter=3, log=print):
    """Our production train step (sixdof/train.py) on the tiny net."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax
    from epropnp_tpu.sixdof import train as train_lib
    from epropnp_tpu.sixdof import ref_constants
    from epropnp_tpu.sixdof.config import LossConfig, PnPConfig

    cfg = dataclasses.replace(
        cfg,
        pnp=PnPConfig(mc_samples=mc_samples, num_iter=mc_iter,
                      lm_num_iter=lm_iter, rs_num_points=rs_points,
                      rs_num_proposals=rs_proposals, rs_num_iter=rs_iter),
        loss=LossConfig(rot_loss_weight=1.0, trans_loss_weight=0.0,
                        mc_loss_weight=0.02, t_loss_weight=0.0,
                        r_loss_weight=0.0))
    model = flax_model()
    epropnp = train_lib.build_epropnp(cfg)
    # plain RMSprop matching torch defaults (alpha=0.99, eps=1e-8);
    # the tiny net has no backbone/head branch split
    tx = optax.rmsprop(lr, decay=0.99, eps=1e-8)
    cam = jnp.asarray(np.asarray(ref_constants.CAMERA_MATRIX), jnp.float32)
    step_fn = jax.jit(train_lib.make_train_step(model, epropnp, cfg, tx,
                                                cam))

    params = torch_params_to_flax(torch_model(seed))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = train_lib.TrainState.create({'params': params}, tx)

    rng = jax.random.PRNGKey(seed + 100)
    trace = []
    nf_prev, momentum = 1.0, 0.01  # MonteCarloPoseLossState init/momentum
    for step, b in enumerate(batches):
        batch = jax.tree_util.tree_map(jnp.asarray, b)
        rng, k = jax.random.split(rng)
        state, metrics = step_fn(state, batch, k)
        m = {name: float(np.ravel(v)[0])
             for name, v in jax.device_get(metrics).items()}
        # scale_mean back-derived from the EMA update (exact):
        # nf_new = (1-m)*nf_old + m*scale_mean
        scale_mean = (m['norm_factor'] - (1 - momentum) * nf_prev) / momentum
        nf_prev = m['norm_factor']
        rec = dict(step=step, loss=m['loss'], loss_mc=m['loss_mc'],
                   loss_rot=m['loss_rot'], scale_mean=scale_mean,
                   norm_factor=m['norm_factor'],
                   grad_norm=m.get('grad_norm', float('nan')))
        trace.append(rec)
        if step % 20 == 0:
            log(f'[jax s{seed}] {rec}')
    return trace


# ---------------------------------------------------------------- analysis

def smooth(xs, w=11):
    xs = np.asarray(xs, np.float64)
    if len(xs) < w:
        w = max(1, len(xs) // 2 * 2 + 1)
    k = np.ones(w) / w
    return np.convolve(xs, k, mode='valid')


def growth_slope(scale_means):
    """Total log-growth of the weight scale (smoothed end vs start).

    A per-step polyfit slope is dominated by MC sampling noise at a few
    hundred steps; the end/start ratio of the smoothed trace is the
    stable signal of the unbounded-confidence dynamic.
    """
    y = smooth(np.maximum(np.asarray(scale_means, np.float64), 1e-12))
    return float(np.log(y[-1] / y[0])) if len(y) > 1 else float('nan')


def analyze(torch_tr, jax0_tr, jax1_tr):
    out = {}
    for key in ('loss_mc', 'loss_rot'):
        t = smooth([r[key] for r in torch_tr])
        j0 = smooth([r[key] for r in jax0_tr])
        j1 = smooth([r[key] for r in jax1_tr])
        n = min(len(t), len(j0), len(j1))
        t, j0, j1 = t[:n], j0[:n], j1[:n]
        envelope = np.abs(j0 - j1).mean() + 1e-3
        gap = np.abs(t - j0).mean()
        out[key] = dict(mean_gap_torch_vs_jax0=float(gap),
                        mean_seed_envelope=float(envelope),
                        gap_over_envelope=float(gap / envelope))
    out['scale_log_growth'] = dict(
        torch=growth_slope([r['scale_mean'] for r in torch_tr]),
        jax0=growth_slope([r['scale_mean'] for r in jax0_tr]),
        jax1=growth_slope([r['scale_mean'] for r in jax1_tr]))
    s = out['scale_log_growth']
    both_grow = s['torch'] > 0.15 and s['jax0'] > 0.15
    tracks = all(v['gap_over_envelope'] < 4.0 for v in
                 (out['loss_mc'], out['loss_rot']))
    out['verdict'] = (
        'recipe-inherent' if (tracks and both_grow) else
        'tracks-but-divergent-growth' if tracks else 'implementations-differ')
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--bs', type=int, default=8)
    ap.add_argument('--frames', type=int, default=64)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--out', default='mc_blowup_study.json')
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    jax.config.update('jax_platforms', 'cpu')

    cfg, batches = make_stream(args.frames, args.bs, args.steps)
    torch_tr = run_torch(cfg, batches, args.lr)
    jax0_tr = run_jax(cfg, batches, args.lr, seed=0)
    jax1_tr = run_jax(cfg, batches, args.lr, seed=1)
    result = dict(config=vars(args),
                  analysis=analyze(torch_tr, jax0_tr, jax1_tr),
                  torch=torch_tr, jax0=jax0_tr, jax1=jax1_tr)
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result['analysis'], indent=2))


if __name__ == '__main__':
    main()
