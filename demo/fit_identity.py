"""Minimum viable EPro-PnP: fit a correspondence MLP to the identity pose map.

A tiny MLP maps an input pose to a 2D-3D correspondence set ``(x3d, x2d,
w2d)``; training with the Monte Carlo pose loss (plus derivative
regularization on ``pose_opt_plus``) teaches the correspondences to encode
the pose, so that solving PnP on them recovers it.

This is the TPU-native port of the reference's own end-to-end sanity check
(``/root/reference/demo/fit_identity.ipynb``): same model shape (MLP
7 -> 1024 -> num_points * 7, log-softmax weight normalization with a learned
global ``log_weight_scale``), same ``EProPnP6DoF(mc 512/4,
LMSolver(6, 10, RSLMSolver(8, 128, 5)))`` stack, same Adam parameter groups
(mlp lr 1e-4, log_weight_scale lr 1e-2), same losses
``loss_mc + 0.1 * smooth_l1(t) + 0.1 * (1 - (q.q_gt)^2) * 2``.

TPU-first deviations: the whole train step — correspondence net, AMIS Monte
Carlo forward, losses, Adam update — is one jitted function; data stays on
device and is sampled with explicit PRNG keys.

Run: ``python demo/fit_identity.py``
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

# allow running as a script from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epropnp_tpu.ops.pnp import (
    AdaptiveHuberPnPCost,
    EProPnP6DoF,
    LMSolver,
    PerspectiveCamera,
    RSLMSolver,
)
from epropnp_tpu.models.losses.monte_carlo_pose_loss import (
    MonteCarloPoseLossState,
    monte_carlo_pose_loss,
)


def make_epropnp(mc_samples=512, num_iter=4, lm_iter=10, rs_points=8,
                 rs_proposals=128, rs_iter=5, use_pallas=False):
    return EProPnP6DoF(
        mc_samples=mc_samples,
        num_iter=num_iter,
        solver=LMSolver(
            dof=6,
            num_iter=lm_iter,
            use_pallas=use_pallas,
            init_solver=RSLMSolver(
                dof=6,
                num_points=rs_points,
                num_proposals=rs_proposals,
                num_iter=rs_iter,
                use_pallas=use_pallas)))


def init_params(rng, num_points=64, hidden=1024):
    """MLP 7 -> hidden -> num_points*7 with LeakyReLU, plus log_weight_scale."""
    k1, k2 = jax.random.split(rng)
    dims = [7, hidden, num_points * 7]

    def linear_init(key, d_in, d_out):
        # torch nn.Linear default: U(-1/sqrt(d_in), 1/sqrt(d_in))
        kw, kb = jax.random.split(key)
        bound = 1.0 / math.sqrt(d_in)
        return {
            'w': jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound),
            'b': jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound),
        }

    return {
        'mlp': [linear_init(k, d_in, d_out)
                for k, d_in, d_out in zip(jax.random.split(k1, len(dims) - 1),
                                          dims[:-1], dims[1:])],
        'log_weight_scale': jnp.zeros((2,)),
    }


def forward_correspondence(params, in_pose, num_points):
    h = in_pose
    layers = params['mlp']
    for layer in layers[:-1]:
        h = h @ layer['w'] + layer['b']
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
    h = h @ layers[-1]['w'] + layers[-1]['b']
    x3d, x2d, w2d = jnp.split(
        h.reshape(-1, num_points, 7), [3, 5], axis=-1)
    w2d = jnp.exp(
        jax.nn.log_softmax(w2d, axis=-2) + params['log_weight_scale'])
    return x3d, x2d, w2d


class TrainMetrics(NamedTuple):
    loss: jnp.ndarray
    loss_mc: jnp.ndarray
    loss_t: jnp.ndarray
    loss_r: jnp.ndarray
    norm_factor: jnp.ndarray


def loss_fn(params, batch_in, batch_out, cam_mats, epropnp, num_points,
            mc_state, rng):
    # all matmuls here are tiny; full f32 precision avoids non-finite
    # gradients at extreme convergence (TPU default uses bfloat16 inputs)
    with jax.default_matmul_precision('float32'):
        return _loss_fn(params, batch_in, batch_out, cam_mats, epropnp,
                        num_points, mc_state, rng)


def _loss_fn(params, batch_in, batch_out, cam_mats, epropnp, num_points,
             mc_state, rng):
    x3d, x2d, w2d = forward_correspondence(params, batch_in, num_points)
    camera = PerspectiveCamera(cam_mats=cam_mats)
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(
        jax.lax.stop_gradient(x2d), w2d)
    (_, _, pose_opt_plus, _, pose_sample_logweights,
     cost_tgt) = epropnp.monte_carlo_forward(
        x3d, x2d, w2d, camera, cost_fun, rng=rng,
        pose_init=batch_out, force_init_solve=True,
        with_pose_opt_plus=True)

    norm_factor = jnp.mean(
        jnp.exp(jax.lax.stop_gradient(params['log_weight_scale'])))
    loss_mc, new_mc_state = monte_carlo_pose_loss(
        pose_sample_logweights, cost_tgt, norm_factor, mc_state,
        momentum=0.1, training=True)

    dist_t = jnp.linalg.norm(pose_opt_plus[:, :3] - batch_out[:, :3], axis=-1)
    beta = 1.0
    loss_t = jnp.mean(jnp.where(
        dist_t < beta, 0.5 * jnp.square(dist_t) / beta, dist_t - 0.5 * beta))
    dot_quat = jnp.sum(pose_opt_plus[:, 3:] * batch_out[:, 3:], axis=-1)
    loss_r = jnp.mean((1.0 - jnp.square(dot_quat)) * 2.0)

    loss = loss_mc + 0.1 * loss_t + 0.1 * loss_r
    metrics = TrainMetrics(loss, loss_mc, loss_t, loss_r, norm_factor)
    return loss, (metrics, new_mc_state)


def _all_finite(tree):
    """True iff every leaf is finite (NOT isfinite(global_norm): the norm's
    sum of squares overflows f32 for huge-but-finite late-training
    gradients, which Adam normalizes fine)."""
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(tree)]
    out = leaves[0]
    for l in leaves[1:]:
        out = out & l
    return out


def make_optimizer(lr_mlp=1e-4, lr_scale=1e-2):
    """Adam with per-group learning rates (reference notebook param groups)."""
    return optax.multi_transform(
        {'mlp': optax.adam(lr_mlp), 'scale': optax.adam(lr_scale)},
        {'mlp': 'mlp', 'log_weight_scale': 'scale'})


@functools.partial(jax.jit, static_argnames=('epropnp', 'num_points', 'opt'))
def train_step(params, opt_state, mc_state, batch_in, batch_out, cam_mats,
               rng, epropnp, num_points, opt):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (metrics, new_mc_state)), grads = grad_fn(
        params, batch_in, batch_out, cam_mats, epropnp, num_points,
        mc_state, rng)
    # NaN guard: at extreme convergence a degenerate batch can produce a
    # non-finite loss/gradient through the AMIS sampling; skip the update
    # and keep the EMA intact (the suites' train steps do the same,
    # mirroring the reference's grad-norm NaN skip, lib/train.py:242).
    ok = _all_finite(grads) & jnp.isfinite(metrics.loss)
    updates, new_opt_state = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    sel = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
        lambda x, y: jnp.where(ok, x, y), a, b)
    params = sel(new_params, params)
    opt_state = sel(new_opt_state, opt_state)
    new_mc_state = sel(new_mc_state, mc_state)
    metrics = metrics._replace(loss=jnp.where(ok, metrics.loss, jnp.nan))
    return params, opt_state, new_mc_state, metrics


@functools.partial(jax.jit, static_argnames=('epropnp', 'num_points',
                                             'fast_mode'))
def forward_test(params, in_pose, cam_mats, epropnp, num_points,
                 fast_mode=False):
    x3d, x2d, w2d = forward_correspondence(params, in_pose, num_points)
    camera = PerspectiveCamera(cam_mats=cam_mats)
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.5).set_param(x2d, w2d)
    pose_opt, _, _, _ = epropnp(
        x3d, x2d, w2d, camera, cost_fun, rng=jax.random.PRNGKey(0),
        fast_mode=fast_mode)
    return pose_opt


def gen_poses(rng, n, noise=0.01, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    in_pose = jax.random.normal(k1, (n, 7), dtype)
    in_pose = in_pose.at[:, 2].add(5.0)  # positive z
    quat = in_pose[:, 3:]
    in_pose = in_pose.at[:, 3:].set(
        quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True),
                           1e-12))
    out_pose = in_pose + jax.random.normal(k2, (n, 7), dtype) * noise
    quat = out_pose[:, 3:]
    out_pose = out_pose.at[:, 3:].set(
        quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True),
                           1e-12))
    return in_pose, out_pose


def run(n_data=65536, batch_size=256, n_epoch=10, noise=0.01, num_points=64,
        hidden=1024, seed=0, epropnp=None, log_every=32, verbose=True,
        use_pallas=False):
    """Train the identity-fit model; returns final eval metrics dict."""
    if epropnp is None:
        epropnp = make_epropnp(use_pallas=use_pallas)
    rng = jax.random.PRNGKey(seed)
    k_data, k_init, k_train, k_test = jax.random.split(rng, 4)

    in_pose, out_pose = gen_poses(k_data, n_data, noise)
    cam_mats = jnp.broadcast_to(jnp.eye(3), (batch_size, 3, 3))

    params = init_params(k_init, num_points, hidden)
    opt = make_optimizer()
    opt_state = opt.init(params)
    mc_state = MonteCarloPoseLossState.create()

    n_batches = n_data // batch_size
    step = 0
    t0 = time.time()
    for epoch in range(n_epoch):
        k_train, k_perm = jax.random.split(k_train)
        perm = jax.random.permutation(k_perm, n_data)
        for i in range(n_batches):
            idx = perm[i * batch_size:(i + 1) * batch_size]
            k_train, k_step = jax.random.split(k_train)
            params, opt_state, mc_state, metrics = train_step(
                params, opt_state, mc_state, in_pose[idx], out_pose[idx],
                cam_mats, k_step, epropnp, num_points, opt)
            step += 1
            if verbose and step % log_every == 1:
                m = jax.device_get(metrics)
                print(f'epoch {epoch + 1} step {step}: '
                      f'loss={m.loss:.4f} mc={m.loss_mc:.4f} '
                      f't={m.loss_t:.4f} r={m.loss_r:.4f} '
                      f'nf={m.norm_factor:.4f} '
                      f'({(time.time() - t0):.1f}s)')

    # evaluation: recover the input pose from the correspondences
    n_test = min(1024, n_data)
    test_pose, _ = gen_poses(k_test, n_test, noise)
    test_cams = jnp.broadcast_to(jnp.eye(3), (n_test, 3, 3))
    pose_opt = forward_test(params, test_pose, test_cams, epropnp, num_points)
    dist_t = jnp.linalg.norm(pose_opt[:, :3] - test_pose[:, :3], axis=-1)
    dot_quat = jnp.sum(pose_opt[:, 3:] * test_pose[:, 3:], axis=-1)
    dist_theta = 2.0 * jnp.arccos(jnp.clip(jnp.abs(dot_quat), 0.0, 1.0))
    results = {
        'mean_trans_err': float(jnp.mean(dist_t)),
        'mean_orient_err': float(jnp.mean(dist_theta)),
        'final_loss': float(metrics.loss),
        'params': params,
    }
    if verbose:
        print(f"Mean Translation Error: {results['mean_trans_err']:.6f}")
        print(f"Mean Orientation Error: {results['mean_orient_err']:.6f}")
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n-data', type=int, default=65536)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--epochs', type=int, default=10)
    p.add_argument('--noise', type=float, default=0.01)
    p.add_argument('--use-pallas', action='store_true',
                   help='route LM solves through the fused TPU kernel')
    args = p.parse_args()
    run(n_data=args.n_data, batch_size=args.batch_size, n_epoch=args.epochs,
        noise=args.noise, use_pallas=args.use_pallas)


if __name__ == '__main__':
    main()
