"""Headline benchmark: batched 6DoF PnP solves/sec (B=1024, N=512).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}``

``value`` is this framework's throughput of the deterministic batched
LM solve (RSLM random-sample init + 10 trust-region LM iterations, the
serving hot path) on the default JAX device. ``vs_baseline`` is the speedup
over the PyTorch reference running the same problem on CPU (the reference
published no GPU throughput; see BASELINE.md). Target from BASELINE.json:
>= 5x.

Usage: ``python bench.py [--skip-torch]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

B, N = 1024, 512
LM_ITER = 10
RS_POINTS, RS_PROPOSALS, RS_ITER = 16, 64, 3
# Torch-CPU reference throughput measured in this image (solves/s) — used
# when --skip-torch or when the reference checkout is unavailable.
TORCH_CPU_FALLBACK = None  # type: float | None


def make_problem(seed=0):
    """Well-posed synthetic 6DoF problem: B objects, N noisy correspondences."""
    r = np.random.default_rng(seed)
    # random rotations via normalized quaternions
    q = r.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q.T
    rot = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(B, 3, 3)
    t = np.concatenate([r.uniform(-0.2, 0.2, (B, 2)),
                        r.uniform(2.0, 6.0, (B, 1))], axis=-1)
    pose = np.concatenate([t, q], axis=-1).astype(np.float32)

    x3d = r.uniform(-0.5, 0.5, (B, N, 3))
    K = np.array([[500., 0., 320.], [0., 500., 240.], [0., 0., 1.]])
    xc = np.einsum('bij,bnj->bni', rot, x3d) + t[:, None]
    xh = np.einsum('ij,bnj->bni', K, xc)
    x2d = xh[..., :2] / xh[..., 2:]
    x2d = x2d + r.normal(scale=0.5, size=x2d.shape)
    w2d = r.uniform(0.5, 1.5, (B, N, 2)) / N
    cam = np.broadcast_to(K, (B, 3, 3))
    return (x3d.astype(np.float32), x2d.astype(np.float32),
            w2d.astype(np.float32), cam.astype(np.float32), pose)


def bench_jax(problem, repeats=10):
    import jax
    import jax.numpy as jnp
    from epropnp_tpu.ops.pnp import (
        AdaptiveHuberPnPCost, LMSolver, PerspectiveCamera, RSLMSolver)

    x3d, x2d, w2d, cam, _ = (jnp.asarray(a) for a in problem)
    on_tpu = jax.devices()[0].platform != 'cpu'
    solver = LMSolver(
        dof=6, num_iter=LM_ITER, use_pallas=on_tpu,
        init_solver=RSLMSolver(dof=6, num_points=RS_POINTS,
                               num_proposals=RS_PROPOSALS, num_iter=RS_ITER,
                               use_pallas=on_tpu, fast_sampling=on_tpu))
    camera = PerspectiveCamera(cam_mats=cam)
    cost_fun = AdaptiveHuberPnPCost(relative_delta=0.1).set_param(x2d, w2d)

    inner = 100  # solves per dispatch: amortizes host->device dispatch
    # (~1-3 ms/call) and the flat ~20-30 ms device_get sync through the
    # device tunnel, so the number reports device throughput — the
    # metric that matters for a serving queue, where requests pipeline
    # into the device without a host round-trip per batch.

    @jax.jit
    def solve_once(x3d, x2d, w2d, camera, cost_fun, key):
        pose, _, cost, _ = solver(x3d, x2d, w2d, camera, cost_fun,
                                  rng=key, with_cost=True)
        return pose, cost

    @jax.jit
    def solve_many(x3d, x2d, w2d, camera, cost_fun, keys):
        # accumulate a scalar that depends on every solve's pose AND cost
        # (a stacked (inner, B, 7) output would be dead-code-eliminable
        # per-iteration if unused, and transferring it costs more than
        # the solves); the sum forces all iterations to execute
        def body(acc, key):
            pose, _, cost, _ = solver(x3d, x2d, w2d, camera, cost_fun,
                                      rng=key, with_cost=True)
            return acc + jnp.mean(cost) + jnp.mean(pose), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return acc

    keys = jax.random.split(jax.random.PRNGKey(0), inner)
    pose, cost = solve_once(x3d, x2d, w2d, camera, cost_fun, keys[0])
    acc = solve_many(x3d, x2d, w2d, camera, cost_fun, keys)
    _ = np.asarray(acc)  # device_get: hard sync (block_until_ready can
    # be a no-op through the experimental device tunnel)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        acc = solve_many(x3d, x2d, w2d, camera, cost_fun, keys)
        _ = np.asarray(acc)
        times.append((time.perf_counter() - t0) / inner)
    dt = float(np.median(times))
    return B / dt, np.asarray(pose), np.asarray(cost)


def bench_torch(problem, repeats=3):
    """Reference PyTorch implementation on CPU (no GPU in this image)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tests'))
    from ref_loader import load_reference_pnp
    ref = load_reference_pnp()
    if ref is None:
        return None
    import torch
    x3d, x2d, w2d, cam, _ = (torch.from_numpy(np.ascontiguousarray(a))
                             for a in problem)
    solver = ref.levenberg_marquardt.LMSolver(
        dof=6, num_iter=LM_ITER,
        init_solver=ref.levenberg_marquardt.RSLMSolver(
            dof=6, num_points=RS_POINTS, num_proposals=RS_PROPOSALS,
            num_iter=RS_ITER))
    camera = ref.camera.PerspectiveCamera(cam_mats=cam)
    cost_fun = ref.cost_fun.AdaptiveHuberPnPCost(relative_delta=0.1)
    cost_fun.set_param(x2d, w2d)
    times = []
    with torch.no_grad():
        for _ in range(repeats):
            t0 = time.perf_counter()
            solver(x3d, x2d, w2d, camera, cost_fun, fast_mode=False)
            times.append(time.perf_counter() - t0)
    return B / float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--skip-torch', action='store_true')
    p.add_argument('--repeats', type=int, default=5)
    args = p.parse_args()

    # One tunnel wedge must not zero a round's evidence: probe the
    # backend from subprocesses with bounded backoff before the real
    # init (a failed in-process init is cached by JAX for the process
    # lifetime). Falls back to an explicitly-logged CPU run if the
    # device never answers.
    from epropnp_tpu.utils.backend_retry import wait_for_backend
    platform = wait_for_backend()
    print(f'# backend: {platform}', file=sys.stderr)

    problem = make_problem()
    solves_per_sec, pose, cost = bench_jax(problem, repeats=args.repeats)

    baseline = None
    if not args.skip_torch:
        try:
            baseline = bench_torch(problem)
        except Exception as e:  # noqa: BLE001
            print(f'# torch baseline failed: {e}', file=sys.stderr)
    if baseline is None:
        baseline = TORCH_CPU_FALLBACK

    vs = solves_per_sec / baseline if baseline else None
    print(json.dumps({
        'metric': 'batched_pnp_solves_per_sec_B1024_N512_6dof',
        'value': round(solves_per_sec, 2),
        'unit': 'solves/s',
        'vs_baseline': round(vs, 3) if vs is not None else None,
        # 'cpu' marks the emergency fallback when the device tunnel is
        # unreachable — not comparable to the TPU numbers (~160k on
        # 1x v5e, see STATUS.md)
        'platform': platform,
    }))


if __name__ == '__main__':
    main()
