"""Pallas-fused batched Levenberg-Marquardt PnP solver (TPU kernel).

The XLA path materializes the (B, 2N, dof) Jacobian in HBM between the
projection producer and the tiny JtJ contraction, forcing a relayout that
dominates the solve (~6 ms/iter at B=1024, N=512 vs ~0.4 ms of actual
math). This kernel fuses the whole LM iteration per block of objects:
residual + analytic Jacobian (component-wise, points on the 128-lane
axis), the 21 JtJ reductions, the damped 6x6 Cholesky solve (unrolled
scalars), the pose update, and Ceres-style trust-region bookkeeping — all
in VMEM, nothing but (TILE_B,)-shaped state between iterations.

Scope: zero-skew pinhole cameras; optional projection bounds (the
reference's training-time border clamps: residuals use the clamped
projection, Jacobian rows are zeroed where a clamp is active) via
``bounds``; optional final-JtJ output (``with_jtj``) so the caller can
form the pose covariance that the Monte Carlo forward needs. dof in
{4, 6}; fixed iteration count; ``fast_mode`` = pure Gauss-Newton.
Parity vs the jnp solver is tested to ~1e-5.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve(a, g, dof):
    """Solve a x = -g for SPD ``a`` given as dict {(i,j): (TILE_B, 1)}."""
    l = {}
    for i in range(dof):
        for j in range(i + 1):
            s = a[(i, j)]
            for k in range(j):
                s = s - l[(i, k)] * l[(j, k)]
            if i == j:
                l[(i, j)] = jnp.sqrt(s)
            else:
                l[(i, j)] = s / l[(j, j)]
    # forward: L y = -g
    y = [None] * dof
    for i in range(dof):
        s = -g[i]
        for k in range(i):
            s = s - l[(i, k)] * y[k]
        y[i] = s / l[(i, i)]
    # backward: L^T x = y
    x = [None] * dof
    for i in reversed(range(dof)):
        s = y[i]
        for k in range(i + 1, dof):
            s = s - l[(k, i)] * x[k]
        x[i] = s / l[(i, i)]
    return x


def _evaluate(pose_cols, x, y, z, u_t, v_t, wu, wv, fx, fy, cx, cy, delta,
              dof, z_min, eps, bounds=None, clip_jac=True):
    """Residual/cost/Jacobian scalars for one pose.

    All point arrays are (TILE_B, N); per-object scalars are (TILE_B, 1).
    ``bounds``: None or (lb_u, lb_v, ub_u, ub_v) each (TILE_B, 1) — the
    projection is clamped into the box and the matching Jacobian row is
    zeroed where the clamp is active (camera.py:76-103 semantics).
    Returns (cost, jtj dict, g list).
    """
    if dof == 4:
        tx, ty, tz, yaw = pose_cols
        cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
        xr = cy_ * x + sy_ * z
        yr = y
        zr = -sy_ * x + cy_ * z
    else:
        tx, ty, tz, qw, qi, qj, qk = pose_cols
        qn = jax.lax.rsqrt(qw * qw + qi * qi + qj * qj + qk * qk + 1e-24)
        w, i_, j_, k_ = qw * qn, qi * qn, qj * qn, qk * qn
        xr = (1 - 2 * (j_ * j_ + k_ * k_)) * x + 2 * (i_ * j_ - k_ * w) * y \
            + 2 * (i_ * k_ + j_ * w) * z
        yr = 2 * (i_ * j_ + k_ * w) * x + (1 - 2 * (i_ * i_ + k_ * k_)) * y \
            + 2 * (j_ * k_ - i_ * w) * z
        zr = 2 * (i_ * k_ - j_ * w) * x + 2 * (j_ * k_ + i_ * w) * y \
            + (1 - 2 * (i_ * i_ + j_ * j_)) * z

    xc, yc, zc_raw = xr + tx, yr + ty, zr + tz
    zc = jnp.maximum(zc_raw, z_min)
    u = (fx * xc + cx * zc_raw) / zc
    v = (fy * yc + cy * zc_raw) / zc

    if bounds is not None:
        lb_u, lb_v, ub_u, ub_v = bounds
        in_u = jnp.logical_and(u > lb_u, u < ub_u).astype(u.dtype)
        in_v = jnp.logical_and(v > lb_v, v < ub_v).astype(v.dtype)
        u = jnp.clip(u, lb_u, ub_u)
        v = jnp.clip(v, lb_v, ub_v)

    ru = (u - u_t) * wu
    rv = (v - v_t) * wv
    ss = ru * ru + rv * rv
    s_sqrt = jnp.sqrt(jnp.maximum(ss, 1e-24))
    # huber cost + IRLS sqrt-derivative rescale
    cost = jnp.sum(
        jnp.where(s_sqrt <= delta, 0.5 * ss,
                  delta * s_sqrt - 0.5 * delta * delta), axis=1)[:, None]
    rho = jnp.sqrt(jnp.minimum(delta / jnp.maximum(s_sqrt, 1e-10), 1.0))

    # d x2d / d xc (zero-skew pinhole). With clip_jac (LM mode), the
    # Jacobian is zeroed where z clamped (both rows) or a projection bound
    # is active (that row only); fast GN mode keeps it (clip_jac=False in
    # the jnp solver, matching the reference).
    if clip_jac:
        live = (zc_raw >= z_min).astype(u.dtype)
        live_u = live * in_u if bounds is not None else live
        live_v = live * in_v if bounds is not None else live
    else:
        live_u = live_v = 1.0
    du0 = fx / zc * live_u
    du2 = (cx - u) / zc * live_u
    dv1 = fy / zc * live_v
    dv2 = (cy - v) / zc * live_v

    swu = wu * rho
    swv = wv * rho
    # scaled jacobian components: ju_k, jv_k for k in range(dof)
    if dof == 4:
        ju = [du0 * swu, jnp.zeros_like(du0), du2 * swu,
              (du0 * zr - du2 * xr) * swu]
        jv = [jnp.zeros_like(dv1), dv1 * swv, dv2 * swv,
              (-dv2 * xr) * swv]
    else:
        w0, w1, w2 = 2 * xr, 2 * yr, 2 * zr
        # rot cols = d_x2d_d_xc @ skew([w0,w1,w2])
        ju = [du0 * swu, jnp.zeros_like(du0), du2 * swu,
              (-du2 * w1) * swu,
              (-du0 * w2 + du2 * w0) * swu,
              (du0 * w1) * swu]
        jv = [jnp.zeros_like(dv1), dv1 * swv, dv2 * swv,
              (dv1 * w2 - dv2 * w1) * swv,
              (dv2 * w0) * swv,
              (-dv1 * w0) * swv]
    ru_s = ru * rho
    rv_s = rv * rho

    jtj = {}
    for a in range(dof):
        for b in range(a + 1):
            jtj[(a, b)] = jnp.sum(ju[a] * ju[b] + jv[a] * jv[b],
                                  axis=1)[:, None]
    g = [jnp.sum(ju[a] * ru_s + jv[a] * rv_s, axis=1)[:, None]
         for a in range(dof)]
    return cost, jtj, g


def _pose_add(pose_cols, step, dof):
    if dof == 4:
        return [p + s for p, s in zip(pose_cols, step)]
    t_new = [pose_cols[i] + step[i] for i in range(3)]
    w, i_, j_, k_ = pose_cols[3:]
    d0, d1, d2 = step[3], step[4], step[5]
    # tangent transform (camera.get_quaternion_transfrom_mat rows)
    qw = w + (i_ * d0 + j_ * d1 + k_ * d2)
    qi = i_ + (-w * d0 - k_ * d1 + j_ * d2)
    qj = j_ + (k_ * d0 - w * d1 - i_ * d2)
    qk = k_ + (-j_ * d0 + i_ * d1 - w * d2)
    n = jnp.maximum(jnp.sqrt(qw * qw + qi * qi + qj * qj + qk * qk), 1e-12)
    return t_new + [qw / n, qi / n, qj / n, qk / n]


def _make_kernel(dof, num_iter, fast_mode, z_min, eps,
                 min_lm_diagonal, max_lm_diagonal, min_relative_decrease,
                 initial_trust_region_radius, max_trust_region_radius,
                 cost_only=False, with_bounds=False, with_jtj=False):
    pose_dim = 4 if dof == 4 else 7
    n_tri = dof * (dof + 1) // 2

    def kernel(*refs):
        refs = list(refs)
        x3d_ref, x2d_ref, w2d_ref, cam_ref = refs[:4]
        idx = 4
        bounds_ref = None
        if with_bounds:
            bounds_ref = refs[idx]
            idx += 1
        delta_ref, pose0_ref, pose_out_ref, cost_out_ref = refs[idx:idx + 4]
        jtj_out_ref = refs[idx + 4] if with_jtj else None
        x = x3d_ref[0]
        y = x3d_ref[1]
        z = x3d_ref[2]
        u_t = x2d_ref[0]
        v_t = x2d_ref[1]
        wu = w2d_ref[0]
        wv = w2d_ref[1]
        fx = cam_ref[:, 0:1]
        fy = cam_ref[:, 1:2]
        cx = cam_ref[:, 2:3]
        cy = cam_ref[:, 3:4]
        delta = delta_ref[:, 0:1]
        bounds = None
        if with_bounds:
            bounds = tuple(bounds_ref[:, i:i + 1] for i in range(4))

        def ev(pose_cols):
            return _evaluate(pose_cols, x, y, z, u_t, v_t, wu, wv, fx, fy,
                             cx, cy, delta, dof, z_min, eps, bounds=bounds,
                             clip_jac=not fast_mode)

        pose = [pose0_ref[:, i:i + 1] for i in range(pose_dim)]
        jtj_final = None

        if cost_only:
            cost, _, _ = ev(pose)
        elif fast_mode:
            def gn_body(_, carry):
                pose, cost_prev, jtj_prev = carry
                cost, jtj, g = ev(pose)
                damped = dict(jtj)
                for a in range(dof):
                    damped[(a, a)] = damped[(a, a)] + eps
                step = _chol_solve(damped, g, dof)
                jtj_f = [jtj[(a, b)] for a in range(dof)
                         for b in range(a + 1)]
                return _pose_add(pose, step, dof), cost, jtj_f

            (pose, cost, jtj_final) = jax.lax.fori_loop(
                0, num_iter, gn_body,
                (pose, jnp.zeros_like(fx), [jnp.zeros_like(fx)] * n_tri))
        else:
            cost, jtj, g = ev(pose)
            radius = jnp.full_like(fx, initial_trust_region_radius)
            decrease = jnp.full_like(fx, 2.0)

            def jtj_flat(jtj):
                return [jtj[(a, b)] for a in range(dof)
                        for b in range(a + 1)]

            def jtj_unflat(flat):
                out = {}
                idx = 0
                for a in range(dof):
                    for b in range(a + 1):
                        out[(a, b)] = flat[idx]
                        idx += 1
                return out

            def lm_body(_, carry):
                pose, cost, jtj_f, g, radius, decrease = carry
                jtj = jtj_unflat(jtj_f)
                damped = dict(jtj)
                for a in range(dof):
                    d = jtj[(a, a)]
                    damped[(a, a)] = d + jnp.clip(
                        d, min_lm_diagonal, max_lm_diagonal) / radius + eps
                step = _chol_solve(damped, g, dof)
                pose_new = _pose_add(pose, step, dof)
                cost_new, jtj_new, g_new = ev(pose_new)

                # model cost change: -step^T (JtJ step / 2 + g)
                mcc = jnp.zeros_like(fx)
                for a in range(dof):
                    hs = jnp.zeros_like(fx)
                    for b in range(dof):
                        key = (a, b) if a >= b else (b, a)
                        hs = hs + jtj[key] * step[b]
                    mcc = mcc - step[a] * (hs * 0.5 + g[a])
                rel = (cost - cost_new) / mcc
                ok = jnp.logical_and(rel >= min_relative_decrease, mcc > 0)

                sel = lambda a, b: jnp.where(ok, a, b)  # noqa: E731
                pose = [sel(pn, p) for pn, p in zip(pose_new, pose)]
                cost = sel(cost_new, cost)
                jtj_f = [sel(n_, o_) for n_, o_ in
                         zip(jtj_flat(jtj_new), jtj_f)]
                g = [sel(n_, o_) for n_, o_ in zip(g_new, g)]
                r_ok = radius / jnp.maximum(
                    1.0 - (2.0 * rel - 1.0) ** 3, 1.0 / 3.0)
                radius = jnp.clip(jnp.where(ok, r_ok, radius), eps,
                                  max_trust_region_radius)
                radius = jnp.where(ok, radius, radius / decrease)
                decrease = jnp.where(ok, 2.0, decrease * 2.0)
                return pose, cost, jtj_f, g, radius, decrease

            carry = (pose, cost, jtj_flat(jtj), g, radius, decrease)
            pose, cost, jtj_final, _, _, _ = jax.lax.fori_loop(
                0, num_iter, lm_body, carry)

        for i in range(pose_dim):
            pose_out_ref[:, i:i + 1] = pose[i]
        cost_out_ref[:, 0:1] = cost
        if with_jtj:
            # lower-triangular entries of the JtJ at the accepted pose
            # (pre-damping); the caller symmetrizes and inverts.
            for i in range(n_tri):
                jtj_out_ref[:, i:i + 1] = jtj_final[i]

    return kernel


@functools.partial(
    jax.jit, static_argnames=('dof', 'num_iter', 'fast_mode', 'z_min',
                              'tile_b', 'eps', 'min_lm_diagonal',
                              'max_lm_diagonal', 'min_relative_decrease',
                              'initial_trust_region_radius',
                              'max_trust_region_radius', 'cost_only',
                              'with_jtj'))
def lm_solve_pallas(x3d, x2d, w2d, cam_fxfycxcy, delta, pose_init,
                    bounds=None,
                    dof: int = 6, num_iter: int = 10,
                    fast_mode: bool = False, z_min: float = 0.1,
                    tile_b: int = 32,
                    eps: float = 1e-5,
                    min_lm_diagonal: float = 1e-6,
                    max_lm_diagonal: float = 1e32,
                    min_relative_decrease: float = 1e-3,
                    initial_trust_region_radius: float = 30.0,
                    max_trust_region_radius: float = 1e16,
                    cost_only: bool = False,
                    with_jtj: bool = False
                    ) -> Tuple[jnp.ndarray, ...]:
    """Solve batched PnP with the fused kernel.

    Args:
        x3d: (B, N, 3); x2d/w2d: (B, N, 2).
        cam_fxfycxcy: (B, 4) pinhole parameters (zero skew).
        delta: (B,) Huber deltas.
        pose_init: (B, 4|7).
        bounds: None or (B, 4) [lb_u, lb_v, ub_u, ub_v] projection bounds.
        with_jtj: also return the (B, dof, dof) JtJ at the accepted pose
            (undamped); ``inv(JtJ + eps I)`` is the reference pose_cov.

    Returns (pose_opt (B, pose_dim), cost (B,)[, jtj]).
    """
    assert not (cost_only and with_jtj)
    b, n, _ = x3d.shape
    pose_dim = 4 if dof == 4 else 7
    n_tri = dof * (dof + 1) // 2
    pad_b = (-b) % tile_b
    if pad_b:
        pad = lambda a: jnp.pad(a, [(0, pad_b)] + [(0, 0)] * (a.ndim - 1))
        x3d, x2d, w2d = pad(x3d), pad(x2d), pad(w2d)
        cam_fxfycxcy, delta, pose_init = (pad(cam_fxfycxcy), pad(delta),
                                          pad(pose_init))
        # poison-free padding: unit weights, valid pose
        pose_init = pose_init.at[b:, :].set(
            jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0][:pose_dim]))
        cam_fxfycxcy = cam_fxfycxcy.at[b:].set(
            jnp.asarray([1.0, 1.0, 0.0, 0.0]))
        delta = delta.at[b:].set(1.0)
        if bounds is not None:
            bounds = pad(bounds).at[b:].set(
                jnp.asarray([-1e30, -1e30, 1e30, 1e30], bounds.dtype))
    bp = b + pad_b

    x3d_t = jnp.moveaxis(x3d, -1, 0)  # (3, B, N)
    x2d_t = jnp.moveaxis(x2d, -1, 0)
    w2d_t = jnp.moveaxis(w2d, -1, 0)
    delta2 = delta[:, None]

    kernel = _make_kernel(dof, num_iter, fast_mode, z_min, eps,
                          min_lm_diagonal, max_lm_diagonal,
                          min_relative_decrease,
                          initial_trust_region_radius,
                          max_trust_region_radius, cost_only,
                          with_bounds=bounds is not None, with_jtj=with_jtj)
    grid = (bp // tile_b,)
    bspec = lambda blk, idx: pl.BlockSpec(blk, idx,  # noqa: E731
                                          memory_space=pltpu.VMEM)
    in_specs = [
        bspec((3, tile_b, n), lambda i: (0, i, 0)),
        bspec((2, tile_b, n), lambda i: (0, i, 0)),
        bspec((2, tile_b, n), lambda i: (0, i, 0)),
        bspec((tile_b, 4), lambda i: (i, 0)),
    ]
    inputs = [x3d_t, x2d_t, w2d_t, cam_fxfycxcy]
    if bounds is not None:
        in_specs.append(bspec((tile_b, 4), lambda i: (i, 0)))
        inputs.append(bounds)
    in_specs += [
        bspec((tile_b, 1), lambda i: (i, 0)),
        bspec((tile_b, pose_dim), lambda i: (i, 0)),
    ]
    inputs += [delta2, pose_init]
    out_specs = [
        bspec((tile_b, pose_dim), lambda i: (i, 0)),
        bspec((tile_b, 1), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bp, pose_dim), x3d.dtype),
        jax.ShapeDtypeStruct((bp, 1), x3d.dtype),
    ]
    if with_jtj:
        out_specs.append(bspec((tile_b, n_tri), lambda i: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bp, n_tri), x3d.dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*inputs)
    pose_out, cost_out = outs[0], outs[1]
    if not with_jtj:
        return pose_out[:b], cost_out[:b, 0]
    tri = outs[2][:b]
    jtj = jnp.zeros((b, dof, dof), tri.dtype)
    idx = 0
    for a_ in range(dof):
        for b_ in range(a_ + 1):
            jtj = jtj.at[:, a_, b_].set(tri[:, idx])
            if a_ != b_:
                jtj = jtj.at[:, b_, a_].set(tri[:, idx])
            idx += 1
    return pose_out[:b], cost_out[:b, 0], jtj


def camera_to_fxfycxcy(cam_mats: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3) zero-skew intrinsics -> (B, 4) [fx, fy, cx, cy]."""
    return jnp.stack([cam_mats[..., 0, 0], cam_mats[..., 1, 1],
                      cam_mats[..., 0, 2], cam_mats[..., 1, 2]], axis=-1)
