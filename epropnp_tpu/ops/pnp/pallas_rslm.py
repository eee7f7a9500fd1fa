"""Pallas-fused random-sample (RANSAC-like) PnP initialization kernel.

Fuses the whole RSLM init per object in VMEM: weighted correspondence
sampling with the on-chip PRNG (inverse-CDF, expressed as a one-hot
interval test so the "gather" becomes one MXU matmul), the short
trust-region LM refinement of all proposals in parallel on the sublane
axis, scoring every proposal on the full point set, and the argmin
selection — replacing a 33M-element Gumbel top-k + host-orchestrated
sub-solves that dominated the XLA path (~45 ms of the ~50 ms batch).

Deviation from the reference (levenberg_marquardt.py:305-314): sampling is
WITH replacement (inverse CDF) instead of multinomial without replacement —
statistically near-identical for this init heuristic and documented at the
call site.

Scope matches ``pallas_lm``: zero-skew pinhole; projection bounds are
supported in the packed layout (the training-time border clamps of
camera.py:76-103), bounds-free in the legacy layout.

Two kernel layouts:

- **packed** (default when ``128 % num_points == 0`` and ``n % 128 == 0``):
  the proposal refinement runs at (num_proposals, 16) shapes per object,
  which would leave 7/8 of the 128-lane VPU idle — so ``128 // num_points``
  objects are packed side-by-side into the lane axis (lanes = objects x
  points). Per-object reductions (cost, the JtJ triangle, the gradient)
  become ONE stacked block-diagonal-mask matmul on the MXU per evaluation,
  and the trust-region scalars run at (num_proposals, obj_pack) instead of
  obj_pack separate (num_proposals, 1) instances. Sampling is batched over
  all packed objects with a two-level inverse-CDF search (coarse over the
  128 lane-blocks, fine within the selected block); the cdf block tables
  are precomputed with plain XLA so the kernel issues a handful of big
  matmuls per proposal chunk instead of ~30 tiny ops per object (the
  per-object variant was instruction-issue-bound at ~3x the runtime).
- **legacy** (fallback for irregular ``num_points``/``n``): one object at
  a time, points on the lane axis.

Mosaic layout rules learned the hard way (kept here for future kernels):
concat/reshape of *offset* vector slices fails to lower ("result/input
offset mismatch"), and (1,1)->(p,n) splat chains can fold into unsupported
broadcasts. Packing/unpacking is therefore expressed as 0/1-mask matmuls
over offset-0 operands (ref loads, matmul outputs); (rows, 1) -> 2D
reshapes of matmul outputs are the one reliably lowerable reshape.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lm import _chol_solve, _evaluate, _pose_add


# Flip to True (tests) to run the kernel in interpret mode on CPU: the
# pallas_calls interpret and the on-chip PRNG is replaced by a software
# counter-hash PRNG (murmur3 finalizer over iota ^ seed ^ trace-time salt)
# built from plain uint32 ops, so the full sampling/refinement/scoring
# logic is exercised in CPU CI. Draws differ from the hardware PRNG —
# tests assert distributional quality, not bitwise parity.
INTERPRET = False


class _SoftPRNG:
    """Trace-time state for the interpret-mode PRNG stub."""
    seed = None   # traced uint32, set by _prng_seed
    salt = 0      # python counter: a unique constant per _uniform call site


_soft = _SoftPRNG()


def _prng_seed(val):
    if INTERPRET:
        _soft.seed = jax.lax.convert_element_type(val, jnp.uint32)
        _soft.salt = 0
    else:
        pltpu.prng_seed(val)


def _uniform(shape, extra=None):
    """Uniform [0, 1) draws; ``extra`` is a traced per-iteration salt for
    draws inside rolled loops (ignored on hardware — the on-chip PRNG is
    stateful across loop iterations, the software stub is not).

    WARNING (interpret mode): the software PRNG salts each draw with a
    trace-time Python counter (``_soft.salt``), which is bumped ONCE per
    call SITE. A call site inside a rolled ``fori_loop``/``scan`` body is
    traced once, so without ``extra`` it returns IDENTICAL draws every
    iteration — silently degrading sampling coverage in CPU CI. Any
    ``_uniform`` inside a rolled loop MUST pass the loop counter (or a
    value derived from it) as ``extra``; unrolled/single-shot call sites
    may omit it. Today only ``chunk_body`` draws inside a rolled loop and
    it passes ``extra``."""
    if INTERPRET:
        _soft.salt += 1
        i0 = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        i1 = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        x = i0 * jnp.uint32(shape[1]) + i1
        x = x ^ (_soft.seed * jnp.uint32(0x9E3779B9))
        x = x ^ jnp.uint32((_soft.salt * 0x85EBCA6B) & 0xFFFFFFFF)
        if extra is not None:
            x = x ^ (jax.lax.convert_element_type(extra, jnp.uint32)
                     * jnp.uint32(0xC2B2AE35))
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
        bits = x ^ (x >> jnp.uint32(16))
    else:
        bits = pltpu.prng_random_bits(shape)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24)


def _make_kernel(dof, num_points, num_proposals, num_iter, n_full, z_min,
                 eps, min_lm_diagonal, max_lm_diagonal,
                 min_relative_decrease, initial_trust_region_radius,
                 max_trust_region_radius, tile_obj):
    pose_dim = 4 if dof == 4 else 7
    p = num_proposals
    k = num_points

    def kernel(seed_ref, x3d_ref, x2d_ref, w2d_ref, cam_ref, delta_ref,
               pose_out_ref, cost_out_ref):
        # refs are (tile_obj, c, n) blocks; objects processed sequentially
        # (static unroll) to amortize the per-grid-step overhead
        for obj in range(tile_obj):
            _one_object(obj, seed_ref, x3d_ref, x2d_ref, w2d_ref, cam_ref,
                        delta_ref, pose_out_ref, cost_out_ref)

    def _one_object(obj, seed_ref, x3d_ref, x2d_ref, w2d_ref, cam_ref,
                    delta_ref, pose_out_ref, cost_out_ref):
        _prng_seed(seed_ref[pl.program_id(0) * tile_obj + obj])
        x_f = x3d_ref[obj, 0:1]
        y_f = x3d_ref[obj, 1:2]
        z_f = x3d_ref[obj, 2:3]
        u_f = x2d_ref[obj, 0:1]
        v_f = x2d_ref[obj, 1:2]
        wu_f = w2d_ref[obj, 0:1]
        wv_f = w2d_ref[obj, 1:2]
        fx = cam_ref[obj][:, 0:1]
        fy = cam_ref[obj][:, 1:2]
        cx = cam_ref[obj][:, 2:3]
        cy = cam_ref[obj][:, 3:4]
        delta = delta_ref[obj][:, 0:1]

        # ---- weighted sampling as a one-hot interval test ----
        mean_w = (wu_f + wv_f) * 0.5                     # (1, n)
        # prefix sum as a triangular matmul (cumsum has no TPU lowering)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (n_full, n_full), 0)
        cols_j = jax.lax.broadcasted_iota(jnp.int32, (n_full, n_full), 1)
        tri_mat = (rows_i <= cols_j).astype(jnp.float32)
        csum = jnp.dot(mean_w, tri_mat,
                       preferred_element_type=jnp.float32)  # inclusive cdf
        total = csum[:, -1:]
        u = _uniform((p * k, 1)) * total                 # (p*k, 1)
        lower = jnp.concatenate(
            [jnp.zeros_like(csum[:, :1]), csum[:, :-1]], axis=1)
        onehot = ((u >= lower) & (u < csum)).astype(jnp.float32)
        # gathers = one matmul each: (p*k, n) @ (n, 1) -> (p*k, 1)
        def gather(row):
            return jnp.dot(onehot, row.reshape(n_full, 1),
                           preferred_element_type=jnp.float32
                           ).reshape(p, k)
        x_s, y_s, z_s = gather(x_f), gather(y_f), gather(z_f)
        u_s, v_s = gather(u_f), gather(v_f)
        wu_s, wv_s = gather(wu_f), gather(wv_f)

        # ---- center-based translation init (reference :283-298) ----
        inv_n = 1.0 / n_full
        xc_f = (u_f - cx) / fx
        yc_f = (v_f - cy) / fy
        xc_mean = jnp.sum(xc_f, axis=1)[:, None] * inv_n
        yc_mean = jnp.sum(yc_f, axis=1)[:, None] * inv_n
        bessel = 1.0 / (n_full - 1)
        xc_var = jnp.sum((xc_f - xc_mean) ** 2, axis=1)[:, None] * bessel
        yc_var = jnp.sum((yc_f - yc_mean) ** 2, axis=1)[:, None] * bessel

        def var_of(a):
            m = jnp.sum(a, axis=1)[:, None] * inv_n
            return jnp.sum((a - m) ** 2, axis=1)[:, None] * bessel

        x3_var, y3_var, z3_var = var_of(x_f), var_of(y_f), var_of(z_f)
        if dof == 4:
            scale = jnp.sqrt(y3_var) / jnp.maximum(jnp.sqrt(yc_var), 1e-6)
        else:
            norm3 = jnp.sqrt(x3_var + y3_var + z3_var)
            normc = jnp.sqrt(jnp.maximum(xc_var + yc_var, 1e-12))
            scale = math.sqrt(2.0 / 3.0) * norm3 / jnp.maximum(normc, 1e-6)
        t0 = [xc_mean * scale, yc_mean * scale, scale]   # each (1, 1)

        # ---- random rotation init ----
        if dof == 4:
            yaw = _uniform((p, 1)) * (2.0 * math.pi)
            pose = [jnp.broadcast_to(t, (p, 1)) for t in t0] + [yaw]
        else:
            # Box-Muller normals -> random quaternion
            u1 = jnp.maximum(_uniform((p, 4)), 1e-12)
            u2 = _uniform((p, 4))
            normal = jnp.sqrt(-2.0 * jnp.log(u1)) \
                * jnp.cos(2.0 * math.pi * u2)
            qn = jnp.sqrt(jnp.sum(normal * normal, axis=1))[:, None]
            small = qn < eps
            # identity quaternion built in-kernel (no captured constants)
            e0 = (jax.lax.broadcasted_iota(jnp.int32, (p, 4), 1)
                  == 0).astype(jnp.float32)
            quat = jnp.where(small, e0, normal / jnp.maximum(qn, 1e-30))
            pose = [jnp.broadcast_to(t, (p, 1)) for t in t0] + \
                [quat[:, i:i + 1] for i in range(4)]

        # ---- trust-region LM on the sampled subsets (proposals on rows) --
        fx_p = jnp.broadcast_to(fx, (p, 1))
        fy_p = jnp.broadcast_to(fy, (p, 1))
        cx_p = jnp.broadcast_to(cx, (p, 1))
        cy_p = jnp.broadcast_to(cy, (p, 1))
        d_p = jnp.broadcast_to(delta, (p, 1))

        def ev_sub(pose_cols):
            return _evaluate(pose_cols, x_s, y_s, z_s, u_s, v_s, wu_s, wv_s,
                             fx_p, fy_p, cx_p, cy_p, d_p, dof, z_min, eps)

        cost, jtj, g = ev_sub(pose)
        radius = jnp.full_like(cost, initial_trust_region_radius)
        decrease = jnp.full_like(cost, 2.0)
        tri = [(a, b) for a in range(dof) for b in range(a + 1)]

        def lm_body(_, carry):
            pose, cost, jtj_f, g, radius, decrease = carry
            jtj = dict(zip(tri, jtj_f))
            damped = dict(jtj)
            for a in range(dof):
                d = jtj[(a, a)]
                damped[(a, a)] = d + jnp.clip(
                    d, min_lm_diagonal, max_lm_diagonal) / radius + eps
            step = _chol_solve(damped, g, dof)
            pose_new = _pose_add(pose, step, dof)
            cost_new, jtj_new, g_new = ev_sub(pose_new)
            mcc = jnp.zeros_like(cost)
            for a in range(dof):
                hs = jnp.zeros_like(cost)
                for b in range(dof):
                    key = (a, b) if a >= b else (b, a)
                    hs = hs + jtj[key] * step[b]
                mcc = mcc - step[a] * (hs * 0.5 + g[a])
            rel = (cost - cost_new) / mcc
            ok = jnp.logical_and(rel >= min_relative_decrease, mcc > 0)
            sel = lambda a, b: jnp.where(ok, a, b)  # noqa: E731
            pose = [sel(pn, po) for pn, po in zip(pose_new, pose)]
            cost = sel(cost_new, cost)
            jtj_f = [sel(jtj_new[t], o) for t, o in zip(tri, jtj_f)]
            g = [sel(n_, o_) for n_, o_ in zip(g_new, g)]
            r_ok = radius / jnp.maximum(
                1.0 - (2.0 * rel - 1.0) ** 3, 1.0 / 3.0)
            radius = jnp.clip(jnp.where(ok, r_ok, radius), eps,
                              max_trust_region_radius)
            radius = jnp.where(ok, radius, radius / decrease)
            decrease = jnp.where(ok, 2.0, decrease * 2.0)
            return pose, cost, jtj_f, g, radius, decrease

        carry = (pose, cost, [jtj[t] for t in tri], g, radius, decrease)
        pose, _, _, _, _, _ = jax.lax.fori_loop(0, num_iter, lm_body, carry)

        # ---- score every proposal on the full point set ----
        big = lambda a: jnp.broadcast_to(a, (p, n_full))  # noqa: E731
        cost_full, _, _ = _evaluate(
            pose, big(x_f), big(y_f), big(z_f), big(u_f), big(v_f),
            big(wu_f), big(wv_f), fx_p, fy_p, cx_p, cy_p, d_p, dof, z_min,
            eps)
        # argmin over proposals via min + one-hot select
        cmin = jnp.min(cost_full, axis=0)[None]            # (1, 1)
        is_best = (cost_full <= cmin).astype(jnp.float32)  # (p, 1)
        # normalize in case of ties
        is_best = is_best / jnp.sum(is_best, axis=0)[None]
        for i in range(pose_dim):
            pose_out_ref[obj, :, i:i + 1] = jnp.sum(pose[i] * is_best,
                                                    axis=0)[None]
        cost_out_ref[obj, :, 0:1] = cmin

    return kernel


def _make_packed_kernel(dof, num_points, num_proposals, num_iter, n_full,
                        z_min, eps, min_lm_diagonal, max_lm_diagonal,
                        min_relative_decrease, initial_trust_region_radius,
                        max_trust_region_radius, obj_pack,
                        with_bounds=False, score_n=None, group_pack=1):
    """``group_pack`` = lane-blocks of objects refined together: the LM
    bookkeeping state (cost/JtJ/gradient/radius + the unrolled Cholesky)
    is (p, obj_pack*group_pack) — at the default obj_pack=8 a lone group
    uses 8 of 128 lanes per vreg, so the issue-bound trust-region stage
    wastes 94% of each instruction; packing g groups widens the state to
    8g lanes and divides that cost by g. Sampling and the per-group
    residual evaluation are unchanged (they already fill 128 lanes)."""
    pose_dim = 4 if dof == 4 else 7
    p = num_proposals
    k = num_points
    m = obj_pack
    lanes = m * k
    gp = group_pack
    mg = m * gp
    n_tri = dof * (dof + 1) // 2

    # proposal-axis chunking keeps the (chunk_p*m*k, 256) sampling
    # intermediates well under the ~16 MB VMEM budget
    chunk_p = max(1, min(p, 1024 // (m * k)))
    while p % chunk_p:
        chunk_p -= 1
    n_chunks = p // chunk_p

    def kernel(*refs):
        # x3d_ref: (3, mg, n); x2d/w2d_ref: (2, mg, n); cam_ref: (mg, 4);
        # delta_ref: (mg, 1); [bounds_ref: (mg, 4) lb_u, lb_v, ub_u, ub_v;]
        # cb/cbl_ref: (mg, 128) per-object block cdf
        # bounds; csum/lo_ref: (1, 128, mg*s) inclusive/exclusive cdf
        # values regrouped per lane-block; rows_ref: (1, g, 128, m*s*8)
        # channel values [x,y,z,u,v,wu,wv,0] per group in the same layout;
        # outs: (mg, 1, pose_dim), (mg, 1, 1)
        refs = list(refs)
        seed_ref, x3d_ref, x2d_ref, w2d_ref, cam_ref, delta_ref = refs[:6]
        idx = 6
        bounds_ref = None
        if with_bounds:
            bounds_ref = refs[idx]
            idx += 1
        if score_n is not None:
            # common strided subsample used to rank proposals (see
            # rslm_init_pallas docstring); same points for every proposal
            x3d_sc_ref, x2d_sc_ref, w2d_sc_ref = refs[idx:idx + 3]
            idx += 3
        else:
            x3d_sc_ref, x2d_sc_ref, w2d_sc_ref = x3d_ref, x2d_ref, w2d_ref
        (cb_ref, cbl_ref, csum_ref, lo_ref, rows_ref,
         pose_out_ref, cost_out_ref, chan_scr) = refs[idx:idx + 8]
        x_f = x3d_ref[0]                                 # (m, n)
        y_f = x3d_ref[1]
        z_f = x3d_ref[2]
        u_f = x2d_ref[0]
        v_f = x2d_ref[1]
        wu_f = w2d_ref[0]
        wv_f = w2d_ref[1]
        fx = cam_ref[:, 0:1]                             # (m, 1)
        fy = cam_ref[:, 1:2]
        cx = cam_ref[:, 2:3]
        cy = cam_ref[:, 3:4]
        delta = delta_ref[:, 0:1]

        # ---- center-based translation init, batched over the m objects ----
        inv_n = 1.0 / n_full
        bessel = 1.0 / (n_full - 1)
        xc_f = (u_f - cx) / fx                           # (m, n)
        yc_f = (v_f - cy) / fy
        xc_mean = jnp.sum(xc_f, axis=1)[:, None] * inv_n
        yc_mean = jnp.sum(yc_f, axis=1)[:, None] * inv_n
        xc_var = jnp.sum((xc_f - xc_mean) ** 2, axis=1)[:, None] * bessel
        yc_var = jnp.sum((yc_f - yc_mean) ** 2, axis=1)[:, None] * bessel

        def var_of(a):
            mu = jnp.sum(a, axis=1)[:, None] * inv_n
            return jnp.sum((a - mu) ** 2, axis=1)[:, None] * bessel

        x3_var, y3_var, z3_var = var_of(x_f), var_of(y_f), var_of(z_f)
        if dof == 4:
            scale = jnp.sqrt(y3_var) / jnp.maximum(jnp.sqrt(yc_var), 1e-6)
        else:
            norm3 = jnp.sqrt(x3_var + y3_var + z3_var)
            normc = jnp.sqrt(jnp.maximum(xc_var + yc_var, 1e-12))
            scale = math.sqrt(2.0 / 3.0) * norm3 / jnp.maximum(normc, 1e-6)
        t0 = [xc_mean * scale, yc_mean * scale, scale]   # each (m, 1)

        # Mosaic rejects concat/reshape of offset vector slices, so all
        # packing/unpacking below is expressed as 0/1-mask matmuls over
        # freshly-loaded (offset-0) operands. Per-group masks select the
        # g0 = gi*m .. gi*m+m-1 object columns of the (p, mg) state.
        ei = jax.lax.broadcasted_iota(jnp.int32, (mg, lanes), 0)
        el = jax.lax.broadcasted_iota(jnp.int32, (mg, lanes), 1)
        expand_gs = [(el // k + gi * m == ei).astype(jnp.float32)
                     for gi in range(gp)]                 # each (mg, lanes)
        ri = jax.lax.broadcasted_iota(jnp.int32, (lanes, mg), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (lanes, mg), 1)
        group_mask_gs = [(ri // k + gi * m == rj).astype(jnp.float32)
                         for gi in range(gp)]             # each (lanes, mg)
        ones_1mg = jnp.ones((1, mg), jnp.float32)

        def lane_vec(s, gi):
            """(mg, 1) scalars -> (1, lanes) of group gi, repeated k x."""
            return jnp.dot(ones_1mg, s * expand_gs[gi],
                           preferred_element_type=jnp.float32)

        def row_vec(s):
            """(mg, 1) -> (1, mg): transpose via sum over masked rows."""
            eye_m = (jax.lax.broadcasted_iota(jnp.int32, (mg, mg), 0)
                     == jax.lax.broadcasted_iota(jnp.int32, (mg, mg), 1)
                     ).astype(jnp.float32)
            return jnp.dot(ones_1mg, s * eye_m,
                           preferred_element_type=jnp.float32)

        cam_ls = [tuple(lane_vec(s, gi) for s in (fx, fy, cx, cy, delta))
                  for gi in range(gp)]    # per group (fx, fy, cx, cy, d)
        bounds_ls = None
        if with_bounds:
            bounds_ls = [tuple(lane_vec(bounds_ref[:, i:i + 1], gi)
                               for i in range(4))         # each (1, lanes)
                         for gi in range(gp)]

        # ---- weighted inverse-CDF sampling, batched over ALL m objects ----
        # Two-level search: coarse interval test over the 128 lane-blocks,
        # then a fine test over the s = n/128 bins of the selected block.
        # The cdf tables (cb/cbl block bounds, per-block inclusive/exclusive
        # cdf values, regrouped channel values) are precomputed with plain
        # XLA outside the kernel, so the kernel issues a handful of big
        # matmuls per chunk instead of ~30 tiny ops per object (the
        # per-object variant was instruction-issue-bound, not FLOP-bound).
        # Draw layout: row r of a chunk = (proposal pr, object o, point i)
        # with r = pr*(m*k) + o*k + i, so the gathered column reshapes
        # DIRECTLY into the (p, m*k) packed lane layout.
        mm = lambda a, b: jnp.dot(  # noqa: E731
            a, b, preferred_element_type=jnp.float32)
        s_blk = n_full // 128
        ms = m * s_blk
        mgs = mg * s_blk
        cb_m = cb_ref[...]                               # (mg, 128)
        cbl_m = cbl_ref[...]
        csum_cat = csum_ref[0]                           # (128, mg*s)
        lo_cat = lo_ref[0]
        last_sel = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                    == 127).astype(jnp.float32)
        totals = mm(cb_m, last_sel)                      # (mg, 1)

        _prng_seed(seed_ref[pl.program_id(0) * mg])
        rc = chunk_p * m * k
        bi_c = jax.lax.broadcasted_iota(jnp.int32, (rc, mg), 0)
        bj_c = jax.lax.broadcasted_iota(jnp.int32, (rc, mg), 1)
        fi_c = jax.lax.broadcasted_iota(jnp.int32, (rc, mgs), 0)
        fj_c = jax.lax.broadcasted_iota(jnp.int32, (rc, mgs), 1)
        r8i = jax.lax.broadcasted_iota(jnp.int32, (mgs, ms * 8), 0)
        r8j = jax.lax.broadcasted_iota(jnp.int32, (mgs, ms * 8), 1)
        co_i = jax.lax.broadcasted_iota(jnp.int32, (ms * 8, 8), 0)
        co_j = jax.lax.broadcasted_iota(jnp.int32, (ms * 8, 8), 1)
        collapse = (co_i % 8 == co_j).astype(jnp.float32)  # (ms*8, 8)
        ch_i = jax.lax.broadcasted_iota(jnp.int32, (8, 7), 0)
        ch_j = jax.lax.broadcasted_iota(jnp.int32, (8, 7), 1)
        ch_sel = (ch_i == ch_j).astype(jnp.float32)      # (8, 7)

        # each chunk's 7 surviving channel slices go straight into the
        # chan_scr VMEM scratch (gp*7, p, lanes): a value that survives
        # the chunk would sit above the chunk's large temporaries on
        # Mosaic's LIFO scoped-vmem stack and leak their space — with
        # gp * n_chunks unrolled iterations that peaked >100 MB
        for gi in range(gp):
            g0 = gi * m
            blk_ind = ((bi_c // k) % m + g0 == bj_c).astype(jnp.float32)
            ownmask = (fj_c // s_blk == (fi_c // k) % m + g0).astype(
                jnp.float32)                             # (rc, mg*s)
            rep8 = (r8i == g0 * s_blk + r8j // 8).astype(jnp.float32)
            rows_cat = rows_ref[0, gi]                   # (128, m*s*8)

            def chunk_body(ci, _, blk_ind=blk_ind, ownmask=ownmask,
                           rep8=rep8, rows_cat=rows_cat, gi=gi):
                u = _uniform((rc, 1), extra=ci) * mm(blk_ind, totals)
                cb_r = mm(blk_ind, cb_m)                 # (rc, 128)
                cbl_r = mm(blk_ind, cbl_m)
                coarse = ((u >= cbl_r) & (u < cb_r)).astype(jnp.float32)
                inner = mm(coarse, csum_cat)             # (rc, mg*s)
                lfine = mm(coarse, lo_cat)
                fine = ((u >= lfine) & (u < inner)).astype(jnp.float32) \
                    * ownmask
                tmp = mm(coarse, rows_cat)               # (rc, m*s*8)
                fine8 = mm(fine, rep8)                   # (rc, m*s*8)
                gath = mm(fine8 * tmp, collapse)         # (rc, 8)
                for c in range(7):
                    gc = mm(gath, ch_sel[:, c:c + 1])    # (rc, 1)
                    chan_scr[gi * 7 + c,
                             pl.ds(ci * chunk_p, chunk_p)] = \
                        gc.reshape(chunk_p, lanes)
                return 0

            if gp == 1:
                # unrolled: measured ~0.8 ms faster than the rolled loop
                # at n_chunks=8 (loop overhead dominates the small body),
                # and the ~3 MB/chunk scoped-vmem stack leak of the
                # unrolled form stays within budget at gp=1
                for ci in range(n_chunks):
                    chunk_body(ci, 0)
            else:
                # rolled: ONE chunk body in the instruction stream. The
                # unrolled form leaks each chunk's matmul temporaries on
                # the LIFO scoped-vmem stack under the surviving scratch
                # stores (gp * n_chunks iterations peaked >100 MB) and
                # bloats compile time ~8x
                jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        chans = [tuple(chan_scr[gi * 7 + c] for c in range(7))
                 for gi in range(gp)]                    # (p, lanes) x 7

        # ---- pose columns (p, mg): objects on the lane axis ----
        ones_p1 = jnp.ones((p, 1), jnp.float32)
        t_cols = [jnp.dot(ones_p1, row_vec(t0[c]),
                          preferred_element_type=jnp.float32)
                  for c in range(3)]
        if dof == 4:
            rot_cols = [_uniform((p, mg)) * (2.0 * math.pi)]
        else:
            # Box-Muller quaternions for all objects at once: (p, 4mg)
            u1 = jnp.maximum(_uniform((p, 4 * mg)), 1e-12)
            u2 = _uniform((p, 4 * mg))
            normal = jnp.sqrt(-2.0 * jnp.log(u1)) \
                * jnp.cos(2.0 * math.pi * u2)
            g4i = jax.lax.broadcasted_iota(jnp.int32, (4 * mg, mg), 0)
            g4j = jax.lax.broadcasted_iota(jnp.int32, (4 * mg, mg), 1)
            group4 = (g4i // 4 == g4j).astype(jnp.float32)   # (4mg, mg)
            qn = jnp.sqrt(mm(normal * normal, group4))       # (p, mg)
            rp4i = jax.lax.broadcasted_iota(jnp.int32, (mg, 4 * mg), 0)
            rp4j = jax.lax.broadcasted_iota(jnp.int32, (mg, 4 * mg), 1)
            rep4 = (rp4j // 4 == rp4i).astype(jnp.float32)   # (mg, 4mg)
            qn_exp = mm(qn, rep4)                            # (p, 4mg)
            e0 = (jax.lax.broadcasted_iota(jnp.int32, (p, 4 * mg), 1) % 4
                  == 0).astype(jnp.float32)
            quat = jnp.where(qn_exp < eps, e0,
                             normal / jnp.maximum(qn_exp, 1e-30))
            rot_cols = [
                mm(quat, (g4i == g4j * 4 + c).astype(jnp.float32))
                for c in range(4)]                           # each (p, mg)
        pose = t_cols + rot_cols

        def ev_packed(pose_cols):
            """cost/JtJ/gradient, all (p, mg). Per group: one matmul for
            the lane-expansion of the pose, elementwise residual/Jacobian
            on (p, 128), one matmul for all 28 reductions whose columns
            land at the group's offset of the (p, mg) state."""
            ps = jnp.concatenate(pose_cols, axis=0)            # (pd*p, mg)
            red = None
            for gi in range(gp):
                x_s, y_s, z_s, u_s, v_s, wu_s, wv_s = chans[gi]
                fx_l, fy_l, cx_l, cy_l, d_l = cam_ls[gi]
                pe = jnp.dot(ps, expand_gs[gi],
                             preferred_element_type=jnp.float32)  # (pd*p, L)
                cols = [pe[i * p:(i + 1) * p] for i in range(pose_dim)]
                if dof == 4:
                    tx, ty, tz, yaw = cols
                    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
                    xr = cy_ * x_s + sy_ * z_s
                    yr = y_s
                    zr = -sy_ * x_s + cy_ * z_s
                else:
                    tx, ty, tz, qw, qi, qj, qk = cols
                    qn = jax.lax.rsqrt(
                        qw * qw + qi * qi + qj * qj + qk * qk + 1e-24)
                    w, i_, j_, k_ = qw * qn, qi * qn, qj * qn, qk * qn
                    xr = (1 - 2 * (j_ * j_ + k_ * k_)) * x_s \
                        + 2 * (i_ * j_ - k_ * w) * y_s \
                        + 2 * (i_ * k_ + j_ * w) * z_s
                    yr = 2 * (i_ * j_ + k_ * w) * x_s \
                        + (1 - 2 * (i_ * i_ + k_ * k_)) * y_s \
                        + 2 * (j_ * k_ - i_ * w) * z_s
                    zr = 2 * (i_ * k_ - j_ * w) * x_s \
                        + 2 * (j_ * k_ + i_ * w) * y_s \
                        + (1 - 2 * (i_ * i_ + j_ * j_)) * z_s
                xc, yc, zc_raw = xr + tx, yr + ty, zr + tz
                zc = jnp.maximum(zc_raw, z_min)
                u = (fx_l * xc + cx_l * zc_raw) / zc
                v = (fy_l * yc + cy_l * zc_raw) / zc
                if with_bounds:
                    lb_u, lb_v, ub_u, ub_v = bounds_ls[gi]
                    in_u = jnp.logical_and(u > lb_u,
                                           u < ub_u).astype(u.dtype)
                    in_v = jnp.logical_and(v > lb_v,
                                           v < ub_v).astype(v.dtype)
                    u = jnp.clip(u, lb_u, ub_u)
                    v = jnp.clip(v, lb_v, ub_v)
                ru = (u - u_s) * wu_s
                rv = (v - v_s) * wv_s
                ss = ru * ru + rv * rv
                s_sqrt = jnp.sqrt(jnp.maximum(ss, 1e-24))
                cost_el = jnp.where(s_sqrt <= d_l, 0.5 * ss,
                                    d_l * s_sqrt - 0.5 * d_l * d_l)
                rho = jnp.sqrt(jnp.minimum(
                    d_l / jnp.maximum(s_sqrt, 1e-10), 1.0))
                live = (zc_raw >= z_min).astype(u.dtype)
                live_u = live * in_u if with_bounds else live
                live_v = live * in_v if with_bounds else live
                du0 = fx_l / zc * live_u
                du2 = (cx_l - u) / zc * live_u
                dv1 = fy_l / zc * live_v
                dv2 = (cy_l - v) / zc * live_v
                swu = wu_s * rho
                swv = wv_s * rho
                if dof == 4:
                    ju = [du0 * swu, jnp.zeros_like(du0), du2 * swu,
                          (du0 * zr - du2 * xr) * swu]
                    jv = [jnp.zeros_like(dv1), dv1 * swv, dv2 * swv,
                          (-dv2 * xr) * swv]
                else:
                    w0, w1, w2 = 2 * xr, 2 * yr, 2 * zr
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
                red_ops = [cost_el]
                for a in range(dof):
                    for b in range(a + 1):
                        red_ops.append(ju[a] * ju[b] + jv[a] * jv[b])
                for a in range(dof):
                    red_ops.append(ju[a] * ru_s + jv[a] * rv_s)
                red_g = jnp.dot(jnp.concatenate(red_ops, axis=0),
                                group_mask_gs[gi],
                                preferred_element_type=jnp.float32)
                red = red_g if red is None else red + red_g    # (28p, mg)
            cost = red[:p]
            jtj = {}
            idx = 1
            for a in range(dof):
                for b in range(a + 1):
                    jtj[(a, b)] = red[idx * p:(idx + 1) * p]
                    idx += 1
            g_vec = []
            for a in range(dof):
                g_vec.append(red[idx * p:(idx + 1) * p])
                idx += 1
            return cost, jtj, g_vec

        # ---- trust-region LM on (p, mg) state ----
        cost, jtj, g = ev_packed(pose)
        radius = jnp.full_like(cost, initial_trust_region_radius)
        decrease = jnp.full_like(cost, 2.0)
        tri = [(a, b) for a in range(dof) for b in range(a + 1)]

        def lm_body(_, carry):
            pose, cost, jtj_f, g, radius, decrease = carry
            jtj = dict(zip(tri, jtj_f))
            damped = dict(jtj)
            for a in range(dof):
                d = jtj[(a, a)]
                damped[(a, a)] = d + jnp.clip(
                    d, min_lm_diagonal, max_lm_diagonal) / radius + eps
            step = _chol_solve(damped, g, dof)
            pose_new = _pose_add(pose, step, dof)
            cost_new, jtj_new, g_new = ev_packed(pose_new)
            mcc = jnp.zeros_like(cost)
            for a in range(dof):
                hs = jnp.zeros_like(cost)
                for b in range(dof):
                    key = (a, b) if a >= b else (b, a)
                    hs = hs + jtj[key] * step[b]
                mcc = mcc - step[a] * (hs * 0.5 + g[a])
            rel = (cost - cost_new) / mcc
            ok = jnp.logical_and(rel >= min_relative_decrease, mcc > 0)
            sel = lambda a, b: jnp.where(ok, a, b)  # noqa: E731
            pose = [sel(pn, po) for pn, po in zip(pose_new, pose)]
            cost = sel(cost_new, cost)
            jtj_f = [sel(jtj_new[t], o_) for t, o_ in zip(tri, jtj_f)]
            g = [sel(n_, o_) for n_, o_ in zip(g_new, g)]
            r_ok = radius / jnp.maximum(
                1.0 - (2.0 * rel - 1.0) ** 3, 1.0 / 3.0)
            radius = jnp.clip(jnp.where(ok, r_ok, radius), eps,
                              max_trust_region_radius)
            radius = jnp.where(ok, radius, radius / decrease)
            decrease = jnp.where(ok, 2.0, decrease * 2.0)
            return pose, cost, jtj_f, g, radius, decrease

        carry = (pose, cost, [jtj[t] for t in tri], g, radius, decrease)
        for it in range(num_iter):
            carry = lm_body(it, carry)
        pose = carry[0]

        # ---- score every proposal on the scoring point set; argmin/object
        # (full set, or the common strided subsample when score_n is set) --
        n_sc = n_full if score_n is None else score_n
        oj_r = jax.lax.broadcasted_iota(jnp.int32, (mg, 1), 0)
        for o in range(mg):
            e_o = (oj_r == o).astype(jnp.float32)            # (mg, 1)
            pose_o = [jnp.dot(c, e_o, preferred_element_type=jnp.float32)
                      for c in pose]                         # (p, 1) offset-0
            big = lambda a: jnp.broadcast_to(a, (p, n_sc))  # noqa: E731
            # (1, 1)->(p, 1) splats fold into unsupported broadcasts;
            # materialize per-object scalars with a (p,1)@(1,4) matmul
            ones_p1 = jnp.ones((p, 1), jnp.float32)
            cam_p = jnp.dot(ones_p1, cam_ref[o:o + 1],
                            preferred_element_type=jnp.float32)  # (p, 4)
            d_o = jnp.dot(ones_p1, delta_ref[o:o + 1],
                          preferred_element_type=jnp.float32)    # (p, 1)
            bounds_o = None
            if with_bounds:
                b_p = jnp.dot(ones_p1, bounds_ref[o:o + 1],
                              preferred_element_type=jnp.float32)  # (p, 4)
                bounds_o = tuple(b_p[:, i:i + 1] for i in range(4))
            cost_full, _, _ = _evaluate(
                pose_o,
                big(x3d_sc_ref[0, o:o + 1]), big(x3d_sc_ref[1, o:o + 1]),
                big(x3d_sc_ref[2, o:o + 1]), big(x2d_sc_ref[0, o:o + 1]),
                big(x2d_sc_ref[1, o:o + 1]), big(w2d_sc_ref[0, o:o + 1]),
                big(w2d_sc_ref[1, o:o + 1]), cam_p[:, 0:1], cam_p[:, 1:2],
                cam_p[:, 2:3], cam_p[:, 3:4], d_o, dof, z_min, eps,
                bounds=bounds_o)
            cmin = jnp.min(cost_full, axis=0)[None]          # (1, 1)
            is_best = (cost_full <= cmin).astype(jnp.float32)
            is_best = is_best / jnp.sum(is_best, axis=0)[None]
            for i in range(pose_dim):
                pose_out_ref[o, :, i:i + 1] = jnp.sum(
                    pose_o[i] * is_best, axis=0)[None]
            cost_out_ref[o, :, 0:1] = cmin

    return kernel


def _rslm_init_packed(x3d, x2d, w2d, cam_fxfycxcy, delta, seeds, dof,
                      num_points, num_proposals, num_iter, obj_pack, z_min,
                      eps, min_lm_diagonal, max_lm_diagonal,
                      min_relative_decrease, initial_trust_region_radius,
                      max_trust_region_radius, bounds=None,
                      score_points=None, group_pack=1):
    b, n, _ = x3d.shape
    m = obj_pack
    gp = group_pack
    mg = m * gp
    pose_dim = 4 if dof == 4 else 7
    pad_b = (-b) % mg
    if pad_b:
        pad = lambda a: jnp.pad(a, [(0, pad_b)] + [(0, 0)] * (a.ndim - 1))
        # benign padding: zero geometry, unit weights/cam -> the dummy
        # objects converge to the z_min clamp with zeroed Jacobians
        x3d, x2d = pad(x3d), pad(x2d)
        w2d = pad(w2d).at[b:].set(1.0)
        cam_fxfycxcy = pad(cam_fxfycxcy).at[b:].set(
            jnp.asarray([1.0, 1.0, 0.0, 0.0]))
        delta = pad(delta).at[b:].set(1.0)
        seeds = pad(seeds)
        if bounds is not None:
            bounds = pad(bounds).at[b:].set(
                jnp.asarray([-1e30, -1e30, 1e30, 1e30], bounds.dtype))
    bp = b + pad_b
    nt = bp // mg
    s_blk = n // 128

    # XLA pre-pass: exact inclusive/exclusive cdf of the mean weights and
    # the per-lane-block regrouped tables the kernel's two-level inverse-CDF
    # search consumes. lower is csum shifted by one (NOT csum - w), so
    # adjacent sampling intervals share boundaries bit-exactly and exactly
    # one (block, bin) fires per draw.
    f32 = jnp.float32
    mean_w = jnp.mean(w2d.astype(f32), axis=-1)          # (B, n)
    csum = jnp.cumsum(mean_w, axis=-1)
    lo = jnp.pad(csum[:, :-1], ((0, 0), (1, 0)))
    csum_r = csum.reshape(bp, 128, s_blk)
    lo_r = lo.reshape(bp, 128, s_blk)
    cb = csum_r[..., -1]                                 # (B, 128)
    cbl = lo_r[..., 0]
    rows = jnp.concatenate(
        [x3d.astype(f32), x2d.astype(f32), w2d.astype(f32),
         jnp.zeros((bp, n, 1), f32)], axis=-1)           # (B, n, 8)
    regroup = lambda a, d: a.reshape(nt, mg, 128, s_blk * d).transpose(  # noqa: E731,E501
        0, 2, 1, 3).reshape(nt, 128, mg * s_blk * d)
    csum_cat = regroup(csum_r, 1)                        # (nt, 128, mg*s)
    lo_cat = regroup(lo_r, 1)
    # per-group rows tables (nt, gp, 128, m*s*8): the kernel indexes the
    # group on a leading axis instead of lane-slicing the full-width table
    rows_cat = regroup(rows.reshape(bp, 128, s_blk * 8), 8).reshape(
        nt, 128, gp, m * s_blk * 8).transpose(0, 2, 1, 3)

    kernel = _make_packed_kernel(
        dof, num_points, num_proposals, num_iter, n, z_min, eps,
        min_lm_diagonal, max_lm_diagonal, min_relative_decrease,
        initial_trust_region_radius, max_trust_region_radius, m,
        with_bounds=bounds is not None, score_n=score_points,
        group_pack=gp)
    x3d_t = jnp.moveaxis(x3d, -1, 0)   # (3, B, n)
    x2d_t = jnp.moveaxis(x2d, -1, 0)
    w2d_t = jnp.moveaxis(w2d, -1, 0)
    score_in = []
    if score_points is not None:
        # common strided subsample for proposal ranking (same points for
        # every proposal of an object -> unbiased comparison)
        stride = n // score_points
        score_in = [x3d_t[..., ::stride], x2d_t[..., ::stride],
                    w2d_t[..., ::stride]]
    delta2 = delta[:, None]
    bspec = lambda blk, idx: pl.BlockSpec(blk, idx,  # noqa: E731
                                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            bspec((3, mg, n), lambda i, s: (0, i, 0)),
            bspec((2, mg, n), lambda i, s: (0, i, 0)),
            bspec((2, mg, n), lambda i, s: (0, i, 0)),
            bspec((mg, 4), lambda i, s: (i, 0)),
            bspec((mg, 1), lambda i, s: (i, 0)),
        ] + ([bspec((mg, 4), lambda i, s: (i, 0))] if bounds is not None
             else []) + (
            [bspec((3, mg, score_points), lambda i, s: (0, i, 0)),
             bspec((2, mg, score_points), lambda i, s: (0, i, 0)),
             bspec((2, mg, score_points), lambda i, s: (0, i, 0))]
            if score_points is not None else []) + [
            bspec((mg, 128), lambda i, s: (i, 0)),
            bspec((mg, 128), lambda i, s: (i, 0)),
            bspec((1, 128, mg * s_blk), lambda i, s: (i, 0, 0)),
            bspec((1, 128, mg * s_blk), lambda i, s: (i, 0, 0)),
            bspec((1, gp, 128, m * s_blk * 8), lambda i, s: (i, 0, 0, 0)),
        ],
        out_specs=[
            bspec((mg, 1, pose_dim), lambda i, s: (i, 0, 0)),
            bspec((mg, 1, 1), lambda i, s: (i, 0, 0)),
        ],
        scratch_shapes=[
            # sampled channel values [x,y,z,u,v,wu,wv] per group
            pltpu.VMEM((gp * 7, num_proposals, m * num_points),
                       jnp.float32),
        ],
    )
    pose, cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1, pose_dim), x3d.dtype),
            jax.ShapeDtypeStruct((bp, 1, 1), x3d.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # the chunked sampling stage peaks above the default 16 MB
            # scoped-vmem budget; v5e has 128 MB of physical VMEM
            vmem_limit_bytes=(64 if gp == 1 else 100) * 1024 * 1024),
        interpret=INTERPRET,
    )(seeds, x3d_t, x2d_t, w2d_t, cam_fxfycxcy, delta2,
      *([] if bounds is None else [bounds]), *score_in,
      cb, cbl, csum_cat, lo_cat, rows_cat)
    return pose[:b, 0], cost[:b, 0, 0]


@functools.partial(
    jax.jit, static_argnames=('dof', 'num_points', 'num_proposals',
                              'num_iter', 'z_min', 'eps', 'min_lm_diagonal',
                              'max_lm_diagonal', 'min_relative_decrease',
                              'initial_trust_region_radius',
                              'max_trust_region_radius', 'tile_obj',
                              'score_points', 'group_pack'))
def rslm_init_pallas(x3d, x2d, w2d, cam_fxfycxcy, delta, seeds,
                     bounds=None,
                     dof: int = 6, num_points: int = 16,
                     num_proposals: int = 64, num_iter: int = 3,
                     tile_obj: int = 4,
                     z_min: float = 0.1, eps: float = 1e-5,
                     min_lm_diagonal: float = 1e-6,
                     max_lm_diagonal: float = 1e32,
                     min_relative_decrease: float = 1e-3,
                     initial_trust_region_radius: float = 30.0,
                     max_trust_region_radius: float = 1e16,
                     score_points: int = None,
                     group_pack: int = 1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused RSLM init. Returns (pose_init (B, pose_dim), best cost (B,)).

    Args:
        seeds: (B,) int32 per-object PRNG seeds.
        bounds: None or (B, 4) [lb_u, lb_v, ub_u, ub_v] projection bounds
            (packed layout only; the legacy layout is bounds-free).
        group_pack: lane-blocks of objects refined together per grid step
            (packed layout only; see _make_packed_kernel). Widens the
            trust-region state from 8 to 8*group_pack lanes and rolls the
            sampling chunk loop. Measured NEUTRAL on 1x v5e at B=1024,
            N=512 (the rolled-loop overhead eats the bookkeeping gain;
            gp=4 5.5 ms vs gp=1 5.2 ms unrolled) but compiles ~8x faster
            — kept as a tuning knob for other shapes/generations.
        score_points: rank proposals on an every-(n/score_points)-th-point
            strided subsample instead of the full set (packed layout only;
            multiple of 128). The subsample is COMMON to all proposals of
            an object, so the comparison is unbiased; the returned cost is
            the subsample cost (callers needing the full-set cost of the
            winner re-evaluate it — one cheap XLA pass). Scoring dominates
            the kernel at large N, so 128 cuts the init ~2x at N=512 with
            no measurable effect on post-refinement quality. None = exact
            full-set ranking (reference :344-347 semantics).
    """
    if (num_points <= 128 and 128 % num_points == 0
            and x3d.shape[1] % 128 == 0):
        if (score_points is not None
                and (score_points % 128 != 0
                     or x3d.shape[1] % score_points != 0
                     or score_points >= x3d.shape[1])):
            score_points = None  # full scoring
        m_pack = 128 // num_points
        gp = max(1, min(group_pack, x3d.shape[0] // m_pack))
        while m_pack * gp > 128 or (gp & (gp - 1)):  # pow2, state <= 128
            gp -= 1
        return _rslm_init_packed(
            x3d, x2d, w2d, cam_fxfycxcy, delta, seeds, dof, num_points,
            num_proposals, num_iter, m_pack, z_min, eps,
            min_lm_diagonal, max_lm_diagonal, min_relative_decrease,
            initial_trust_region_radius, max_trust_region_radius,
            bounds=bounds, score_points=score_points, group_pack=gp)
    assert bounds is None, 'projection bounds need the packed kernel layout'
    b, n, _ = x3d.shape
    assert b % tile_obj == 0, (b, tile_obj)
    pose_dim = 4 if dof == 4 else 7
    kernel = _make_kernel(dof, num_points, num_proposals, num_iter, n,
                          z_min, eps, min_lm_diagonal, max_lm_diagonal,
                          min_relative_decrease,
                          initial_trust_region_radius,
                          max_trust_region_radius, tile_obj)
    # layouts (B, c, n): per-object blocks keep the trailing dims equal to
    # the full array dims (the TPU block constraint)
    x3d_t = jnp.moveaxis(x3d, -1, 1)   # (B, 3, n)
    x2d_t = jnp.moveaxis(x2d, -1, 1)
    w2d_t = jnp.moveaxis(w2d, -1, 1)
    cam_r = cam_fxfycxcy[:, None, :]   # (B, 1, 4)
    delta_r = delta[:, None, None]     # (B, 1, 1)
    bspec = lambda blk, idx: pl.BlockSpec(blk, idx,  # noqa: E731
                                          memory_space=pltpu.VMEM)
    t = tile_obj
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // t,),
        in_specs=[
            bspec((t, 3, n), lambda i, s: (i, 0, 0)),
            bspec((t, 2, n), lambda i, s: (i, 0, 0)),
            bspec((t, 2, n), lambda i, s: (i, 0, 0)),
            bspec((t, 1, 4), lambda i, s: (i, 0, 0)),
            bspec((t, 1, 1), lambda i, s: (i, 0, 0)),
        ],
        out_specs=[
            bspec((t, 1, pose_dim), lambda i, s: (i, 0, 0)),
            bspec((t, 1, 1), lambda i, s: (i, 0, 0)),
        ],
    )

    pose, cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, pose_dim), x3d.dtype),
            jax.ShapeDtypeStruct((b, 1, 1), x3d.dtype),
        ],
        interpret=INTERPRET,
    )(seeds, x3d_t, x2d_t, w2d_t, cam_r, delta_r)
    return pose[:, 0], cost[:, 0, 0]
