"""Batched Levenberg-Marquardt / Gauss-Newton PnP solvers (pure JAX).

Semantics follow the reference ``epropnp/levenberg_marquardt.py``: a fixed
iteration count LM with a Ceres-style trust region, a Gauss-Newton
``fast_mode``, a differentiable single GN step for derivative regularization,
and a random-sample (RANSAC-like) initialization solver.

TPU-first restructuring:
  * The solve loop is a ``lax.fori_loop`` whose carry holds the current pose
    AND its evaluation (jac/residual/cost). The reference evaluates once per
    iteration at the trial pose and lazily merges accepted trials at the start
    of the next iteration (``_lm_iter``, reference :192-241); merging inside
    the loop with ``jnp.where`` is numerically identical and keeps shapes
    static.
  * Data-dependent branches (init-solver-vs-pose-init selection :126-127,
    accept/reject masks :199-201,232-240) become masked ``jnp.where`` lanes.
  * The whole solve runs under ``stop_gradient`` (the reference wraps it in
    ``torch.no_grad``); only ``gn_step`` is differentiable.
  * Explicit PRNG keys replace global RNG in the random-sample solver;
    weighted subset sampling without replacement uses the Gumbel top-k trick
    (equal in distribution to ``torch.multinomial(replacement=False)``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .common import evaluate_pnp, pnp_denormalize, pnp_normalize
from .linalg import inv_spd_small, solve_3x3, solve_spd_small


def _stop_grad(*trees):
    return tuple(jax.lax.stop_gradient(t) for t in trees)


@dataclass(frozen=True)
class LMSolver:
    """Levenberg-Marquardt solver with a fixed number of iterations.

    Pose layouts: 4DoF ``[x, y, z, yaw]``; 6DoF ``[x, y, z, w, i, j, k]``
    with a unit quaternion. Reference: epropnp/levenberg_marquardt.py:22-265.
    """

    dof: int = 4
    num_iter: int = 10
    min_lm_diagonal: float = 1e-6
    max_lm_diagonal: float = 1e32
    min_relative_decrease: float = 1e-3
    initial_trust_region_radius: float = 30.0
    max_trust_region_radius: float = 1e16
    eps: float = 1e-5
    normalize: bool = False
    init_solver: Optional["RSLMSolver"] = None
    # Route the solve through the fused Pallas TPU kernel (pallas_lm.py).
    # Valid for zero-skew pinhole cameras with a per-object Huber delta;
    # projection bounds and the pose covariance output are supported, so
    # both the serving and the training (Monte Carlo) paths qualify.
    use_pallas: bool = False

    @property
    def pose_dim(self) -> int:
        return 4 if self.dof == 4 else 7

    # ------------------------------------------------------------------ API

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, x3d, x2d, w2d, camera, cost_fun, rng=None,
                with_pose_opt_plus=False, pose_init=None,
                normalize_override=None, **kwargs):
        """Solve, optionally followed by one differentiable GN plus-step.

        The plus-step re-linearizes at the converged pose so gradients
        flow through a single Gauss-Newton update rather than the whole
        iteration (the implicit-differentiation trick the training path
        relies on). When ``normalize`` is set, the 3D points are centred
        and scaled before the solve and the pose is mapped back after.

        Returns ``(pose_opt, pose_cov, cost, pose_opt_plus)``.
        Reference semantics: epropnp/levenberg_marquardt.py:55-78.
        """
        normalize = normalize_override if isinstance(normalize_override, bool) \
            else self.normalize
        if normalize:
            transform, x3d, pose_init = pnp_normalize(
                x3d, pose_init, detach_transformation=True)

        pose_opt, pose_cov, cost = self.solve(
            x3d, x2d, w2d, camera, cost_fun, rng=rng, pose_init=pose_init,
            **kwargs)
        if with_pose_opt_plus:
            step = self.gn_step(x3d, x2d, w2d, pose_opt, camera, cost_fun)
            pose_opt_plus = self.pose_add(pose_opt, step, camera)
        else:
            pose_opt_plus = None

        if normalize:
            pose_opt = pnp_denormalize(transform, pose_opt)
            if pose_cov is not None:
                # the covariance lives in the normalized coordinates; we
                # have no mapping back, so refuse rather than return a
                # silently-wrong matrix (the reference refuses too)
                raise NotImplementedError(
                    'pose covariance cannot be requested together with '
                    'point normalization — solve with normalize=False')
            if pose_opt_plus is not None:
                pose_opt_plus = pnp_denormalize(transform, pose_opt_plus)
        return pose_opt, pose_cov, cost, pose_opt_plus

    def solve(self, x3d, x2d, w2d, camera, cost_fun, rng=None, pose_init=None,
              cost_init=None, with_pose_cov=False, with_cost=False,
              force_init_solve=False, fast_mode=False):
        """Non-differentiable batched solve.

        Args:
            x3d/x2d/w2d: (num_obj, num_pts, {3,2,2}).
            rng: PRNG key for the init solver (optional).
            pose_init: (num_obj, 4 or 7) or None.

        Returns:
            (pose_opt, pose_cov | None, cost | None).
        Reference: epropnp/levenberg_marquardt.py:80-190.
        """
        x3d, x2d, w2d, camera, cost_fun, pose_init, cost_init = _stop_grad(
            x3d, x2d, w2d, camera, cost_fun, pose_init, cost_init)

        def evaluate_fun(pose, out_jacobian=False, out_residual=False,
                         out_cost=False):
            return evaluate_pnp(
                x3d, x2d, w2d, pose, camera, cost_fun,
                out_jacobian=out_jacobian, out_residual=out_residual,
                out_cost=out_cost, clip_jac=not fast_mode)

        if self.use_pallas:
            return self._solve_pallas(
                x3d, x2d, w2d, camera, cost_fun, rng=rng,
                pose_init=pose_init, cost_init=cost_init,
                with_pose_cov=with_pose_cov, with_cost=with_cost,
                force_init_solve=force_init_solve, fast_mode=fast_mode)

        # ---- initialization (reference :115-130) ----
        if pose_init is None or force_init_solve:
            assert self.init_solver is not None
            if rng is None:
                rng = jax.random.PRNGKey(0)
            if pose_init is None:
                pose_opt, _, _ = self.init_solver.solve(
                    x3d, x2d, w2d, camera, cost_fun, rng=rng,
                    fast_mode=fast_mode)
            else:
                if cost_init is None:
                    cost_init = evaluate_fun(pose_init, out_cost=True).cost
                pose_init_solve, _, cost_init_solve = self.init_solver.solve(
                    x3d, x2d, w2d, camera, cost_fun, rng=rng, with_cost=True,
                    fast_mode=fast_mode)
                use_init = cost_init < cost_init_solve
                pose_opt = jnp.where(use_init[..., None], pose_init,
                                     pose_init_solve)
        else:
            pose_opt = pose_init

        if fast_mode:
            # Pure Gauss-Newton, no trust region (reference :136-152). The
            # reference's jtj/cost after the loop are those evaluated at the
            # pose BEFORE the final update — carried here for exact parity.
            def gn_body(_, carry):
                pose, _, _ = carry
                ev = evaluate_fun(pose, out_jacobian=True, out_residual=True,
                                  out_cost=True)
                jtj = _jtj_damped_const(ev.jacobian, self.eps)
                gradient = jnp.einsum('...ji,...j->...i', ev.jacobian,
                                      ev.residual)
                step = -solve_spd_small(jtj, gradient)
                return self.pose_add(pose, step, camera), jtj, ev.cost

            dof = self.dof
            num_obj = x2d.shape[0]
            dtype = jnp.result_type(x3d.dtype, x2d.dtype, w2d.dtype,
                                    camera.cam_mats.dtype)
            carry0 = (pose_opt.astype(dtype),
                      jnp.zeros((num_obj, dof, dof), dtype),
                      jnp.zeros((num_obj,), dtype))
            pose_opt, jtj, cost = jax.lax.fori_loop(
                0, self.num_iter, gn_body, carry0)
            pose_cov = inv_spd_small(jtj) if with_pose_cov else None
            if not with_cost:
                cost = None
            return pose_opt, pose_cov, cost

        # ---- full LM with trust region (reference :153-176) ----
        ev0 = evaluate_fun(pose_opt, out_jacobian=True, out_residual=True,
                           out_cost=True)
        num_obj = x2d.shape[0]
        dtype = ev0.cost.dtype  # follows input promotion (e.g. f64 cam_mats)
        pose_opt = pose_opt.astype(dtype)
        radius = jnp.full((num_obj,), self.initial_trust_region_radius, dtype)
        decrease_factor = jnp.full((num_obj,), 2.0, dtype)

        def lm_body(_, carry):
            pose, jac, residual, cost, radius, decrease_factor = carry
            jac_t = jnp.swapaxes(jac, -1, -2)
            jtj = jac_t @ jac
            # LM damping: diag += clamp(diag)/radius + eps (reference :208-211)
            diag = _diagonal(jtj)
            diag_lm = diag + jnp.clip(
                diag, self.min_lm_diagonal, self.max_lm_diagonal
            ) / radius[..., None] + self.eps
            jtj_lm = _set_diagonal(jtj, diag_lm)

            gradient = jnp.einsum('...ij,...j->...i', jac_t, residual)
            step = -solve_spd_small(jtj_lm, gradient)

            pose_new = self.pose_add(pose, step, camera)
            ev = evaluate_fun(pose_new, out_jacobian=True, out_residual=True,
                              out_cost=True)

            model_cost_change = -jnp.einsum(
                '...i,...i->...', step,
                jnp.einsum('...ij,...j->...i', jtj, step) / 2 + gradient)
            relative_decrease = (cost - ev.cost) / model_cost_change
            success = (relative_decrease >= self.min_relative_decrease) \
                & (model_cost_change > 0.0)

            # accept/reject (reference :232-240; identical update order)
            pose = jnp.where(success[..., None], pose_new, pose)
            jac = jnp.where(success[..., None, None], ev.jacobian, jac)
            residual = jnp.where(success[..., None], ev.residual, residual)
            cost = jnp.where(success, ev.cost, cost)
            radius_success = radius / jnp.maximum(
                1.0 - (2.0 * relative_decrease - 1.0) ** 3, 1.0 / 3.0)
            radius = jnp.where(success, radius_success, radius)
            radius = jnp.clip(radius, self.eps, self.max_trust_region_radius)
            radius = jnp.where(success, radius, radius / decrease_factor)
            decrease_factor = jnp.where(success, 2.0, decrease_factor * 2.0)
            return pose, jac, residual, cost, radius, decrease_factor

        carry = (pose_opt, ev0.jacobian, ev0.residual, ev0.cost, radius,
                 decrease_factor)
        pose_opt, jac, _, cost, _, _ = jax.lax.fori_loop(
            0, self.num_iter, lm_body, carry)

        pose_cov = None
        if with_pose_cov:
            jtj = jnp.swapaxes(jac, -1, -2) @ jac
            jtj = _set_diagonal(jtj, _diagonal(jtj) + self.eps)
            pose_cov = inv_spd_small(jtj)
        if not with_cost:
            cost = None
        return pose_opt, pose_cov, cost

    def _solve_pallas(self, x3d, x2d, w2d, camera, cost_fun, rng=None,
                      pose_init=None, cost_init=None, with_pose_cov=False,
                      with_cost=False, force_init_solve=False,
                      fast_mode=False):
        """Fused-kernel path (see ops/pnp/pallas_lm.py for scope)."""
        from .pallas_lm import camera_to_fxfycxcy, lm_solve_pallas
        if pose_init is None or force_init_solve:
            assert self.init_solver is not None
            if rng is None:
                rng = jax.random.PRNGKey(0)
            if pose_init is None:
                pose_opt, _, _ = self.init_solver.solve(
                    x3d, x2d, w2d, camera, cost_fun, rng=rng,
                    fast_mode=fast_mode)
            else:
                if cost_init is None:
                    cost_init = evaluate_pnp(
                        x3d, x2d, w2d, pose_init, camera, cost_fun,
                        out_cost=True).cost
                pose_init_solve, _, cost_init_solve = self.init_solver.solve(
                    x3d, x2d, w2d, camera, cost_fun, rng=rng, with_cost=True,
                    fast_mode=fast_mode)
                use_init = cost_init < cost_init_solve
                pose_opt = jnp.where(use_init[..., None], pose_init,
                                     pose_init_solve)
        else:
            pose_opt = pose_init

        delta = jnp.broadcast_to(
            jnp.asarray(cost_fun.delta, x2d.dtype), x2d.shape[:1])
        if camera.lb is not None and camera.ub is not None:
            bshape = x2d.shape[:1] + (2,)
            bounds = jnp.concatenate(
                [jnp.broadcast_to(jnp.asarray(camera.lb, x2d.dtype), bshape),
                 jnp.broadcast_to(jnp.asarray(camera.ub, x2d.dtype), bshape)],
                axis=-1)
        else:
            bounds = None
        tile_b = 64 if x2d.shape[1] <= 64 else 32
        out = lm_solve_pallas(
            x3d, x2d, w2d, camera_to_fxfycxcy(camera.cam_mats), delta,
            pose_opt, bounds=bounds, dof=self.dof, num_iter=self.num_iter,
            fast_mode=fast_mode, z_min=camera.z_min, tile_b=tile_b,
            eps=self.eps, min_lm_diagonal=self.min_lm_diagonal,
            max_lm_diagonal=self.max_lm_diagonal,
            min_relative_decrease=self.min_relative_decrease,
            initial_trust_region_radius=self.initial_trust_region_radius,
            max_trust_region_radius=self.max_trust_region_radius,
            with_jtj=with_pose_cov)
        pose, cost = out[0], out[1]
        pose_cov = None
        if with_pose_cov:
            jtj = _set_diagonal(out[2], _diagonal(out[2]) + self.eps)
            pose_cov = inv_spd_small(jtj)
        return pose, pose_cov, (cost if with_cost else None)

    def gn_step(self, x3d, x2d, w2d, pose, camera, cost_fun):
        """One differentiable Gauss-Newton step at ``pose``.

        Reference: epropnp/levenberg_marquardt.py:243-253.
        """
        # Full f32 matmul precision + LU solve: this is the DIFFERENTIABLE
        # path (reference uses torch.linalg.solve). At convergence with
        # large learned weight scales, default-precision (bfloat16-input)
        # matmuls and an SPD Cholesky both emit non-finite values here and
        # poison the whole gradient. Runs once per forward, so full
        # precision costs nothing.
        with jax.default_matmul_precision('float32'):
            ev = evaluate_pnp(
                x3d, x2d, w2d, pose, camera, cost_fun,
                out_jacobian=True, out_residual=True)
            jac_t = jnp.swapaxes(ev.jacobian, -1, -2)
            jtj = jac_t @ ev.jacobian \
                + jnp.eye(self.dof, dtype=x2d.dtype) * self.eps
            gradient = jnp.einsum('...ij,...j->...i', jac_t, ev.residual)
            return -jnp.linalg.solve(jtj, gradient[..., None])[..., 0]

    def pose_add(self, pose_opt, step, camera):
        """Tangent-space pose update. Reference: :255-265."""
        if self.dof == 4:
            return pose_opt + step
        t_new = pose_opt[..., :3] + step[..., :3]
        q = pose_opt[..., 3:]
        q_delta = jnp.einsum(
            '...ij,...j->...i',
            camera.get_quaternion_transfrom_mat(q), step[..., 3:])
        q_new = q + q_delta
        # F.normalize semantics: x / max(||x||, 1e-12)
        q_new = q_new / jnp.maximum(
            jnp.linalg.norm(q_new, axis=-1, keepdims=True), 1e-12)
        return jnp.concatenate([t_new, q_new], axis=-1)


def _diagonal(mat):
    return jnp.diagonal(mat, axis1=-2, axis2=-1)


def _set_diagonal(mat, diag):
    n = mat.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, diag[..., None, :], mat)


def _jtj_damped_const(jac, eps):
    jtj = jnp.swapaxes(jac, -1, -2) @ jac
    return _set_diagonal(jtj, _diagonal(jtj) + eps)


@dataclass(frozen=True)
class RSLMSolver(LMSolver):
    """Random Sample LM solver (RANSAC generalization) for initialization.

    Draws ``num_proposals`` weighted subsets of ``num_points``
    correspondences, solves each with a short LM run from a randomized pose,
    and keeps the per-object proposal with minimal cost on the full point set.
    Reference: epropnp/levenberg_marquardt.py:268-353.
    """

    num_points: int = 16
    num_proposals: int = 64
    num_iter: int = 3
    # Experimental: inverse-CDF sampling WITH replacement instead of the
    # reference's multinomial without replacement. Statistically
    # near-identical for the RANSAC init heuristic. Measured SLOWER than
    # Gumbel top-k on TPU (searchsorted lowering); may help on CPU.
    fast_sampling: bool = False
    # Fused-kernel only: rank proposals on a strided subsample of this
    # many points (multiple of 128) instead of the full set; proposal
    # scoring dominates the fused init at large N. When the caller asks
    # for the init cost (with_cost=True), the winner is re-evaluated on
    # the FULL set so downstream cost comparisons stay exact. None =
    # full-set ranking.
    score_points: Optional[int] = 128

    def center_based_init(self, x2d, x3d, camera, eps: float = 1e-6):
        """Translation init matching 2D/3D point spread (reference :283-298)."""
        x2dh = jnp.concatenate([x2d, jnp.ones_like(x2d[..., :1])], axis=-1)
        x2dc = jnp.swapaxes(
            solve_3x3(camera.cam_mats, jnp.swapaxes(x2dh, -1, -2)),
            -1, -2)
        x2dc = x2dc[..., :2] / jnp.maximum(x2dc[..., 2:], eps)
        x2dc_mean = jnp.mean(x2dc, axis=-2)
        x2dc_std = jnp.std(x2dc, axis=-2, ddof=1)
        x3d_std = jnp.std(x3d, axis=-2, ddof=1)
        if self.dof == 4:
            scale = x3d_std[..., 1] / jnp.maximum(x2dc_std[..., 1], eps)
        else:
            scale = math.sqrt(2 / 3) * jnp.linalg.norm(x3d_std, axis=-1) \
                / jnp.maximum(jnp.linalg.norm(x2dc_std, axis=-1), eps)
        x2dch = jnp.concatenate(
            [x2dc_mean, jnp.ones_like(x2dc_mean[..., :1])], axis=-1)
        return x2dch * scale[..., None]

    def solve(self, x3d, x2d, w2d, camera, cost_fun, rng=None, **kwargs):
        """Reference: epropnp/levenberg_marquardt.py:300-353."""
        x3d, x2d, w2d, camera, cost_fun = _stop_grad(
            x3d, x2d, w2d, camera, cost_fun)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        # the fused kernel covers bounded cameras only in the packed layout
        # (regular num_points/n); bounded + irregular falls back to jnp.
        # For very small problems (few objects x few proposals, e.g. the
        # 6DoF training stack's 4-proposal init) the XLA path's per-step
        # cost is lower than the kernel's fixed launch/packing overhead,
        # so the fused path also requires bs*num_proposals >= 512
        # (measured crossover on 1x v5e; the fused path additionally
        # compiles ~16x faster, which the XLA Gumbel top-k path pays in
        # a several-minute one-time trace).
        has_bounds = camera.lb is not None and camera.ub is not None
        packed_ok = (self.num_points <= 128
                     and 128 % self.num_points == 0
                     and x2d.shape[1] % 128 == 0)
        big_enough = x2d.shape[0] * self.num_proposals >= 512
        if (self.use_pallas and self.fast_sampling and big_enough
                and packed_ok):
            # fully fused init kernel (sampling + proposal LM + scoring);
            # sampling is with-replacement inverse-CDF (see pallas_rslm)
            from .pallas_lm import camera_to_fxfycxcy
            from .pallas_rslm import rslm_init_pallas
            bs = x2d.shape[0]
            delta = jnp.broadcast_to(
                jnp.asarray(cost_fun.delta, x2d.dtype), (bs,))
            seeds = jax.random.randint(
                rng, (bs,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            if has_bounds:
                bshape = (bs, 2)
                bounds = jnp.concatenate(
                    [jnp.broadcast_to(
                        jnp.asarray(camera.lb, x2d.dtype), bshape),
                     jnp.broadcast_to(
                         jnp.asarray(camera.ub, x2d.dtype), bshape)],
                    axis=-1)
            else:
                bounds = None
            pose, min_cost = rslm_init_pallas(
                x3d, x2d, w2d, camera_to_fxfycxcy(camera.cam_mats), delta,
                seeds, bounds=bounds,
                dof=self.dof, num_points=self.num_points,
                num_proposals=self.num_proposals, num_iter=self.num_iter,
                z_min=camera.z_min, eps=self.eps,
                min_lm_diagonal=self.min_lm_diagonal,
                max_lm_diagonal=self.max_lm_diagonal,
                min_relative_decrease=self.min_relative_decrease,
                initial_trust_region_radius=self.initial_trust_region_radius,
                max_trust_region_radius=self.max_trust_region_radius,
                score_points=self.score_points)
            subsampled = (self.score_points is not None
                          and self.score_points < x2d.shape[1])
            if kwargs.get('with_cost') and subsampled:
                # the kernel ranked on a subsample; callers compare this
                # cost against full-set costs (solve :146-153), so
                # re-evaluate the winner on the full set
                min_cost = evaluate_pnp(
                    x3d, x2d, w2d, pose, camera, cost_fun,
                    out_cost=True).cost
            return pose, None, min_cost
        bs, pn, _ = x2d.shape
        p = self.num_proposals
        k_inds, k_rot = jax.random.split(rng)

        mean_weight = jnp.mean(w2d, axis=-1)  # (bs, pn)
        if self.fast_sampling:
            # inverse-CDF sampling (with replacement)
            cdf = jnp.cumsum(mean_weight, axis=-1)
            u = jax.random.uniform(
                k_inds, (p, bs, self.num_points), dtype=x2d.dtype) \
                * cdf[None, :, -1:]
            inds = jax.vmap(
                lambda c, uu: jnp.searchsorted(c, uu),
                in_axes=(0, 1), out_axes=1)(cdf, u)
        else:
            # Weighted subset sampling without replacement via Gumbel top-k
            # (matches torch.multinomial's successive-sampling distribution).
            logits = jnp.log(jnp.maximum(mean_weight, 1e-30))
            gumbel = jax.random.gumbel(k_inds, (p, bs, pn), dtype=x2d.dtype)
            _, inds = jax.lax.top_k(logits[None] + gumbel, self.num_points)
        # (p, bs, num_points, c): gather per (proposal, object) WITHOUT
        # broadcasting the source to (p, bs, pn, c) first — the broadcast
        # materializes ~p x the point set in HBM.
        b_inds = jnp.arange(bs)[None, :, None]
        x2d_samples = x2d[b_inds, inds]
        x3d_samples = x3d[b_inds, inds]
        w2d_samples = w2d[b_inds, inds]

        t_init = jnp.broadcast_to(
            self.center_based_init(x2d, x3d, camera), (p, bs, 3))
        if self.dof == 4:
            yaw = jax.random.uniform(
                k_rot, (p, bs, 1), dtype=x2d.dtype) * (2 * math.pi)
            pose_init = jnp.concatenate([t_init, yaw], axis=-1)
        else:
            quat = jax.random.normal(k_rot, (p, bs, 4), dtype=x2d.dtype)
            q_norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
            quat = jnp.where(
                q_norm < self.eps,
                jnp.array([1.0, 0.0, 0.0, 0.0], dtype=x2d.dtype),
                quat / jnp.maximum(q_norm, 1e-30))
            pose_init = jnp.concatenate([t_init, quat], axis=-1)

        camera_expand = camera.broadcast_to_batch((bs,)).tile(p)
        cost_fun_expand = cost_fun.broadcast_to_batch((bs,)).tile(p)

        pose, _, _ = LMSolver.solve(
            self,
            x3d_samples.reshape(p * bs, self.num_points, 3),
            x2d_samples.reshape(p * bs, self.num_points, 2),
            w2d_samples.reshape(p * bs, self.num_points, 2),
            camera_expand, cost_fun_expand,
            pose_init=pose_init.reshape(p * bs, pose_init.shape[-1]),
            **kwargs)
        pose = pose.reshape(p, bs, pose.shape[-1])

        # Score all proposals on the full point set; keep the best.
        cost = evaluate_pnp(
            x3d, x2d, w2d, pose, camera, cost_fun, out_cost=True).cost
        min_cost_ind = jnp.argmin(cost, axis=0)
        min_cost = jnp.min(cost, axis=0)
        pose = jnp.take_along_axis(
            pose, min_cost_ind[None, :, None], axis=0)[0]
        return pose, None, min_cost

