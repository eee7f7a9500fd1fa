"""Robust Huber reprojection cost with IRLS-style rescaling (pure JAX).

Semantics follow the reference ``epropnp/cost_fun.py``: the residual is the
weighted reprojection error, robustified per point by the Huber kernel; the
residual and Jacobian are rescaled by sqrt(rho'(s)) so that a Gauss-Newton
step on the rescaled problem matches an IRLS step on the robust problem.

TPU-first deviations: immutable pytree dataclasses; no output tensors; a
single differentiable code path with NaN-safe square roots.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
from flax import struct


def huber_kernel(s_sqrt, delta):
    """0.5*s^2 below delta, linear above. Reference: epropnp/cost_fun.py:8-12."""
    return jnp.where(
        s_sqrt <= delta,
        0.5 * jnp.square(s_sqrt),
        delta * s_sqrt - 0.5 * jnp.square(delta))


def huber_d_kernel(s_sqrt, delta, eps: float = 1e-10):
    """sqrt of the Huber derivative rho'(s). Reference: epropnp/cost_fun.py:15-20."""
    return jnp.sqrt(jnp.clip(delta / jnp.maximum(s_sqrt, eps), max=1.0))


@struct.dataclass
class HuberPnPCost:
    """Huber robust cost with fixed delta. Reference: epropnp/cost_fun.py:23-109."""

    delta: Union[float, jnp.ndarray] = 1.0
    eps: float = struct.field(pytree_node=False, default=1e-10)

    def set_param(self, *args, **kwargs):
        return self

    def compute(self, x2d_proj, x2d, w2d, jac_cam=None,
                out_residual: bool = False, out_cost: bool = False,
                out_jacobian: bool = False):
        """Compute (residual (*, n*2), cost (*,), jacobian (*, n*2, dof)).

        Reference: epropnp/cost_fun.py:33-89.
        """
        bs = x2d_proj.shape[:-2]
        pn = x2d_proj.shape[-2]
        delta = jnp.asarray(self.delta, dtype=x2d.dtype)[..., None]  # (*, 1)

        residual = (x2d_proj - x2d) * w2d  # (*, n, 2)
        # Safe norm: max(ss, tiny) keeps autodiff finite at zero residual
        # (torch defines the norm subgradient at 0 as 0; this matches).
        ss = jnp.sum(jnp.square(residual), axis=-1)
        s_sqrt = jnp.sqrt(jnp.maximum(ss, 1e-24))  # (*, n)

        cost = None
        if out_cost:
            cost = jnp.sum(huber_kernel(s_sqrt, delta), axis=-1)

        residual_out = None
        jacobian = None
        if out_residual or out_jacobian:
            rho_d_sqrt = huber_d_kernel(s_sqrt, delta, eps=self.eps)
            if out_residual:
                residual_out = (residual * rho_d_sqrt[..., None]).reshape(
                    bs + (pn * 2,))
            if out_jacobian:
                assert jac_cam is not None
                dof = jac_cam.shape[-1]
                jacobian = (jac_cam * (w2d * rho_d_sqrt[..., None])[..., None]
                            ).reshape(bs + (pn * 2, dof))
        return residual_out, cost, jacobian

    # -- batch-shape helpers --

    def reshape(self, *batch_shape):
        if isinstance(self.delta, jnp.ndarray):
            return self.replace(delta=self.delta.reshape(batch_shape))
        return self

    def tile(self, reps: int):
        if isinstance(self.delta, jnp.ndarray) and self.delta.ndim > 0:
            return self.replace(
                delta=jnp.tile(self.delta, (reps,) + (1,) * (self.delta.ndim - 1)))
        return self

    def broadcast_to_batch(self, batch_shape):
        if isinstance(self.delta, jnp.ndarray) and self.delta.ndim > 0:
            return self.replace(
                delta=jnp.broadcast_to(self.delta, tuple(batch_shape)))
        return self


@struct.dataclass
class AdaptiveHuberPnPCost(HuberPnPCost):
    """Huber cost whose delta adapts to the correspondence statistics.

    ``set_param`` returns a new instance with per-object
    ``delta = mean(w2d) * std(x2d) * relative_delta``.
    Reference: epropnp/cost_fun.py:112-132.
    """

    delta: Optional[Union[float, jnp.ndarray]] = None
    relative_delta: float = struct.field(pytree_node=False, default=0.5)

    def set_param(self, x2d, w2d):
        # ddof=1 matches torch.var's unbiased default.
        x2d_std = jnp.sqrt(jnp.sum(jnp.var(x2d, axis=-2, ddof=1), axis=-1))  # (num_obj,)
        delta = jnp.mean(w2d, axis=(-2, -1)) * x2d_std * self.relative_delta
        return self.replace(delta=delta)
