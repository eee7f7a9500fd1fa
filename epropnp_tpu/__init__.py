"""EPro-PnP-TPU: a TPU-native JAX/Pallas rebuild of EPro-PnP.

End-to-end probabilistic Perspective-n-Points (CVPR 2022) re-designed for TPU:
pure-functional core over pytrees, fixed-shape masked control flow compatible
with XLA, Pallas kernels for the batched Levenberg-Marquardt hot loop, and
``jax.sharding``-based data parallelism.

Reference behavior: tjiiv-cprg/EPro-PnP (see SURVEY.md for file:line map).
"""

__version__ = "0.1.0"

from .ops.pnp import (  # noqa: F401
    PerspectiveCamera,
    HuberPnPCost,
    AdaptiveHuberPnPCost,
    LMSolver,
    RSLMSolver,
    EProPnP4DoF,
    EProPnP6DoF,
    evaluate_pnp,
)
