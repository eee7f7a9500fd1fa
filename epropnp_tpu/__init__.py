"""EPro-PnP-TPU: a TPU-native JAX/Pallas rebuild of EPro-PnP.

End-to-end probabilistic Perspective-n-Points (CVPR 2022) re-designed for TPU:
pure-functional core over pytrees, fixed-shape masked control flow compatible
with XLA, Pallas kernels for the batched Levenberg-Marquardt hot loop, and
``jax.sharding``-based data parallelism.

Reference behavior: tjiiv-cprg/EPro-PnP (see SURVEY.md for file:line map).
"""

__version__ = "0.1.0"

import os as _os

# The TPU plugin in this image force-registers itself ahead of the
# JAX_PLATFORMS env var; honor an explicit CPU request (tests, tools,
# the driver's virtual-device dry run) by updating the config before
# backends initialize. No-op when backends are already live.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

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
