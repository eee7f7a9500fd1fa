"""TPU-native probabilistic PnP core (the reusable ``epropnp`` package).

Single source of truth — the reference duplicates this core three times
(epropnp/, EPro-PnP-6DoF/lib/ops/pnp/, EPro-PnP-Det/epropnp_det/ops/pnp/).
"""

from .common import (  # noqa: F401
    evaluate_pnp,
    pnp_denormalize,
    pnp_normalize,
    pose_to_rot_mat,
    quaternion_to_rot_mat,
    skew,
    yaw_to_rot_mat,
)
from .camera import PerspectiveCamera  # noqa: F401
from .cost_fun import AdaptiveHuberPnPCost, HuberPnPCost, huber_kernel  # noqa: F401
from .distributions import (  # noqa: F401
    AngularCentralGaussian,
    MultivariateStudentT,
    VonMisesUniformMix,
    cholesky_wrapper,
)
from .levenberg_marquardt import LMSolver, RSLMSolver  # noqa: F401
from .epropnp import EProPnP4DoF, EProPnP6DoF, EProPnPBase  # noqa: F401
