"""EPro-PnP-6DoF suite: CDPN dense-coordinate network for object pose.

TPU-native rebuild of ``/root/reference/EPro-PnP-6DoF`` — flax CDPN model,
one jitted functional train step (network forward + AMIS Monte Carlo PnP +
losses + RMSprop update), LineMOD data pipeline, and ADD(-S)/n°ncm/ARP
evaluation metrics.
"""

from .config import SixDoFConfig  # noqa: F401
