"""EPro-PnP-Det suite: FCOS3D + deformable-correspondence monocular 3D
detection with probabilistic PnP pose estimation (nuScenes, 4DoF).

TPU-native rebuild of ``/root/reference/EPro-PnP-Det``.
"""

from .config import DetConfig  # noqa: F401
