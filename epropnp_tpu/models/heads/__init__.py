from .rot_head import RotHead  # noqa: F401
from .trans_head import TransHead  # noqa: F401
