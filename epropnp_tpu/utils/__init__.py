from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .logging import get_logger  # noqa: F401
from .timer import IterTimer, IterTimers  # noqa: F401
from .meters import AverageMeter  # noqa: F401
