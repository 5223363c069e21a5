from .config import Config  # noqa: F401
from .rundir import RunDir  # noqa: F401
