from .schedules import bn_momentum_schedule, learning_rate_schedule  # noqa: F401
from .trainer import Trainer  # noqa: F401
