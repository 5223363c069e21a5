from .metrics import angle_errors_deg, pgp, rms_angle_deg  # noqa: F401
from .evaluate import evaluate_datasets  # noqa: F401
