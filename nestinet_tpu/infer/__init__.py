from .predict import predict_shapes  # noqa: F401
from .writer import ShapeScatterWriter  # noqa: F401
