from .dataset import (  # noqa: F401
    PatchDataset,
    RandomPatchSampler,
    SequentialPatchSampler,
    SequentialShapeRandomPatchSampler,
)
from .loader import BatchIterator, get_data_loader  # noqa: F401
