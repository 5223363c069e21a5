from .gmm import GridGMM, get_3d_grid_gmm, get_2d_grid_gmm  # noqa: F401
from .mups import tdmfv_n_est, mups, tdmfv_classification  # noqa: F401
