from .mups_kernel import tdmfv_n_est_pallas  # noqa: F401
