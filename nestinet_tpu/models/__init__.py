from .experts import ExpertsNormEst  # noqa: F401
from .ms import MSNormEst  # noqa: F401
from .ss import SSNormEst  # noqa: F401
from .switching import SwitchingNormEst  # noqa: F401


def build_model(cfg, gmm):
    """Model factory keyed by the reference's model names."""
    name = cfg.model
    if name in ("ss_norm_est", "ss"):
        return SSNormEst(cfg, gmm)
    if name in ("ms_norm_est", "ms"):
        return MSNormEst(cfg, gmm)
    if name in ("ms_sw_n_est", "switching"):
        return SwitchingNormEst(cfg, gmm)
    if name in ("experts_n_est", "experts"):
        return ExpertsNormEst(cfg, gmm)
    raise ValueError(f"unknown model: {name}")
