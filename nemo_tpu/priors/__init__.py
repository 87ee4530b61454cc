"""Pose priors: GMoF robustifier, GMM max-mixture, VPoser VAE, angle prior."""

from .gmm import GMMPrior, gmm_log_likelihood, load_gmm_prior, synthetic_gmm_prior
from .robustifiers import angle_prior, gmof
from .vposer import (
    VPoserConfig,
    convert_torch_state_dict,
    init_vposer,
    load_vposer,
    vposer_decode,
    vposer_encode,
    vposer_kl_to_std_normal,
)

__all__ = [
    "GMMPrior", "gmm_log_likelihood", "load_gmm_prior", "synthetic_gmm_prior",
    "angle_prior", "gmof", "VPoserConfig", "convert_torch_state_dict",
    "init_vposer", "load_vposer", "vposer_decode", "vposer_encode",
    "vposer_kl_to_std_normal",
]
