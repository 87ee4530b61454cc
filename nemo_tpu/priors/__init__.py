"""Pose priors: GMoF robustifier, GMM max-mixture, VPoser VAE, angle prior."""

from .gmm import GMMPrior, gmm_log_likelihood, load_gmm_prior, synthetic_gmm_prior
from .ik import IKConfig, ik_fit
from .robustifiers import angle_prior, gmof
from .smplify import (smplify_body_fitting_loss, smplify_camera_fitting_loss,
                      smplify_fit)
from .temporal_smplify import (get_fitting_loss, run_temporal_smplify,
                               temporal_body_fitting_loss,
                               temporal_camera_fitting_loss,
                               temporal_smplify_fit)
from .vposer_train import (VPoserTrainConfig, load_amass_pose_data,
                           make_vposer_train_step, prepare_vposer_dataset,
                           train_vposer, vposer_train_loss)
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
    "IKConfig", "ik_fit",
    "angle_prior", "gmof", "smplify_body_fitting_loss",
    "smplify_camera_fitting_loss", "smplify_fit",
    "get_fitting_loss", "run_temporal_smplify",
    "temporal_body_fitting_loss", "temporal_camera_fitting_loss",
    "temporal_smplify_fit",
    "VPoserConfig", "convert_torch_state_dict",
    "init_vposer", "load_vposer", "vposer_decode", "vposer_encode",
    "vposer_kl_to_std_normal", "VPoserTrainConfig", "make_vposer_train_step", "prepare_vposer_dataset",
    "train_vposer", "vposer_train_loss", "load_amass_pose_data",
]
