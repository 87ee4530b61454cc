"""Initializer model families: ResNet-50, HMR/SPIN, VIBE (frozen inference)."""

from .resnet import (convert_torch_resnet50, init_resnet50, resnet50_features)
from .hmr import (convert_torch_hmr, hmr_forward, hmr_head, imagenet_normalize,
                  init_hmr_head, weak_perspective_projection)
from .humor import (HumorConfig, STATE_DIM, apply_world2local_state,
                    canonicalize_state, compute_world2aligned_mat,
                    gaussian_kl, humor_decode,
                    humor_infer_seq, humor_posterior, humor_prior,
                    humor_roll_out, humor_single_step, humor_train_loss,
                    make_humor_train_step,
                    humor_transition_prior_loss, init_humor, pack_state,
                    split_state)
from .humor_loss import (HumorLossConfig, humor_full_loss, humor_loss_terms,
                         humor_step_scheduled, kl_anneal_weight, kl_normal,
                         make_humor_full_train_step, multistep_lr,
                         sched_samp_gt_p)
from .humor_eval import (humor_eval_full_test, humor_eval_metrics,
                         humor_eval_recon, humor_eval_sampling)
from .humor_fit import MotionOptConfig, humor_motion_fit
from .humor_state_prior import (fit_state_prior_gmm, save_state_prior_gmm,
                                states_from_sequences)
from .humor_fit_eval import (aggregate_fitting_eval, compute_joint_accel,
                             compute_toe_floor_pen, per_seq_means,
                             quant_eval_2d, quant_eval_3d,
                             write_fitting_eval_csvs)
from .vibe_train import (VibeLossWeights, compute_accel,
                         compute_error_accel, evaluate_vibe,
                         init_motion_discriminator, init_self_attention,
                         init_vibe_train_state, self_attention,
                         make_discriminator_train_step, make_vibe_train_step,
                         motion_discriminator, vibe_discriminator_loss,
                         vibe_generator_loss, vibe_predict,
                         vibe_trainer_fit)
from .vibe import (convert_torch_gru, gru_cell, hmr_forward_from_features,
                   init_gru, temporal_encoder, vibe_forward)

__all__ = [
    "convert_torch_resnet50", "init_resnet50", "resnet50_features",
    "convert_torch_hmr", "hmr_forward", "hmr_head", "imagenet_normalize",
    "init_hmr_head", "weak_perspective_projection",
    "convert_torch_gru", "gru_cell", "hmr_forward_from_features", "init_gru",
    "temporal_encoder", "vibe_forward",
    "HumorConfig", "STATE_DIM", "gaussian_kl", "humor_decode",
    "humor_posterior", "humor_prior", "humor_roll_out", "humor_single_step",
    "humor_train_loss", "make_humor_train_step", "init_humor", "pack_state",
    "split_state",
    "humor_infer_seq", "humor_transition_prior_loss",
    "apply_world2local_state", "canonicalize_state",
    "compute_world2aligned_mat",
    "HumorLossConfig", "humor_full_loss", "humor_loss_terms",
    "humor_step_scheduled", "kl_anneal_weight", "kl_normal",
    "make_humor_full_train_step", "multistep_lr", "sched_samp_gt_p",
    "compute_accel", "compute_error_accel", "evaluate_vibe",
    "init_vibe_train_state", "make_vibe_train_step", "vibe_predict",
    "vibe_trainer_fit",
    "MotionOptConfig", "humor_motion_fit", "aggregate_fitting_eval",
    "compute_joint_accel", "compute_toe_floor_pen", "per_seq_means",
    "quant_eval_2d", "quant_eval_3d", "write_fitting_eval_csvs", "humor_eval_metrics",
    "fit_state_prior_gmm", "save_state_prior_gmm", "states_from_sequences",
    "humor_eval_full_test", "humor_eval_sampling", "humor_eval_recon",
    "VibeLossWeights", "init_motion_discriminator", "init_self_attention",
    "self_attention",
    "make_discriminator_train_step", "motion_discriminator",
    "vibe_discriminator_loss", "vibe_generator_loss",
]
