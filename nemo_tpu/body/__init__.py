"""SMPL body model: LBS forward kinematics, asset loaders, joint vocabulary."""

from . import constants
from .assets import load_smpl, load_smpl_npz, load_smpl_pkl, synthetic_smpl_model
from .smpl import (
    NUM_BETAS,
    NUM_BODY_JOINTS,
    NUM_JOINTS,
    NUM_OUTPUT_JOINTS,
    NUM_VERTICES,
    SMPLModel,
    batch_rigid_transform,
    build_fused_tables,
    smpl_forward,
)

__all__ = [
    "constants", "load_smpl", "load_smpl_npz", "load_smpl_pkl",
    "synthetic_smpl_model", "NUM_BETAS", "NUM_BODY_JOINTS", "NUM_JOINTS",
    "NUM_OUTPUT_JOINTS", "NUM_VERTICES", "SMPLModel", "batch_rigid_transform",
    "build_fused_tables", "smpl_forward",
]
