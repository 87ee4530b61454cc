"""nemo_tpu — a TPU-native neural motion field framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
wangkua1/nemo-cvpr2023 ("NeMo: 3D Neural Motion Fields from Multiple Video
Instances of the Same Action", CVPR 2023).

NeMo is a *test-time optimization* system: given N video instances of the
same action, it fits a shared neural motion field (phase -> SMPL pose /
orientation / translation), per-view monotonic phase warps, per-view
perspective cameras, and per-view instance codes by minimizing 2D
reprojection error against detected keypoints, regularized by pose priors.

Design principles (TPU-first, not a port):
  * the whole optimization step — phase warp, motion MLP, SMPL forward
    kinematics, camera projection, losses — is one jitted function;
  * the full fit loop runs on-device under ``jax.lax.scan`` with metrics
    emitted in chunks (no per-step host sync);
  * per-view networks are vectorized with ``vmap`` instead of Python loops;
  * multi-chip scaling uses ``jax.sharding`` meshes (data-parallel over the
    sampled (view, frame) batch) rather than any host-side communication.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# NeMo is a millimetre-accuracy geometric optimizer: the default (bfloat16)
# matmul lowering costs ~1e-2 relative error, which is visible in MPJPE.
# Force f32 matmuls package-wide; the hot path is HBM-bound at these sizes,
# so the MXU pass cost is noise. Override with NEMO_TPU_MATMUL_PRECISION
# (e.g. "bfloat16") for throughput experiments.
_prec = _os.environ.get("NEMO_TPU_MATMUL_PRECISION", "highest")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

# Persistent XLA compilation cache: test-time-optimization workloads re-run
# the same jitted programs across processes (per-action fits, resumes); the
# cache turns the 20-40s first-compile into a disk read. Override the
# location with NEMO_TPU_COMPILATION_CACHE ("" disables).
_cache = _os.environ.get("NEMO_TPU_COMPILATION_CACHE",
                         "/tmp/nemo_tpu_xla_cache")
if _cache:
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
