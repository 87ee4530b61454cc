"""Neural modules (functional param-pytree style)."""

from .networks import (
    IDENTITY_6D,
    RBF_KERNELS,
    apply_fcnn,
    apply_monotonic_all_views,
    apply_monotonic_gather,
    apply_monotonic_single,
    apply_motion_net,
    apply_rbf,
    apply_rot_net,
    init_fcnn,
    init_monotonic,
    init_motion_net,
    init_rbf,
    init_rot_net,
    rbf_centres,
)

__all__ = [
    "IDENTITY_6D", "RBF_KERNELS", "apply_fcnn", "apply_monotonic_all_views",
    "apply_monotonic_gather", "apply_monotonic_single", "apply_motion_net",
    "apply_rbf", "apply_rot_net", "init_fcnn", "init_monotonic",
    "init_motion_net", "init_rbf", "init_rot_net",
    "rbf_centres",
]
