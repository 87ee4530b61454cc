"""Glue: build NemoAssets from a data bundle + frozen model components."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..body.smpl import SMPLModel
from ..data.bundle import MultiViewBundle
from ..priors.gmm import GMMPrior
from .model import NemoAssets, NemoConfig


def build_assets(bundle: MultiViewBundle, smpl: SMPLModel,
                 cfg: NemoConfig, gmm: Optional[GMMPrior] = None,
                 vposer=None, humor=None, humor_cfg=None) -> NemoAssets:
    """Collate the 2D supervision and pack everything device-side.

    Mirrors MultiViewModel.collate_gt_2d (:2908-2961) + the hmr theta stack
    (:3440-3453), as one-time host work producing static device arrays.
    """
    if humor is not None and humor_cfg is None:
        from ..models.humor import HumorConfig
        humor_cfg = HumorConfig()
    thr = getattr(cfg, "label_intersection_threshold", 30.0)
    labels = bundle.label(cfg.label_type, thr)
    v2v_sub = {}
    if getattr(cfg, "vp_v2v_n_verts", 0):
        from ..body.smpl import subset_skin_tables
        vidx, pd_tiles, w_tiles = subset_skin_tables(smpl,
                                                     cfg.vp_v2v_n_verts)
        v2v_sub = dict(v2v_vidx=vidx, v2v_pd_tiles=pd_tiles,
                       v2v_w_tiles=w_tiles)
    return NemoAssets(
        smpl=smpl,
        gmm=gmm,
        vposer=vposer,
        points2d_gt=jnp.asarray(labels),
        bbox_diag=jnp.asarray(bundle.bbox_diag(cfg.label_type, thr)),
        hmr_theta=jnp.asarray(bundle.hmr_theta),
        hmr_mask=jnp.asarray(bundle.hmr_mask),
        spin_theta=(jnp.asarray(bundle.spin_theta)
                    if getattr(bundle, "spin_theta", None) is not None
                    else None),
        img_d0=bundle.img_d0,
        img_d1=bundle.img_d1,
        humor=humor,
        humor_cfg=humor_cfg,
        **v2v_sub,
    )
