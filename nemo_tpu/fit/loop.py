"""On-device fit loops: warmup -> camera stage -> main optimization.

Behavioral reference: scripts/learned_multi_view_recon_nn.py:211-335 (the
three-stage schedule) and NemoV1-V4 warmup/opt_cam/step.

TPU-first structure: each stage is ONE jitted lax.scan over its steps —
random (view, frame) batches are drawn on-device from a folded PRNG key,
losses come back as stacked arrays per chunk, and nothing syncs to the host
inside a stage. Checkpointing splits the main stage into chunks (default 500
steps, the reference's save cadence) with a host callback between chunks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import (NemoAssets, NemoConfig, Params, camera_stage_loss,
                    fit_loss, warmup_loss)
from .optimizer import (GroupOptimizer, PlateauState, make_camera_stage_optimizer,
                        make_optimizer, plateau_init_all, plateau_update_all)


def _v0_warmup_optimizer(cfg: NemoConfig) -> GroupOptimizer:
    """V0's warmup builds a fresh Adam over the pose network at lr_camera
    (:3211-3214); its state is discarded after the stage."""
    import optax
    return GroupOptimizer(
        transforms={"poses": optax.chain(optax.scale_by_adam(),
                                         optax.scale(-cfg.lr_camera))},
        cfg=cfg)


def _sample_batch(key, batch_size: int, num_views: int, num_frames: int):
    kv, kf = jax.random.split(key)
    view_idx = jax.random.randint(kv, (batch_size,), 0, num_views)
    frame_idx = jax.random.randint(kf, (batch_size,), 0, num_frames)
    return view_idx, frame_idx


@dataclasses.dataclass
class FitState:
    """Everything carried across stages (and into checkpoints)."""
    params: Params
    opt_state: Dict[str, Any]
    plateau: Dict[str, PlateauState]
    key: jax.Array
    step: int = 0


class NemoFitter:
    """Drives the three-stage NeMo optimization for one action.

    Equivalent surface to MultiViewModel+NemoV{k} minus rendering:
    warmup(), opt_cam(), fit(), plus loss evaluation and prediction
    helpers live in eval/ and fit/model.py.
    """

    def __init__(self, cfg: NemoConfig, assets: NemoAssets,
                 seed: int = 0, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'dp' axis — the sampled
        (view, frame) batch shards across it inside every stage scan while
        parameters stay replicated (XLA inserts the gradient all-reduce
        over ICI). This is the product-path realization of SURVEY §2f's
        "pjit data-parallel sharding of the (view, frame) batch"."""
        self.cfg = cfg
        self.assets = assets
        self.optimizer = make_optimizer(cfg)
        self.mesh = mesh
        self._bat = None
        if mesh is not None:
            from ..parallel import batch_sharding, replicated, replicate_tree
            if not cfg.full_batch and \
                    cfg.batch_size % mesh.devices.size != 0:
                raise ValueError(
                    f"batch_size {cfg.batch_size} not divisible by the "
                    f"{mesh.devices.size}-device dp mesh")
            self._bat = batch_sharding(mesh)
            self.assets = replicate_tree(mesh, assets)
        key = jax.random.PRNGKey(seed)
        k_init, k_run = jax.random.split(key)
        from .model import init_params
        params = init_params(k_init, cfg, assets.num_views, assets.img_d0)
        opt_state = self.optimizer.init(params)
        if mesh is not None:
            from ..parallel import replicate_tree
            params = replicate_tree(mesh, params)
            opt_state = replicate_tree(mesh, opt_state)
        self.state = FitState(
            params=params,
            opt_state=opt_state,
            plateau=plateau_init_all(cfg),
            key=k_run,
        )
        self._compiled: Dict[Tuple, Callable] = {}

    def _shard_batch(self, vi, fi):
        """Constrain a batch to the dp axis (no-op without a mesh, or when
        the batch length does not tile the mesh evenly — e.g. a full
        (V x F) grid on an odd device count)."""
        if self._bat is None or vi.shape[0] % self.mesh.devices.size != 0:
            return vi, fi
        return (jax.lax.with_sharding_constraint(vi, self._bat),
                jax.lax.with_sharding_constraint(fi, self._bat))

    # ------------------------------------------------------------------
    # stage scan builders
    # ------------------------------------------------------------------

    def _stage_scan(self, stage: str, steps: int):
        """Build (or fetch) the compiled scan for a stage at a step count."""
        # NEMO_TPU_SCAN_UNROLL=N unrolls N fit steps into one loop body so
        # XLA can fuse/pipeline across step boundaries (targets the ~23%
        # small-fusion tail in the step profile). Identical math modulo XLA
        # reassociation: on TPU, unroll=4 vs 1 is bit-identical for ~19
        # steps, after which the fit's chaos amplifies the ulp-level
        # rounding differences like any perturbation (measured — see
        # docs/precision_knobs.md "TPU trajectory gate"). Measured speed
        # verdict: ROADMAP "NEMO_TPU_SCAN_UNROLL sweep" (+3.4% at x4).
        import os
        unroll = max(1, int(os.environ.get("NEMO_TPU_SCAN_UNROLL", "1")))
        if unroll > 1 and steps % unroll != 0:
            import warnings
            warnings.warn(
                f"NEMO_TPU_SCAN_UNROLL={unroll} does not divide the "
                f"{stage!r}-stage chunk of {steps} steps; falling back to "
                f"unroll=1 for this scan", stacklevel=2)
            unroll = 1
        cache_key = (stage, steps, unroll)
        if cache_key in self._compiled:
            return self._compiled[cache_key]

        cfg, assets, opt = self.cfg, self.assets, self.optimizer
        V, F, B = assets.num_views, assets.num_frames, cfg.batch_size

        if stage == "warmup":
            # V1+ steps the persistent motion(+rbf)+phase optimizers
            # (:3493-3503); V0 builds a FRESH Adam over the pose network
            # only, at lr_camera (:3211-3214) — handled by the caller
            # passing a dedicated optimizer through the carry.
            active = (("poses",) if cfg.model_version == 0
                      else ("motion", "rbf", "phase"))
            warm_opt = opt if cfg.model_version != 0 \
                else _v0_warmup_optimizer(cfg)

            def body(carry, _):
                params, opt_state, plateau, key = carry
                key, k1 = jax.random.split(key)
                vi, fi = self._shard_batch(*_sample_batch(k1, B, V, F))
                (loss, metrics), grads = jax.value_and_grad(
                    warmup_loss, has_aux=True)(params, cfg, assets, vi, fi)
                updates, opt_state = warm_opt.update(grads, opt_state, params,
                                                     active=active)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates)
                return (params, opt_state, plateau, key), metrics

        elif stage == "camera":
            if cfg.model_version >= 4:
                active = ("cameras", "motion", "rbf", "phase", "instance")

                def body(carry, _):
                    params, opt_state, plateau, key = carry
                    key, k1, k2 = jax.random.split(key, 3)
                    vi, fi = self._shard_batch(*_sample_batch(k1, B, V, F))
                    (loss, metrics), grads = jax.value_and_grad(
                        camera_stage_loss, has_aux=True)(
                            params, cfg, assets, vi, fi, key=k2)
                    updates, opt_state = opt.update(grads, opt_state, params,
                                                    active=active)
                    params = jax.tree_util.tree_map(
                        lambda p, u: p + u, params, updates)
                    return (params, opt_state, plateau, key), metrics
            else:
                # V0-V3: frame 0 of every view, fresh Adam on cameras only
                # (:2869-2906). The temporary optimizer state lives in the
                # scan carry and is discarded at stage end.
                cam_opt = make_camera_stage_optimizer(cfg)
                vi_fixed = jnp.arange(V)
                fi_fixed = jnp.zeros(V, jnp.int32)

                def body(carry, _):
                    params, cam_state, plateau, key = carry
                    (loss, metrics), grads = jax.value_and_grad(
                        camera_stage_loss, has_aux=True)(
                            params, cfg, assets, vi_fixed, fi_fixed)
                    updates, cam_state = cam_opt.update(
                        {"cameras": grads["cameras"]}, cam_state,
                        {"cameras": params["cameras"]}, active=("cameras",))
                    params = dict(params)
                    params["cameras"] = params["cameras"] + updates["cameras"]
                    return (params, cam_state, plateau, key), metrics

        elif stage == "main":
            # full-batch mode: every step runs the fixed (V x F) grid
            # instead of a sampled batch — the custom entry's stepping
            # (learned_multi_view_recon_nn_custom.py:315, step() full_batch
            # branch neural_motion_model.py:3808-3817)
            vi_full = jnp.repeat(jnp.arange(V), F)
            fi_full = jnp.tile(jnp.arange(F), V)

            def body(carry, _):
                params, opt_state, plateau, key = carry
                key, k1, k2 = jax.random.split(key, 3)
                if cfg.full_batch:
                    vi, fi = self._shard_batch(vi_full, fi_full)
                else:
                    vi, fi = self._shard_batch(*_sample_batch(k1, B, V, F))
                (loss, metrics), grads = jax.value_and_grad(
                    fit_loss, has_aux=True)(params, cfg, assets, vi, fi,
                                            key=k2, training=True)
                updates, opt_state = opt.update(grads, opt_state, params,
                                                plateau=plateau)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates)
                plateau = plateau_update_all(plateau, loss, cfg)
                return (params, opt_state, plateau, key), metrics
        else:
            raise ValueError(stage)

        @jax.jit
        def run(carry):
            return jax.lax.scan(body, carry, None, length=steps,
                                unroll=unroll)

        self._compiled[cache_key] = run
        return run

    # ------------------------------------------------------------------
    # public stages (mirroring warmup / opt_cam / the entry step loop)
    # ------------------------------------------------------------------

    def warmup(self, steps: Optional[int] = None) -> Dict[str, np.ndarray]:
        steps = self.cfg.warmup_step if steps is None else steps
        if steps <= 0:
            return {}
        run = self._stage_scan("warmup", steps)
        st = self.state
        if self.cfg.model_version == 0:
            warm_state = _v0_warmup_optimizer(self.cfg).init(
                {"poses": st.params["poses"]})
            carry = (st.params, warm_state, st.plateau, st.key)
            (params, _, plateau, key), metrics = run(carry)
            # fresh warmup-Adam state is dropped, like the reference's
            # throwaway self.warmup_optimizer.
            self.state = FitState(params, st.opt_state, plateau, key, st.step)
        else:
            carry = (st.params, st.opt_state, st.plateau, st.key)
            (params, opt_state, plateau, key), metrics = run(carry)
            self.state = FitState(params, opt_state, plateau, key, st.step)
        return {k: np.asarray(v) for k, v in metrics.items()}

    def opt_cam(self, steps: Optional[int] = None) -> Dict[str, np.ndarray]:
        steps = self.cfg.opt_cam_step if steps is None else steps
        if steps <= 0:
            return {}
        run = self._stage_scan("camera", steps)
        st = self.state
        if self.cfg.model_version >= 4:
            carry = (st.params, st.opt_state, st.plateau, st.key)
            (params, opt_state, plateau, key), metrics = run(carry)
            self.state = FitState(params, opt_state, plateau, key, st.step)
        else:
            cam_opt = make_camera_stage_optimizer(self.cfg)
            cam_state = cam_opt.init({"cameras": st.params["cameras"]})
            carry = (st.params, cam_state, st.plateau, st.key)
            (params, _, plateau, key), metrics = run(carry)
            # fresh-cam-Adam state is dropped; main loop uses its own.
            self.state = FitState(params, st.opt_state, plateau, key, st.step)
        return {k: np.asarray(v) for k, v in metrics.items()}

    def fit(self, steps: Optional[int] = None, chunk: int = 500,
            on_chunk: Optional[Callable[["NemoFitter", int, dict], None]] = None
            ) -> Dict[str, np.ndarray]:
        """Main optimization loop, chunked for checkpoint emission.

        on_chunk(fitter, step, metrics) runs on the host between chunks
        (the reference saves every 500 steps, entry :248-252).
        """
        steps = self.cfg.n_steps if steps is None else steps
        all_metrics: Dict[str, list] = {}
        done = 0
        while done < steps:
            n = min(chunk, steps - done)
            run = self._stage_scan("main", n)
            st = self.state
            carry = (st.params, st.opt_state, st.plateau, st.key)
            (params, opt_state, plateau, key), metrics = run(carry)
            self.state = FitState(params, opt_state, plateau, key,
                                  st.step + n)
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            for k, v in metrics.items():
                all_metrics.setdefault(k, []).append(v)
            done += n
            if on_chunk is not None:
                on_chunk(self, self.state.step, metrics)
        return {k: np.concatenate(v) for k, v in all_metrics.items()}

    # ------------------------------------------------------------------
    # evaluation helpers
    # ------------------------------------------------------------------

    def eval_loss(self, batch_size: Optional[int] = None,
                  full: bool = True) -> Dict[str, float]:
        """Loss without updating (the reference's step(update=False, ...),
        entry :220-226). full=True evaluates the FULL (view, frame) grid
        (the --eval_full_batch path); full=False draws one random batch
        like the reference's default init eval."""
        assets = self.assets
        V, F = assets.num_views, assets.num_frames
        if full:
            vi = jnp.repeat(jnp.arange(V), F)
            fi = jnp.tile(jnp.arange(F), V)
        else:
            B = batch_size or self.cfg.batch_size
            vi, fi = _sample_batch(jax.random.fold_in(self.state.key, 0xE7A1),
                                   B, V, F)
        _, metrics = jax.jit(
            functools.partial(fit_loss, cfg=self.cfg, assets=assets,
                              training=False))(
            self.state.params, view_idx=vi, frame_idx=fi)
        return {k: float(v) for k, v in metrics.items()}
