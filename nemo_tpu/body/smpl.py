"""SMPL body model in JAX: linear blend skinning + 49-joint superset output.

Behavioral reference:
  * LBS math: /root/reference/human_body_prior/body_model/lbs.py:164-260
    (blend shapes -> joint regression -> pose blendshapes -> kinematic chain
    -> skinning).
  * 49-joint output: /root/reference/hmr/smpl.py:17-43 — smplx's 45 joints
    (24 kinematic + 21 selected vertices) concatenated with 9 extra regressed
    joints, then remapped through constants.py:72-90 JOINT_MAP.

TPU-first design choices:
  * the kinematic chain is composed level-by-level (the SMPL tree is 8 levels
    deep), so FK is a handful of batched (4x4) matmul stages instead of a
    23-step sequential loop;
  * shape blendshapes are computed ONCE per call for the shared betas (NeMo
    optimizes a single (1, 10) beta vector), not per batch element;
  * a joints-only fast path folds every joint regressor through the skinning
    equation into small precomputed tensors, so rollouts/evals that don't
    need the mesh never materialize the (B, 6890, 3) vertex tensor;
  * all heavy contractions use f32 accumulation (precision=HIGHEST).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import batch_rodrigues

HI = jax.lax.Precision.HIGHEST

NUM_BODY_JOINTS = 23   # articulated joints (excluding root)
NUM_JOINTS = 24        # including root
NUM_VERTICES = 6890
NUM_BETAS = 10
NUM_OUTPUT_JOINTS = 49


@dataclasses.dataclass(frozen=True)
class SMPLModel:
    """Immutable SMPL model constants, registered as a jax pytree.

    Array fields are pytree leaves; integer index arrays (parents, joint maps)
    are static aux data resolved at trace time.
    """
    v_template: jnp.ndarray         # (V, 3)
    shapedirs: jnp.ndarray          # (V, 3, n_betas)
    posedirs: jnp.ndarray           # (207, V*3) — reference layout (P, V*3)
    J_regressor: jnp.ndarray        # (24, V)
    lbs_weights: jnp.ndarray        # (V, 24)
    J_regressor_extra: jnp.ndarray  # (9, V)
    # fused joints-only tables (see build_fused_tables):
    fused_ES: jnp.ndarray           # (30, 24)
    fused_EP: jnp.ndarray           # (30, 24, 3, 207)
    fused_EW: jnp.ndarray           # (30, V, 24)
    # vertex-major twins for the Pallas skinning kernel (ops/lbs_pallas.py):
    posedirs_t: jnp.ndarray         # (207, 3, V)
    lbs_weights_t: jnp.ndarray      # (24, V)
    pd_tiles: jnp.ndarray           # (nv, 3, 207, tv) kernel layout
    w_tiles: jnp.ndarray            # (nv, 24, tv) kernel layout
    # static metadata:
    parents: np.ndarray             # (24,) int
    vertex_joint_ids: np.ndarray    # (21,) int vertex ids appended as joints
    joint_map: np.ndarray           # (49,) int reorder of the 54 joints
    faces: Optional[np.ndarray] = None  # (F, 3) int, for rendering

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


_ARRAY_FIELDS = ("v_template", "shapedirs", "posedirs", "J_regressor",
                 "lbs_weights", "J_regressor_extra",
                 "fused_ES", "fused_EP", "fused_EW",
                 "posedirs_t", "lbs_weights_t", "pd_tiles", "w_tiles")
_STATIC_FIELDS = ("parents", "vertex_joint_ids", "joint_map", "faces")


def _smpl_flatten(m: SMPLModel):
    children = tuple(getattr(m, f) for f in _ARRAY_FIELDS)
    aux = tuple(
        None if getattr(m, f) is None else
        (np.asarray(getattr(m, f)).tobytes(),
         np.asarray(getattr(m, f)).dtype.str,
         np.asarray(getattr(m, f)).shape)
        for f in _STATIC_FIELDS)
    return children, aux


def _smpl_unflatten(aux, children):
    statics = {}
    for name, packed in zip(_STATIC_FIELDS, aux):
        if packed is None:
            statics[name] = None
        else:
            buf, dtype, shape = packed
            statics[name] = np.frombuffer(buf, dtype=dtype).reshape(shape)
    return SMPLModel(**dict(zip(_ARRAY_FIELDS, children)), **statics)


jax.tree_util.register_pytree_node(SMPLModel, _smpl_flatten, _smpl_unflatten)


def build_fused_tables(lbs_weights: np.ndarray,
                       J_regressor_extra: np.ndarray,
                       vertex_joint_ids: np.ndarray,
                       posedirs: np.ndarray):
    """Fold the extra-joint regressors through the skinning equation.

    Each of the E = 30 extra output joints (21 selected vertices + 9
    regressed) is a linear functional Rx over the mesh:
        joint_e = sum_v Rx[e, v] * verts[v]
    and verts[v] = sum_j W[v, j] * (A[j] @ (v_shaped[v] + posedirs^T pf)).
    Folding Rx through W and posedirs gives batch-independent tensors:
        ES[e, j]          = sum_v Rx[e,v] W[v,j]              (translation part)
        EW[e, v, j]       = Rx[e,v] W[v,j]                    (shape-term factor)
        EP[e, j, 3, 207]  = sum_v EW[e,v,j] posedirs[:, v, :]  (pose-term fold)
    so the joints-only forward touches nothing of size V in the batch dims.
    """
    V = lbs_weights.shape[0]
    E_sel = len(vertex_joint_ids)
    Rx = np.zeros((E_sel + J_regressor_extra.shape[0], V), dtype=np.float32)
    Rx[np.arange(E_sel), np.asarray(vertex_joint_ids)] = 1.0
    Rx[E_sel:] = J_regressor_extra
    EW = Rx[:, :, None] * lbs_weights[None]          # (30, V, 24)
    ES = EW.sum(axis=1)                              # (30, 24)
    pd = posedirs.reshape(-1, V, 3)                  # (207, V, 3)
    EP = np.einsum('evj,pvk->ejkp', EW, pd,
                   optimize=True)                    # (30, 24, 3, 207)
    return (jnp.asarray(ES), jnp.asarray(EP.astype(np.float32)),
            jnp.asarray(EW))


def _kinematic_levels(parents: np.ndarray):
    """Group joint indices by tree depth. Static (trace-time) computation."""
    parents = np.asarray(parents)
    depth = np.zeros(len(parents), dtype=np.int64)
    for i in range(1, len(parents)):
        depth[i] = depth[parents[i]] + 1
    levels = []
    for d in range(1, int(depth.max()) + 1):
        idx = np.nonzero(depth == d)[0]
        levels.append((idx, parents[idx]))
    return levels


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents: np.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics over the SMPL tree.

    Matches lbs.py:350-403 but composes transforms level-parallel: all joints
    at the same tree depth advance in one batched matmul. parents is a static
    numpy array, so the level structure is resolved at trace time.

    Args:
      rot_mats: (B, J, 3, 3)
      joints: (B, J, 3) rest-pose joint locations (or (J, 3), broadcast).
    Returns:
      posed_joints: (B, J, 3)
      rel_transforms: (B, J, 4, 4) — skinning transforms relative to rest.
    """
    if joints.ndim == 2:
        joints = joints[None]
    B, J = rot_mats.shape[0], rot_mats.shape[1]
    joints = jnp.broadcast_to(joints, (B, J, 3))

    rel_joints = joints.at[:, 1:].add(-joints[:, np.asarray(parents)[1:]])

    # Composition through the fused FK op (one Pallas program on TPU; the
    # XLA fallback is a plain per-joint chain — gather-only, which also
    # sidesteps an XLA verifier bug that scatter-style composition hits
    # under vmap-of-scan).
    from ..ops.fk_pallas import fk_compose
    R_g, t_g = fk_compose(rot_mats, rel_joints,
                          tuple(int(p) for p in np.asarray(parents)))
    T_global = jnp.zeros((B, J, 4, 4), dtype=rot_mats.dtype)
    T_global = T_global.at[:, :, :3, :3].set(R_g)
    T_global = T_global.at[:, :, :3, 3].set(t_g)
    T_global = T_global.at[:, :, 3, 3].set(1.0)

    posed_joints = t_g

    # rel_transforms = T_global with translation reduced by R @ rest_joint
    # (equivalent to lbs.py:399-402's pad/subtract formulation).
    tj = jnp.einsum('bnij,bnj->bni', T_global[:, :, :3, :3], joints,
                    precision=HI)
    rel = T_global.at[:, :, :3, 3].add(-tj)
    return posed_joints, rel


def fk_rt(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FK as (R, t) pairs via the fused tree-walk op (ops/fk_pallas.py).

    On TPU the whole 24-joint chain runs in ONE Pallas program (+ one for
    the backward) instead of ~50 small XLA kernels. Returns
    (R_global (B, J, 3, 3), posed_joints (B, J, 3), t_rel (B, J, 3)) where
    the skinning transform is [R_global | t_rel],
    t_rel = posed_joint - R_global @ rest_joint.
    """
    from ..ops.fk_pallas import fk_compose
    if joints.ndim == 2:
        joints = joints[None]
    B, J = rot_mats.shape[0], rot_mats.shape[1]
    joints = jnp.broadcast_to(joints, (B, J, 3))
    parents = np.asarray(parents)
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    R_g, posed = fk_compose(rot_mats, rel_joints,
                            tuple(int(p) for p in parents))
    t_rel = posed - jnp.einsum('bnij,bnj->bni', R_g, joints, precision=HI)
    return R_g, posed, t_rel


def smpl_forward(model: SMPLModel,
                 betas: jnp.ndarray,
                 body_pose: jnp.ndarray,
                 global_orient: jnp.ndarray,
                 pose2rot: bool = False,
                 want_vertices: bool = True,
                 transl: Optional[jnp.ndarray] = None,
                 want_fk_joints: bool = False):
    """Full SMPL forward pass.

    Args:
      model: SMPLModel constants.
      betas: (1, 10) or (B, 10) shape coefficients.
      body_pose: (B, 23, 3, 3) rotmats (pose2rot=False) or (B, 69) axis-angle.
      global_orient: (B, 1, 3, 3) rotmat or (B, 3) axis-angle.
      want_vertices: if False, skip the mesh and use the fused
        joint-regressor path (identical joints, far less HBM traffic).
      transl: optional (B, 3) translation added to outputs.
      want_fk_joints: also return the raw 24 kinematic-chain joints
        (B, 24, 3) as a third element (the HuMoR state builder needs
        joints in SMPL tree order, which the 49-joint remap discards).
    Returns:
      (vertices or None, joints49): vertices (B, V, 3); joints (B, 49, 3) in
      the SPIN 49-joint order (hmr/smpl.py:29-43). With want_fk_joints, the
      tuple gains posed_joints (B, 24, 3).
    """
    if pose2rot:
        body_rot = batch_rodrigues(body_pose.reshape(-1, 23, 3))
        orient_rot = batch_rodrigues(global_orient.reshape(-1, 1, 3))
    else:
        body_rot = body_pose
        orient_rot = global_orient.reshape(-1, 1, 3, 3)
    B = body_rot.shape[0]
    rot_mats = jnp.concatenate(
        [jnp.broadcast_to(orient_rot, (B, 1, 3, 3)), body_rot], axis=1)

    # Shape blendshapes; betas is shared across the batch in NeMo fits so
    # this is (1, V, 3) rather than (B, V, 3).
    v_shaped = model.v_template + jnp.einsum(
        'bl,mkl->bmk', betas, model.shapedirs, precision=HI)
    J = jnp.einsum('jv,bvk->bjk', model.J_regressor, v_shaped,
                   precision=HI)  # (Bb, 24, 3)
    if J.shape[0] == 1 and B > 1:
        J = jnp.broadcast_to(J, (B, 24, 3))

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, 23 * 9)  # (B, 207)

    posed_joints, A = batch_rigid_transform(rot_mats, J, model.parents)

    if want_vertices:
        pose_offsets = jnp.matmul(
            pose_feature, model.posedirs, precision=HI).reshape(B, -1, 3)
        v_posed = pose_offsets + v_shaped  # (B, V, 3)

        # Skinning via blended per-vertex matrices: M[v] = sum_j W[v,j] A[j].
        # The naive per-joint expansion materializes (B, 24, V, 3) ≈ 1 GB at
        # batch 512; blending first keeps the largest intermediate at
        # (B, V, 12) and the contraction is ONE MXU matmul over j.
        B_ = A.shape[0]
        A34 = A[:, :, :3, :4].reshape(B_, NUM_JOINTS, 12)
        M = jnp.einsum('vj,bjl->bvl', model.lbs_weights, A34,
                       precision=HI).reshape(B_, -1, 3, 4)  # (B, V, 3, 4)
        vh = jnp.concatenate(
            [v_posed, jnp.ones(v_posed.shape[:-1] + (1,), v_posed.dtype)],
            axis=-1)                                        # (B, V, 4)
        verts = jnp.einsum('bvik,bvk->bvi', M, vh, precision=HI)

        extra = jnp.einsum('jv,bvk->bjk', model.J_regressor_extra, verts,
                           precision=HI)                    # (B, 9, 3)
        sel = verts[:, np.asarray(model.vertex_joint_ids)]  # (B, 21, 3)
        joints54 = jnp.concatenate([posed_joints, sel, extra], axis=1)
        joints49 = joints54[:, np.asarray(model.joint_map)]
        if transl is not None:
            verts = verts + transl[:, None, :]
            joints49 = joints49 + transl[:, None, :]
        if want_fk_joints:
            pj = posed_joints + transl[:, None, :] if transl is not None \
                else posed_joints
            return verts, joints49, pj
        return verts, joints49

    # ---- joints-only fused path ----
    if v_shaped.shape[0] != 1:
        raise NotImplementedError(
            "joints-only path requires shared betas (shape (1, 10))")
    # shape term: S[e, j, :] = sum_v EW[e,v,j] v_shaped[v]
    S = jnp.einsum('evj,vk->ejk', model.fused_EW, v_shaped[0],
                   precision=HI)                              # (30, 24, 3)
    E = model.fused_EP.shape[0]
    # One flat (B, 207) @ (207, E*24*3) dot: XLA lowers the 4-d einsum
    # form 'ejkp,bp->bejk' to a convolution+slice chain costing ~180 us
    # per step fwd+bwd at this shape; the constant transpose/reshape of
    # fused_EP folds at compile time.
    EP_flat = model.fused_EP.transpose(3, 0, 1, 2).reshape(207, -1)
    Pterm = jnp.dot(pose_feature, EP_flat,
                    precision=HI).reshape(B, E, 24, 3)
    base = S[None] + Pterm
    # ej[b,e,i] = sum_{j,k} A[b,j,i,k] base[b,e,j,k] as one batched
    # (E, 72) @ (72, 3) matmul per sample
    A_perm = A[:, :, :3, :3].transpose(0, 1, 3, 2).reshape(B, 72, 3)
    ej = jax.lax.dot_general(
        base.reshape(B, E, 72), A_perm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))), precision=HI)
    ej = ej + jnp.einsum('ej,bji->bei', model.fused_ES, A[:, :, :3, 3],
                         precision=HI)
    joints54 = jnp.concatenate([posed_joints, ej], axis=1)
    joints49 = joints54[:, np.asarray(model.joint_map)]
    if transl is not None:
        joints49 = joints49 + transl[:, None, :]
    if want_fk_joints:
        pj = posed_joints + transl[:, None, :] if transl is not None \
            else posed_joints
        return None, joints49, pj
    return None, joints49


def smpl_verts_t(model: SMPLModel, betas: jnp.ndarray,
                 body_rot: jnp.ndarray, orient_rot: jnp.ndarray,
                 padded: bool = False) -> jnp.ndarray:
    """Vertex-major SMPL vertices (B, 3, V) through the fused skinning op.

    Same math as smpl_forward(want_vertices=True) minus the joint outputs;
    FK runs in (R, t)-pair form and skinning through
    ops/lbs_pallas.skin_verts_t (Pallas on TPU, XLA elsewhere). Requires
    shared betas (shape (1, 10)).

    padded=True returns (B, 3, Vp) with zero lanes beyond num_vertices
    (tile-aligned, no slice copy) — for reduction-only consumers; normalize
    by model.num_vertices.
    """
    from ..ops.lbs_pallas import skin_verts_t, skin_verts_t_padded

    B = body_rot.shape[0]
    rot_mats = jnp.concatenate(
        [jnp.broadcast_to(orient_rot.reshape(-1, 1, 3, 3), (B, 1, 3, 3)),
         body_rot], axis=1)
    v_shaped = model.v_template + jnp.einsum(
        'bl,mkl->bmk', betas, model.shapedirs, precision=HI)
    if v_shaped.shape[0] != 1:
        raise NotImplementedError("smpl_verts_t requires shared betas")
    J = jnp.einsum('jv,bvk->bjk', model.J_regressor, v_shaped, precision=HI)

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pf = (rot_mats[:, 1:] - ident).reshape(B, 23 * 9)
    R_g, _, t_rel = fk_rt(rot_mats, J, model.parents)
    A34 = jnp.concatenate([R_g, t_rel[..., None]], axis=-1).reshape(
        B, NUM_JOINTS, 12)

    op = skin_verts_t_padded if padded else skin_verts_t
    return op(model.num_vertices, pf, A34, v_shaped[0].T,
              model.pd_tiles, model.w_tiles)


def subset_skin_tables(model: SMPLModel, n: int):
    """Even vertex subsample + pre-tiled skinning tables for it (host, once).

    For the v2v prior on a vertex subset (NemoConfig.vp_v2v_n_verts): the
    prior only needs a surface-covering sample, not all 6890 vertices, and
    the skinning kernels scale linearly with the vertex count. Returns
    (vidx (n,), pd_tiles, w_tiles) with the subset tiled at a lane-sized
    tile so tiny subsets don't pad to the canonical 512.
    """
    from ..ops.lbs_pallas import tile_tables
    V = model.num_vertices
    vidx = np.unique(np.linspace(0, V - 1, n).astype(np.int64))
    pd_t = np.asarray(model.posedirs_t)[:, :, vidx]
    w_t = np.asarray(model.lbs_weights_t)[:, vidx]
    tv = min(512, max(128, 1 << int(np.ceil(np.log2(max(len(vidx), 1))))))
    pd_tiles, w_tiles, _ = tile_tables(pd_t, w_t, tv=tv)
    return (jnp.asarray(vidx, jnp.int32), jnp.asarray(pd_tiles),
            jnp.asarray(w_tiles))


def smpl_verts_t_subset(model: SMPLModel, betas: jnp.ndarray,
                        body_rot: jnp.ndarray, orient_rot: jnp.ndarray,
                        vidx: jnp.ndarray, pd_tiles: jnp.ndarray,
                        w_tiles: jnp.ndarray) -> jnp.ndarray:
    """smpl_verts_t on a vertex subset: (B, 3, len(vidx)).

    Joint regression still uses the FULL v_shaped (the kinematic tree must
    not change); only the skinned output is subsampled. Tables come from
    subset_skin_tables.
    """
    from ..ops.lbs_pallas import skin_verts_t

    B = body_rot.shape[0]
    rot_mats = jnp.concatenate(
        [jnp.broadcast_to(orient_rot.reshape(-1, 1, 3, 3), (B, 1, 3, 3)),
         body_rot], axis=1)
    v_shaped = model.v_template + jnp.einsum(
        'bl,mkl->bmk', betas, model.shapedirs, precision=HI)
    if v_shaped.shape[0] != 1:
        raise NotImplementedError("smpl_verts_t_subset requires shared betas")
    J = jnp.einsum('jv,bvk->bjk', model.J_regressor, v_shaped, precision=HI)

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pf = (rot_mats[:, 1:] - ident).reshape(B, 23 * 9)
    R_g, _, t_rel = fk_rt(rot_mats, J, model.parents)
    A34 = jnp.concatenate([R_g, t_rel[..., None]], axis=-1).reshape(
        B, NUM_JOINTS, 12)

    vsh_sub = v_shaped[0].T[:, vidx]                       # (3, n)
    return skin_verts_t(int(vidx.shape[0]), pf, A34, vsh_sub,
                        pd_tiles, w_tiles)


def smpl_v2v_l1_sum(model: SMPLModel, betas: jnp.ndarray,
                    body_rot_o: jnp.ndarray, orient_rot_o: jnp.ndarray,
                    body_rot_r: jnp.ndarray, orient_rot_r: jnp.ndarray
                    ) -> jnp.ndarray:
    """sum |verts(rec) - verts(orig)| through the fused v2v kernel
    (ops/lbs_pallas.skin_v2v_l1) — the VPoser v2v objective without
    materializing either mesh. The rec side is a constant (detached), like
    the reference's vposer_loss (:2786-2793). Shared betas (1, 10)."""
    from ..ops.lbs_pallas import skin_v2v_l1

    v_shaped = model.v_template + jnp.einsum(
        'bl,mkl->bmk', betas, model.shapedirs, precision=HI)
    if v_shaped.shape[0] != 1:
        raise NotImplementedError("smpl_v2v_l1_sum requires shared betas")
    J = jnp.einsum('jv,bvk->bjk', model.J_regressor, v_shaped, precision=HI)
    ident = jnp.eye(3)

    def side(body_rot, orient_rot):
        B = body_rot.shape[0]
        rot_mats = jnp.concatenate(
            [jnp.broadcast_to(orient_rot.reshape(-1, 1, 3, 3),
                              (B, 1, 3, 3)), body_rot], axis=1)
        pf = (rot_mats[:, 1:] - ident).reshape(B, 23 * 9)
        R_g, _, t_rel = fk_rt(rot_mats, J, model.parents)
        A34 = jnp.concatenate([R_g, t_rel[..., None]], axis=-1).reshape(
            B, NUM_JOINTS, 12)
        return pf, A34

    pf_o, A_o = side(body_rot_o, orient_rot_o)
    pf_r, A_r = side(body_rot_r, orient_rot_r)
    return skin_v2v_l1(model.num_vertices, pf_o, A_o, v_shaped[0].T,
                       model.pd_tiles, model.w_tiles, pf_r, A_r)
