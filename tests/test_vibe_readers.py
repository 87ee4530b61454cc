"""Per-dataset VIBE db readers + keypoint vocabulary conversion.

Fixtures synthesize each dataset's on-disk layout (tfrecords are written
with an independent protobuf encoder implemented below); the conversion
layer is checked against a literal reimplementation of the reference's
name-matching loop (kp_utils.py:52-62)."""

import json
import os
import os.path as osp
import pickle
import struct

import numpy as np
import pytest

from nemo_tpu.data.keypoints import (SKELETONS, VOCAB, conversion_index,
                                     convert_kps, get_perm_idxs,
                                     keypoint_hflip)
from nemo_tpu.data.vibe_db import make_windows
from nemo_tpu.data.vibe_readers import (bbox_from_kp2d, iter_tfrecord,
                                        mosh_slerp_upsample,
                                        flip_root_orient, h36m_to_spin49,
                                        parse_tf_example, read_amass,
                                        read_h36m, read_insta_record,
                                        read_mpii3d, read_posetrack)

# ---------------------------------------------------------------------------
# keypoint vocabulary


def _convert_kps_loop(joints, src, dst):
    """Literal twin of the reference kp_utils.convert_kps name loop."""
    src_names, dst_names = list(VOCAB[src]), list(VOCAB[dst])
    out = np.zeros((joints.shape[0], len(dst_names), joints.shape[-1]))
    for idx, jn in enumerate(dst_names):
        if jn in src_names:
            out[:, idx] = joints[:, src_names.index(jn)]
    return out


@pytest.mark.parametrize("src,dst", [
    ("h36m", "spin"), ("mpii3d", "spin"), ("insta", "spin"),
    ("posetrack", "spin"), ("pennaction", "spin"), ("coco", "spin"),
    ("spin", "common"), ("spin", "h36m"), ("3dpw", "common"),
    ("mpii", "common"), ("aich", "common"), ("smplcoco", "spin"),
    ("mpii3d_test", "spin"), ("staf", "spin"),
])
def test_convert_kps_matches_reference_loop(src, dst):
    rng = np.random.default_rng(0)
    joints = rng.normal(size=(4, len(VOCAB[src]), 3)).astype(np.float32)
    got = convert_kps(joints, src, dst)
    want = _convert_kps_loop(joints, src, dst)
    np.testing.assert_allclose(got, want, atol=0)
    assert got.shape == (4, len(VOCAB[dst]), 3)


def test_convert_roundtrip_preserves_shared_joints():
    rng = np.random.default_rng(1)
    joints = rng.normal(size=(2, 17, 2))
    back = convert_kps(convert_kps(joints, "h36m", "spin"), "spin", "h36m")
    np.testing.assert_allclose(back, joints)  # h36m is a subset of spin


def test_perm_idxs_and_index():
    idx = conversion_index("spin", "h36m")
    assert (idx >= 0).all()  # every h36m joint exists in spin
    assert VOCAB["spin"][idx[0]] == "hip"
    perm = get_perm_idxs("posetrack", "common")
    assert all(VOCAB["posetrack"][i] in VOCAB["common"] for i in perm)


def test_skeleton_tables_in_range():
    for fmt, skel in SKELETONS.items():
        assert skel.max() < len(VOCAB[fmt]), fmt
        assert skel.min() >= 0


def test_keypoint_hflip():
    kp = np.array([[10.0, 5.0, 1.0]])
    out = keypoint_hflip(kp, 100)
    assert out[0, 0] == 89.0 and out[0, 1] == 5.0
    assert kp[0, 0] == 10.0  # non-mutating


# ---------------------------------------------------------------------------
# independent tf.train.Example encoder (test-side twin of the parser)


def _varint(x):
    out = b""
    while True:
        b7 = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _ld(fnum, payload):
    return _varint(fnum << 3 | 2) + _varint(len(payload)) + payload


def _encode_feature(val, unpacked_floats=False):
    if isinstance(val, list):  # bytes list
        return _ld(1, b"".join(_ld(1, v) for v in val))
    arr = np.asarray(val)
    if arr.dtype.kind == "f":
        if unpacked_floats:  # repeated wire-type-5 fields
            body = b"".join(
                _varint(1 << 3 | 5) + struct.pack("<f", float(v))
                for v in arr.reshape(-1))
            return _varint(2 << 3 | 2) + _varint(len(body)) + body
        return _ld(2, _ld(1, arr.astype("<f4").tobytes()))
    body = b"".join(_varint(int(v) & ((1 << 64) - 1))
                    for v in arr.reshape(-1))
    return _ld(3, _ld(1, body))


def _encode_example(feats, unpacked_floats=False):
    entries = b""
    for k, v in feats.items():
        entry = _ld(1, k.encode()) + _ld(
            2, _encode_feature(v, unpacked_floats))
        entries += _ld(1, entry)
    return _ld(1, entries)


def _write_tfrecord(path, records):
    with open(path, "wb") as f:
        for r in records:
            f.write(struct.pack("<Q", len(r)) + b"\0" * 4 + r + b"\0" * 4)


@pytest.mark.parametrize("unpacked", [False, True])
def test_tf_example_roundtrip(tmp_path, unpacked):
    feats = {
        "meta/N": np.array([3], np.int64),
        "image/xys": np.arange(12, dtype=np.float32),
        "neg": np.array([-5, 7], np.int64),
        "blob": [b"abc", b"defg"],
    }
    path = str(tmp_path / "t.tfrecord")
    _write_tfrecord(path, [_encode_example(feats, unpacked)])
    recs = list(iter_tfrecord(path))
    assert len(recs) == 1
    got = parse_tf_example(recs[0])
    np.testing.assert_array_equal(got["meta/N"], [3])
    np.testing.assert_allclose(got["image/xys"], feats["image/xys"])
    np.testing.assert_array_equal(got["neg"], [-5, 7])
    assert got["blob"] == [b"abc", b"defg"]


def _insta_example(n, rng, phis=False):
    xys = rng.uniform(10, 200, size=(n, 2, 14)).astype(np.float32)
    vis = np.ones((n, 1, 14), np.int64)
    face = rng.uniform(10, 200, size=(n, 3, 5)).astype(np.float32)
    toe = rng.uniform(10, 200, size=(n, 3, 6)).astype(np.float32)
    feats = {
        "meta/N": np.array([n], np.int64),
        "image/xys": xys.reshape(-1),
        "image/visibilities": vis.reshape(-1),
        "image/face_pts": face.reshape(-1),
        "image/toe_pts": toe.reshape(-1),
        "image/encoded": [b"jpg%d" % i for i in range(n)],
    }
    if phis:
        feats["image/phis"] = np.zeros(n, np.float32)
    return feats, xys, vis, face, toe


def test_read_insta_record(tmp_path):
    rng = np.random.default_rng(2)
    f1, xys, vis, face, toe = _insta_example(4, rng)
    f2 = _insta_example(3, rng)[0]
    path = str(tmp_path / "v.tfrecord")
    _write_tfrecord(path, [_encode_example(f1), _encode_example(f2)])
    db = read_insta_record(path).build()
    assert db["joints2D"].shape == (7, 49, 3)
    assert set(db["vid_name"]) == {f"{path}-0", f"{path}-1"}
    # insta joint 14 is 'OP Nose' -> spin joint 0; xys row 14 lives in
    # face_pts[:, :, 0] (insta kps = [xys;vis] ++ face ++ toe)
    np.testing.assert_allclose(db["joints2D"][0, 0, :2], face[0, :2, 0])
    # insta joint 8 'OP RShoulder' -> spin joint 2
    np.testing.assert_allclose(db["joints2D"][0, 2, :2], xys[0, :, 8])
    assert (db["valid"][:4] == 1).all()


def test_read_insta_phis_rescales(tmp_path):
    rng = np.random.default_rng(3)
    feats, xys, *_ = _insta_example(2, rng, phis=True)
    feats["image/xys"] = np.full(2 * 2 * 14, 0.5, np.float32)
    path = str(tmp_path / "p.tfrecord")
    _write_tfrecord(path, [_encode_example(feats)])
    db = read_insta_record(path).build()
    # kp = ((0.5 + 1) * 0.5) * 224 = 168 for every xys joint
    np.testing.assert_allclose(db["joints2D"][0, 2, :2], [168.0, 168.0])


# ---------------------------------------------------------------------------
# PoseTrack


def _posetrack_tree(tmp_path, n_frames=12):
    ann_dir = tmp_path / "posetrack_data" / "annotations" / "train"
    os.makedirs(ann_dir)
    names = list(VOCAB["posetrack"])
    orig = ["nose", "head_bottom", "head_top", "left_ear", "right_ear",
            "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
            "left_wrist", "right_wrist", "left_hip", "right_hip",
            "left_knee", "right_knee", "left_ankle", "right_ankle"]
    # file stores keypoints in a shuffled order
    file_order = orig[::-1]
    rng = np.random.default_rng(4)
    annotations = []
    for t in range(n_frames):
        kp = rng.uniform(5, 100, size=(17, 3)).astype(float)
        kp[:, 2] = 2.0  # file confidences are overwritten to 1
        # order rows by file_order relative to orig
        row = np.zeros((17, 3))
        for i, nm in enumerate(file_order):
            row[i] = kp[orig.index(nm)]
        annotations.append({
            "track_id": 0, "image_id": t,
            "keypoints": row.reshape(-1).tolist(),
            "bbox": [10.0, 20.0, 30.0, 50.0],
        })
    # a too-short second track
    annotations.append({"track_id": 1, "image_id": 0,
                        "keypoints": np.ones(51).tolist(),
                        "bbox": [0.0, 0.0, 5.0, 5.0]})
    anns = {
        "images": [{"frame_id": t, "file_name": f"images/{t:04d}.jpg",
                    "is_labeled": True} for t in range(n_frames)],
        "categories": [{"keypoints": file_order}],
        "annotations": annotations,
    }
    with open(ann_dir / "seq1.json", "w") as f:
        json.dump(anns, f)
    return str(tmp_path)


def test_read_posetrack(tmp_path):
    folder = _posetrack_tree(tmp_path)
    db = read_posetrack(folder, "train").build()
    assert db["joints2D"].shape == (12, 49, 3)
    assert len(set(db["vid_name"])) == 1  # short track dropped
    # bbox: tlwh (10,20,30,50) -> center (25,45), side 0.8*50=40
    np.testing.assert_allclose(db["bbox"][0], [25, 45, 40, 40])
    assert (db["joints2D"][..., 2] <= 1).all()
    # windows never cross: 12 frames, seqlen 8 -> one window
    assert make_windows(db["vid_name"], 8).shape == (1, 8)


# ---------------------------------------------------------------------------
# MPI-INF-3DHP


def test_read_mpii3d(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(5)
    F = 10
    n_vids = 9
    annot2 = np.empty((n_vids, 1), object)
    annot3 = np.empty((n_vids, 1), object)
    for v in range(n_vids):
        a2 = rng.uniform(100, 1900, size=(F, 28 * 2))
        a3 = rng.normal(0, 500, size=(F, 28 * 3))
        if v == 0:
            # offscreen 'hip' (mpii3d joint 4 -> survives ->spin) at frame 4
            # splits vid 0 into 2 segments
            a2[4, 2 * 4] = -50.0
        annot2[v, 0] = a2
        annot3[v, 0] = a3
    d = tmp_path / "S1" / "Seq1"
    os.makedirs(d)
    savemat(str(d / "annot.mat"), {"annot2": annot2, "annot3": annot3})
    db = read_mpii3d(str(tmp_path), user_list=[1], seq_list=[1]).build()
    vids = set(db["vid_name"])
    assert "subj1_seq1_vid0_seg0" in vids and "subj1_seq1_vid0_seg1" in vids
    assert "subj1_seq1_vid1_seg0" in vids
    # vid 0 loses exactly the offscreen frame
    assert (np.char.startswith(db["vid_name"], "subj1_seq1_vid0")).sum() == 9
    # root-centering: spin joint 39 ('hip') is 0
    np.testing.assert_allclose(db["joints3D"][:, 39], 0, atol=1e-6)
    # mm -> m: values are O(1)
    assert np.abs(db["joints3D"]).max() < 5


# ---------------------------------------------------------------------------
# AMASS


def test_read_amass(tmp_path):
    d = tmp_path / "CMU" / "01"
    os.makedirs(d)
    rng = np.random.default_rng(6)
    poses = rng.normal(size=(300, 156))
    np.savez(d / "01_01_poses.npz", poses=poses,
             trans=rng.normal(size=(300, 3)), betas=rng.normal(size=16),
             mocap_framerate=np.array(100.0))
    np.savez(d / "short_poses.npz", poses=poses[:100],
             trans=np.zeros((100, 3)), betas=np.zeros(16),
             mocap_framerate=np.array(100.0))  # 25 frames at 25fps: dropped
    np.savez(d / "xx_shape.npz", poses=np.zeros((2, 156)))
    db = read_amass(str(tmp_path), sequences=("CMU",))
    assert db["theta"].shape == (75, 82)  # 300 @ 100fps -> 75 @ 25fps
    assert set(db["vid_name"]) == {"CMU_01_01_01_poses"}
    # pose col 0..65 are joints 0..21; joint 23 cols come from raw joint 37
    np.testing.assert_allclose(db["theta"][0, 69:72],
                               poses[0, 37 * 3:37 * 3 + 3], rtol=1e-6)
    np.testing.assert_allclose(db["theta"][0, 72:], 0, atol=10)  # betas[:10]


# ---------------------------------------------------------------------------
# H36M


def test_h36m_to_spin49():
    rng = np.random.default_rng(7)
    p2 = rng.uniform(0, 1000, size=(3, 64)).astype(np.float32)
    p3 = rng.normal(0, 500, size=(3, 96)).astype(np.float32)
    j2d, j3d, s17 = h36m_to_spin49(p2, p3)
    assert j2d.shape == (3, 49, 3) and j3d.shape == (3, 49, 3)
    # h36m raw joint 11 maps through slot 0 -> GT index 14 -> spin 25+14=39
    np.testing.assert_allclose(j2d[0, 39, :2],
                               p2.reshape(3, 32, 2)[0, 11])
    assert j2d[0, 39, 2] == 1.0
    np.testing.assert_allclose(j3d[0, 39],
                               p3.reshape(3, 32, 3)[0, 11] / 1000.0)
    # untouched joints stay zero
    assert (j2d[:, :25] == 0).all()


def test_mosh_slerp_upsample_linear_axis():
    # rotations about a fixed axis slerp to linearly interpolated angles
    angles = np.array([0.0, 0.5, 1.0])
    poses = np.zeros((3, 72))
    poses[:, 5] = angles  # joint 1, z component
    up = mosh_slerp_upsample(poses, factor=5)
    assert up.shape == (10, 72)
    np.testing.assert_allclose(up[:5, 5], np.linspace(0, 0.5, 5), atol=1e-7)
    np.testing.assert_allclose(up[5:, 5], np.linspace(0.5, 1.0, 5),
                               atol=1e-7)
    assert np.abs(up[:, :5]).max() < 1e-12


def test_flip_root_orient():
    from scipy.spatial.transform import Rotation

    pose = np.zeros((2, 72))
    pose[1, :3] = [0, np.pi / 2, 0]
    out = flip_root_orient(pose)
    np.testing.assert_allclose(out[0, :3], [np.pi, 0, 0], atol=1e-12)
    want = (Rotation.from_rotvec([np.pi, 0, 0]) *
            Rotation.from_rotvec([0, np.pi / 2, 0])).as_rotvec()
    np.testing.assert_allclose(out[1, :3], want, atol=1e-12)
    assert (out[:, 3:] == 0).all()


def test_read_h36m(tmp_path):
    rng = np.random.default_rng(8)
    F = 30
    base = tmp_path / "S1" / "MyPoseFeatures"
    os.makedirs(base / "D3_Positions_mono")
    os.makedirs(base / "D2_Positions")
    p3 = rng.normal(0, 500, size=(F, 96))
    p2 = rng.uniform(0, 1000, size=(F, 64))
    np.savez(base / "D3_Positions_mono" / "Walking.54138969.npz", pose=p3)
    np.savez(base / "D2_Positions" / "Walking.54138969.npz", pose=p2)
    # '_ALL' action must be skipped
    np.savez(base / "D3_Positions_mono" / "_ALL.54138969.npz", pose=p3)
    np.savez(base / "D2_Positions" / "_ALL.54138969.npz", pose=p2)
    mosh_dir = tmp_path / "mosh" / "neutrMosh" / "neutrSMPL_H3.6" / "S1"
    os.makedirs(mosh_dir)
    with open(mosh_dir / "Walking_cam0_aligned.pkl", "wb") as f:
        pickle.dump({"new_poses": rng.normal(size=(8, 72)),
                     "betas": rng.normal(size=10)}, f)
    db = read_h36m(str(tmp_path), user_list=[1]).build()
    assert set(db["vid_name"]) == {"S1_Walking.54138969"}
    assert db["joints2D"].shape == (F - 10, 49, 3)  # 10-frame mosh tail
    assert np.abs(db["pose"]).sum() > 0  # mosh thetas present
    assert np.abs(db["shape"]).sum() > 0
    # joints3D carries GT S49 (no smpl_joints_fn): /1000 scatter
    np.testing.assert_allclose(db["joints3D"][0, 39],
                               p3.reshape(F, 32, 3)[0, 11] / 1000.0)


def test_read_h36m_smpl_joints_alignment(tmp_path):
    rng = np.random.default_rng(9)
    F = 12
    base = tmp_path / "S1" / "MyPoseFeatures"
    os.makedirs(base / "D3_Positions_mono")
    os.makedirs(base / "D2_Positions")
    p3 = rng.normal(0, 500, size=(F, 96))
    np.savez(base / "D3_Positions_mono" / "Eating.55011271.npz", pose=p3)
    np.savez(base / "D2_Positions" / "Eating.55011271.npz",
             pose=rng.uniform(0, 1000, size=(F, 64)))
    mosh_dir = tmp_path / "mosh" / "neutrMosh" / "neutrSMPL_H3.6" / "S1"
    os.makedirs(mosh_dir)
    with open(mosh_dir / "Eating_cam1_aligned.pkl", "wb") as f:
        pickle.dump({"new_poses": rng.normal(size=(6, 72)),
                     "betas": np.zeros(10)}, f)
    fixed = rng.normal(size=(49, 3))

    db = read_h36m(str(tmp_path), user_list=[1], drop_tail=2,
                   smpl_joints_fn=lambda pose, shape: fixed).build()
    # moshed joints root-aligned: joint 39 equals the GT hip
    gt_hip = p3.reshape(F, 32, 3)[:, 11] / 1000.0
    np.testing.assert_allclose(db["joints3D"][:, 39], gt_hip[:F - 2],
                               atol=1e-6)


# ---------------------------------------------------------------------------
# NeMo-MoCap


def test_apply_rigid_to_motion():
    from scipy.spatial.transform import Rotation

    from nemo_tpu.data.vibe_readers import apply_rigid_to_motion

    rng = np.random.default_rng(10)
    pose = rng.normal(size=(5, 72)).astype(np.float32)
    trans = rng.normal(size=(5, 3)).astype(np.float32)
    rotvec = np.array([0.3, -0.2, 0.5])
    cam_t = np.array([1.0, 2.0, 3.0])
    out_pose, out_trans = apply_rigid_to_motion(pose, trans, rotvec, cam_t)
    R = Rotation.from_rotvec(rotvec)
    # orient composition matches scipy; body pose untouched
    want = (R * Rotation.from_rotvec(pose[2, :3])).as_rotvec()
    np.testing.assert_allclose(out_pose[2, :3], want, atol=1e-6)
    np.testing.assert_allclose(out_pose[:, 3:], pose[:, 3:])
    np.testing.assert_allclose(out_trans[2], R.as_matrix() @ trans[2] + cam_t,
                               atol=1e-6)


def test_read_nemomocap(tmp_path):
    import joblib

    from nemo_tpu.data.vibe_readers import read_nemomocap

    rng = np.random.default_rng(11)
    F = 6
    db_dir = tmp_path / "db"
    mocap_root = tmp_path / "mocap"
    cam_dir = tmp_path / "cams"
    for action, img in [("baseball_swing", "IMG_6289"),
                        ("tennis_serve", "IMG_6287")]:
        vid = f"{action}.0.mp4"
        gt = db_dir / f"mymocap_{action}" / (vid + "_gt_new")
        os.makedirs(gt)
        for t in range(F):
            joblib.dump(rng.uniform(0, 500, size=(1, 49, 2)).astype(
                np.float32), gt / f"{t + 1:06d}_keypoints.pkl")
        os.makedirs(mocap_root, exist_ok=True)
        joblib.dump({"fullpose": rng.normal(size=(F, 156)).astype(np.float32),
                     "betas": rng.normal(size=16).astype(np.float32),
                     "trans": rng.normal(size=(F, 3)).astype(np.float32)},
                    mocap_root / f"{action}.0.pkl")
    os.makedirs(cam_dir)
    for img in ("IMG_6287", "IMG_6289"):
        joblib.dump({"rot6d": np.array([1, 0, 0, 0, 1, 0], np.float32),
                     "tran": np.zeros(3, np.float32),
                     "K": np.eye(3, dtype=np.float32) * 5000},
                    cam_dir / f"opt_cam_{img}_20230227.pt")

    fixed = rng.normal(size=(49, 3)).astype(np.float32)
    db = read_nemomocap(str(db_dir), str(mocap_root), str(cam_dir),
                        split="train",
                        smpl_joints_fn=lambda p, b, t: fixed).build()
    assert set(db["vid_name"]) == {"baseball_swing.0.mp4",
                                   "tennis_serve.0.mp4"}
    assert db["joints2D"].shape == (2 * F, 49, 3)
    assert (db["joints2D"][..., 2] == 1).all()
    # identity camera: pose[:, 66:] are the zeroed SMPL-H hand slots
    np.testing.assert_allclose(db["pose"][:, 66:], 0)
    np.testing.assert_allclose(db["joints3D"][0], fixed)
    assert db["bbox"].shape == (2 * F, 4)
    assert (db["bbox"][:, 2] > 0).all()


def test_read_nemomocap_val_split_empty(tmp_path):
    from nemo_tpu.data.vibe_readers import read_nemomocap

    b = read_nemomocap(str(tmp_path), str(tmp_path), str(tmp_path),
                       split="val")
    assert not b._cols["vid_name"]  # nothing on disk -> nothing added


def test_smooth_bbox_from_j2d():
    from nemo_tpu.data.vibe_readers import smooth_bbox_from_j2d

    rng = np.random.default_rng(12)
    j2d = np.zeros((20, 49, 3), np.float32)
    j2d[..., :2] = rng.uniform(100, 200, size=(20, 49, 2))
    j2d[..., 2] = 1.0
    bbox = smooth_bbox_from_j2d(j2d)
    assert bbox.shape == (20, 4)
    np.testing.assert_allclose(bbox[:, 2], bbox[:, 3])
    assert (bbox[:, 2] > 0).all()
    # smoothing: variance of smoothed centers <= raw centers
    raw_c = (j2d[..., 0].max(1) + j2d[..., 0].min(1)) / 2
    assert bbox[:, 0].std() <= raw_c.std() + 1e-3


def test_bbox_from_kp2d():
    kp = np.array([[0.0, 0.0], [10.0, 4.0]])
    np.testing.assert_allclose(bbox_from_kp2d(kp), [5, 2, 11, 11])
    batched = bbox_from_kp2d(np.stack([kp, kp + 1]))
    assert batched.shape == (2, 4)
    np.testing.assert_allclose(batched[1], [6, 3, 11, 11])


def test_build_vibe_db_cli(tmp_path, capsys):
    """CLI surface over the readers: penn_action fixture -> db + shards."""
    from scipy.io import savemat

    from nemo_tpu.cli.build_vibe_db import main

    labels = tmp_path / "data" / "labels"
    os.makedirs(labels)
    rng = np.random.default_rng(13)
    F = 20
    savemat(str(labels / "0001.mat"),
            {"x": rng.uniform(10, 100, size=(F, 13)),
             "y": rng.uniform(10, 100, size=(F, 13)),
             "visibility": np.ones((F, 13))})
    out_db = tmp_path / "penn_db.pt"
    shards = tmp_path / "shards"
    rc = main(["--dataset", "penn_action", "--dir", str(tmp_path / "data"),
               "--out", str(out_db), "--shards_out", str(shards),
               "--seqlen", "8"])
    assert rc == 0
    assert out_db.exists()
    from nemo_tpu.data.sharded import ShardedDataset
    ds = ShardedDataset(str(shards))
    assert len(ds) == 2  # 20 frames -> two 8-frame windows
    cap = capsys.readouterr().out
    assert "1 sequences" in cap


def test_build_vibe_db_cli_amass(tmp_path):
    from nemo_tpu.cli.build_vibe_db import main

    d = tmp_path / "CMU" / "01"
    os.makedirs(d)
    rng = np.random.default_rng(14)
    np.savez(d / "a_poses.npz", poses=rng.normal(size=(400, 156)),
             trans=np.zeros((400, 3)), betas=np.zeros(16),
             mocap_framerate=np.array(100.0))
    shards = tmp_path / "shards"
    rc = main(["--dataset", "amass", "--dir", str(tmp_path),
               "--shards_out", str(shards), "--seqlen", "16"])
    assert rc == 0
    from nemo_tpu.data.sharded import ShardedDataset
    ds = ShardedDataset(str(shards))
    assert len(ds) == 100 // 16
