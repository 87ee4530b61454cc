"""Data layer: packed bundles, synthetic problems, ingestion adapters."""

from .bundle import (MultiViewBundle, resample_indices,
                     resample_to_common_frames)
from .sharded import (ShardedDataset, as_sharded_arrays, batch_iterator,
                      write_shards)
from .camera_fit import fit_gt_camera
from .tracker import (bbox_to_cs, crop_to_image_coords, iou,
                      run_vibe_on_tracks, track_bboxes,
                      track_bboxes_sort)
from .smoothing import (OneEuroFilter, smooth_bbox_params,
                        smooth_pose_sequence)
from .crops import (bbox_from_keypoints, crop_image, crop_scale, flip_img,
                    get_single_image_crop, get_transform, rot_aa,
                    transform_point, uncrop)
from .video import (frames_to_video, openpose_command, run_openpose,
                    video_to_frames)
from .openpose import (flip_horizontal, load_gt2d_pkl_dir,
                       load_gt_camera_pt, load_openpose_dir,
                       parse_openpose_json)
from .penn_action import load_penn_sequence, penn_gt_to_op
from .synthetic import (make_cameras, monotone_warp, smooth_motion,
                        synthetic_problem)
from .vibe_db import (VIBE_DB_SCHEMA, VibeDbBuilder, db_to_shards,
                      extract_features, load_db, make_windows, read_3dpw,
                      read_penn_action)
from .vibe import (densify_person, load_baseline_arrays,
                   load_baseline_pickle, load_vibe_pickle, person_joints2d,
                   select_person_near_gt, vibe_render_arrays, vibe_to_theta)
from .keypoints import (SKELETONS, VOCAB, conversion_index, convert_kps,
                        get_perm_idxs, keypoint_hflip)
from .vibe_readers import (bbox_from_kp2d, iter_tfrecord, parse_tf_example,
                           read_amass, read_h36m, read_insta,
                           read_insta_record, read_mpii3d, read_nemomocap,
                           read_posetrack)
from .amass_process import (amass_state_windows, amass_world_states,
                            canonicalize_windows, cleanup_amass_data,
                            determine_floor_height_and_contacts,
                            estimate_angular_velocity, estimate_velocity,
                            load_amass_windows, process_amass_dir,
                            process_amass_seq)
from .humor_rgb import (load_planercnn_res, load_prox_calibration,
                        load_prox_depth_points, load_prox_observations,
                        load_rgb_video_observations, mask_joints2d,
                        prox_data_paths_from_img, prox_subsequences,
                        read_fitting_seq, read_keypoints,
                        split_overlapping_intervals)

__all__ = [
    "MultiViewBundle", "resample_indices", "resample_to_common_frames",
    "ShardedDataset", "as_sharded_arrays", "batch_iterator", "write_shards",
    "make_cameras",
    "monotone_warp", "smooth_motion", "synthetic_problem",
    "flip_horizontal", "load_gt2d_pkl_dir", "load_gt_camera_pt",
    "load_openpose_dir", "parse_openpose_json",
    "load_penn_sequence", "penn_gt_to_op", "densify_person",
    "VIBE_DB_SCHEMA", "VibeDbBuilder", "db_to_shards",
    "extract_features", "load_db", "make_windows", "read_3dpw",
    "read_penn_action",
    "load_baseline_arrays", "load_baseline_pickle", "load_vibe_pickle",
    "person_joints2d", "select_person_near_gt", "vibe_render_arrays",
    "vibe_to_theta",
    "bbox_from_keypoints", "crop_image", "crop_scale", "flip_img",
    "get_single_image_crop", "get_transform", "rot_aa", "transform_point",
    "uncrop",
    "frames_to_video", "openpose_command", "run_openpose", "video_to_frames",
    "fit_gt_camera", "bbox_to_cs", "crop_to_image_coords", "iou",
    "run_vibe_on_tracks", "track_bboxes", "track_bboxes_sort",
    "OneEuroFilter", "smooth_bbox_params", "smooth_pose_sequence",
    "SKELETONS", "VOCAB", "conversion_index", "convert_kps",
    "get_perm_idxs", "keypoint_hflip",
    "bbox_from_kp2d", "iter_tfrecord", "parse_tf_example", "read_amass",
    "read_h36m", "read_insta", "read_insta_record", "read_mpii3d",
    "read_nemomocap", "read_posetrack",
]
