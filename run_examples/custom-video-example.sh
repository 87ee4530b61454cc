#!/bin/bash
# End-to-end custom-video NeMo fit: the reference's custom_video/demo.sh +
# custom_video/nemo-run.sh pipeline (videos -> frames -> OpenPose -> VIBE
# -> the custom entry's full-batch NeMo fit) expressed on this framework.
#
# Usage: run_examples/custom-video-example.sh <nemo-config.yml> [data_dir]
# The YAML is the reference's custom_video/nemo-config.yml format
# (videos: names: [...] + exp_dir); data_dir holds videos/<name>.
# Layout produced (what cli/preprocess.py probes):
#   <exp_dir>/<name>.frames/           per-view PNG frames
#   <exp_dir>/<name>.op/               per-view OpenPose JSON
#   <exp_dir>/<name>_vibe/vibe_output.pkl   per-view VIBE init
set -e
CFG="${1:?usage: custom-video-example.sh <nemo-config.yml> [data_dir]}"
DATA="${2:-custom_video/data}"
EXPS=$(python -c "import yaml,sys; print(yaml.safe_load(open('$CFG'))['exp_dir'])")
NAMES=$(python -c "import yaml; print(' '.join(yaml.safe_load(open('$CFG'))['videos']['names']))")

# 1) video -> frames per view (custom_video/video_to_frames_custom.py via
#    scripts/video_to_frames.py; here: nemo_tpu.cli.video_tool).
python -m nemo_tpu.cli.video_tool frames \
    --nemo_cfg_path "$CFG" --data_dir "$DATA"

# 2) OpenPose on each frame dir (custom_video/demo.sh:55 docker run ...
#    openpose.bin --model_pose BODY_25 --number_people_max 1).
python -m nemo_tpu.cli.video_tool openpose \
    --nemo_cfg_path "$CFG" --data_dir "$DATA"

# 3) VIBE on each view (custom_video/demo.sh:22-24 runs VIBE_custom/demo.py
#    per video; here: nemo_tpu.cli.vibe_demo over the extracted frames,
#    person detections seeded from the OpenPose keypoints).
for name in $NAMES; do
    mkdir -p "$EXPS/${name}_vibe"
    python -m nemo_tpu.cli.vibe_demo \
        --frames_dir "$EXPS/${name}.frames" \
        --openpose_dir "$EXPS/${name}.op" \
        --spin_ckpt software/spin_model_checkpoint.pth.tar \
        --smpl_path software/smpl \
        --out "$EXPS/${name}_vibe/vibe_output.pkl"
done

# 4) Pack the per-view OpenPose JSON + VIBE outputs into a bundle
#    (the custom entry's data_loader_type=demo surface).
python -m nemo_tpu.cli.preprocess \
    --nemo_cfg_path "$CFG" \
    --out "$EXPS/bundle.npz"

# 5) The custom entry's fit, hyperparameters exactly as
#    custom_video/nemo-run.sh:40-67 (model_version 3, full-batch stepping
#    per learned_multi_view_recon_nn_custom.py:315, instance_style 2,
#    2000 steps, opt_cam at 1000); outer lr_human sweep as nemo-run.sh:1.
for lr_human in 1e-4 1e-3; do
python -m nemo_tpu.cli.fit \
    --bundle "$EXPS/bundle.npz" \
    --default_config configs/default-v1.yml \
    --label_type op \
    --data_loader_type demo \
    --nemo_cfg_path "$CFG" \
    --out_dir "$DATA/out/custom-${lr_human}" \
    --smpl_path software/smpl \
    --j_regressor_extra software/spin_data/J_regressor_extra.npy \
    --vposer_path software/V02_05 \
    --gmm_path software/spin_data/gmm_08.pkl \
    --lr_factor 1 \
    --batch_size 512 \
    --n_steps 2000 \
    --warmup_step 300 \
    --opt_cam_step 1000 \
    --model_version 3 \
    --phase_rbf_dim 100 \
    --rbf_kernel quadratic \
    --loss mse_robust \
    --lr_phase 0 \
    --weight_gmm_loss 1 \
    --weight_vp_loss 10 \
    --weight_vp_z_loss 1 \
    --lr_human "${lr_human}" \
    --lr_instance 1e-3 \
    --instance_code_size 5 \
    --h_dim 1000 \
    --weight_3d_loss 1000 \
    --full_batch \
    --render_rollout_figure \
    --render_video 1 \
    --db
done
