#!/bin/bash
# End-to-end NeMo-MoCap fit (the reference's
# run_scripts_examples/nemomocap-example.sh workload on this framework).
#
# 1) pack the action's raw per-view data into a bundle:
#    python -m nemo_tpu.cli.preprocess \
#        --nemo_cfg_path configs/action-example.yml \
#        --mocap_pkl data/mocap/baseball_pitch.pkl \
#        --out bundles/baseball_pitch.npz
#
# 2) fit (real assets):
python -m nemo_tpu.cli.fit \
    --bundle "${1:-bundles/baseball_pitch.npz}" \
    --default_config configs/default-v2.yml \
    --smpl_path software/smpl \
    --j_regressor_extra software/spin_data/J_regressor_extra.npy \
    --vposer_path software/V02_05 \
    --gmm_path software/spin_data/gmm_08.pkl \
    --render_video 1 \
    --out_dir out/mocap/baseball_pitch
