#!/bin/bash
# Self-contained demo: synthetic problem + synthetic assets, no data needed.
python -m nemo_tpu.cli.fit \
    --synthetic_assets \
    --default_config configs/default-v2.yml \
    --label_type gt \
    --n_steps 500 --warmup_step 100 --opt_cam_step 200 \
    --render_video 1 \
    --out_dir out/synthetic-demo
