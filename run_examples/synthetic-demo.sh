#!/bin/bash
# Self-contained demo: synthetic problem + synthetic assets, no data needed.
python -m nemo_tpu.cli.fit \
    --synthetic_assets \
    --default_config configs/default-v2.yml \
    --label_type gt \
    --n_steps 500 --warmup_step 100 --opt_cam_step 200 \
    --render_video 1 \
    --out_dir out/synthetic-demo

# Variants:
#   --dp 8           data-parallel over 8 chips (batch shards, params replicated)
#   --full_batch     the custom entry's fixed (V x F)-grid stepping
#   --skin_bf16      production bf16 skinning tables (quality-gated)
