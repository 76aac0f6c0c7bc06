#!/bin/bash
# Round-5 post-training measurement batch (chip must be otherwise idle).
# Produces: STAGES_r05.json, ablation log, BENCH (bench.py stdout),
# FOVEATED_r05_gaze_1M.json, FOVEATED_r05_trained.json, AMR_QUALITY_r05.json.
set -x
cd /root/repo

# 1. per-stage attribution (VERDICT r4 #2 'Done' criterion)
timeout 2400 python profile_stage_table.py --json STAGES_r05.json \
    2>&1 | tail -40 | tee logs/stages_r05.log

# 2. fwd-kernel alpha-mode ablation (production kernel under each TUNE)
timeout 1500 python profile_kernel_ablate.py full tune:f32 tune:bf16 tune:bf16x \
    2>&1 | tail -8 | tee logs/ablate_alpha_r05.log

# 3. headline bench
timeout 1100 python bench.py 2>&1 | tail -2 | tee logs/bench_r05.log

# 4. foveated 1080p at 1M gaussians, gaze-driven, all decimation variants
timeout 2400 python fps_test_amr_1080p_foveated.py --synthetic \
    --num_gaussians 1048576 --gaze --decimate 4 2 1 1 \
    --out_json FOVEATED_r05_gaze_1M.json 2>&1 | tail -12

# 5. same on the TRAINED model (VERDICT r4 #4: 'on a TRAINED model')
timeout 1800 python fps_test_amr_1080p_foveated.py \
    -m logs/train_r05c/model --gaze --decimate 4 2 1 1 \
    --out_json FOVEATED_r05_trained.json 2>&1 | tail -12

# 6. decimation quality sweep at 1080p (+ trained model) + side-by-side PNG
timeout 3000 python amr_quality_sweep.py -m logs/train_r05c/model \
    --densities 400000 1000000 --out AMR_QUALITY_r05.json 2>&1 | tail -16
