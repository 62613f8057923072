#!/usr/bin/env bash
# VOC2007 A-FAN final setting 1
# (reference: Detection/sh/voc2007/clean50/090_final_setting1.sh —
#  SE: layer 2, gamma 1.0, MIX 0011; SD: roi, gamma 0.1, weight 0.3).
# SMOKE=1 runs a tiny synthetic end-to-end (2 steps + eval).
. "$(dirname "$0")/_common.sh"
OUT=${OUT:-./outputs/voc07_final1}

python -m afan.cli.train_detect --variant afan -s voc2007 -b resnet50 \
  -o "${OUT}" \
  --batch_size 8 --learning_rate 0.008 --step_lr_sizes "[6250, 8750]" \
  --num_steps_to_snapshot 1250 --num_steps_to_finish 11250 \
  --mix_layer 0011 --pertub_idx_se 2 --gamma_se 1.0 --gamma_sd 0.1 \
  --sd_adv_loss_weight 0.3 --only_roi_sd --bf16 \
  $(det_smoke_flags)
