#!/usr/bin/env bash
# VOC2007 A-FAN final setting 2
# (reference: Detection/sh/voc2007/clean50/091_final_setting2.sh —
#  same as setting 1 with SD gamma 0.05).
. "$(dirname "$0")/_common.sh"
OUT=${OUT:-./outputs/voc07_final2}

python -m afan.cli.train_detect --variant afan -s voc2007 -b resnet50 \
  -o "${OUT}" \
  --batch_size 8 --learning_rate 0.008 --step_lr_sizes "[6250, 8750]" \
  --num_steps_to_snapshot 1250 --num_steps_to_finish 11250 \
  --mix_layer 0011 --pertub_idx_se 2 --gamma_se 1.0 --gamma_sd 0.05 \
  --sd_adv_loss_weight 0.3 --only_roi_sd --bf16 \
  $(det_smoke_flags)
