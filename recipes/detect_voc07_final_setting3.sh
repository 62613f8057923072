#!/usr/bin/env bash
# VOC2007 A-FAN final setting 3
# (reference: Detection/sh/voc2007/clean50/092_final_setting3.sh —
#  SD gamma 0.2 with AFN on the SD feature: --mix_sd instead of
#  --only_roi_sd).
. "$(dirname "$0")/_common.sh"
OUT=${OUT:-./outputs/voc07_final3}

python -m afan.cli.train_detect --variant afan -s voc2007 -b resnet50 \
  -o "${OUT}" \
  --batch_size 8 --learning_rate 0.008 --step_lr_sizes "[6250, 8750]" \
  --num_steps_to_snapshot 1250 --num_steps_to_finish 11250 \
  --mix_layer 0011 --pertub_idx_se 2 --gamma_se 1.0 --gamma_sd 0.2 \
  --sd_adv_loss_weight 0.3 --mix_sd --bf16 \
  $(det_smoke_flags)
