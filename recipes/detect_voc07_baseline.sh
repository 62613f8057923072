#!/usr/bin/env bash
# VOC2007 clean Faster R-CNN baseline
# (reference: Detection/sh/voc2007/clean50/080_voc_res50_clean_baseline.sh
#  + train_baseline.py defaults).
. "$(dirname "$0")/_common.sh"
OUT=${OUT:-./outputs/voc07_baseline}

python -m afan.cli.train_detect --variant baseline -s voc2007 -b resnet50 \
  -o "${OUT}" \
  --batch_size 8 --learning_rate 0.008 --step_lr_sizes "[6250, 8750]" \
  --num_steps_to_snapshot 1250 --num_steps_to_finish 11250 --bf16 \
  $(det_smoke_flags)
