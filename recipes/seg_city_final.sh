#!/usr/bin/env bash
# Cityscapes DeepLabv3+ A-FAN finals — usage: seg_city_final.sh [1|2]
# (reference: Segmentation/sh/city/clean50/091_city_final01.sh —
#  SD=concat γ1.5 w.3 +AFN; SE=2 with (γ.02, MIX 01) or (γ.04, MIX 10);
#  lr .1, crop 768, bs 4).
. "$(dirname "$0")/_common.sh"
N=${1:-1}
if [ "${N}" = "2" ]; then GAMMASE=0.04; MIX=10; else GAMMASE=0.02; MIX=01; fi

python -m afan.cli.train_segment --variant afan \
  --model deeplabv3plus_resnet50 --dataset cityscapes \
  --lr 0.1 --crop_size 768 --batch_size 4 \
  --pertub_idx_sd concat --pertub_idx_se 2 \
  --adv_loss_weight_sd 0.3 --gamma_se ${GAMMASE} --gamma_sd 1.5 \
  --mix_layer ${MIX} --mix_sd --exp city_final0${N} --bf16 \
  $(seg_smoke_flags)
