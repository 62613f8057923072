#!/usr/bin/env bash
# VOC2007 DeepLabv3+ A-FAN final (15k iters)
# (reference: Segmentation/sh/voc/2007/clean50/01_voc2007_final1.sh —
#  SD=concat γ.4 w.1; SE=2 γ.03, MIX 01 or 11; bs 4).
. "$(dirname "$0")/_common.sh"
MIX=${1:-01}

python -m afan.cli.train_segment --variant afan \
  --model deeplabv3plus_resnet50 --dataset voc --batch_size 4 \
  --total_itrs 15000 \
  --pertub_idx_sd concat --pertub_idx_se 2 \
  --adv_loss_weight_sd 0.1 --gamma_se 0.03 --gamma_sd 0.4 \
  --mix_layer ${MIX} --exp voc07_final1_${MIX} --bf16 \
  $(seg_smoke_flags)
