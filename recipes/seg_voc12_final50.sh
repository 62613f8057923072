#!/usr/bin/env bash
# VOC2012 DeepLabv3+ R50 A-FAN final — usage: seg_voc12_final50.sh [1-4]
# (reference: Segmentation/sh/voc/2012/clean50/01_final50.sh —
#  SD=aspp γ.4 w.3; four SE sweeps: (L3 γ.01 MIX 11), (L3 γ.01 MIX 01),
#  (L2 γ.01 MIX 01), (L2 γ.03 MIX 00); bs 4).
. "$(dirname "$0")/_common.sh"
N=${1:-1}
case "${N}" in
  1) SE=3; GAMMASE=0.01; MIX=11 ;;
  2) SE=3; GAMMASE=0.01; MIX=01 ;;
  3) SE=2; GAMMASE=0.01; MIX=01 ;;
  4) SE=2; GAMMASE=0.03; MIX=00 ;;
  *) echo "sweep must be 1-4"; exit 1 ;;
esac

python -m afan.cli.train_segment --variant afan \
  --model deeplabv3plus_resnet50 --dataset voc --batch_size 4 \
  --pertub_idx_sd aspp --pertub_idx_se ${SE} \
  --adv_loss_weight_sd 0.3 --gamma_se ${GAMMASE} --gamma_sd 0.4 \
  --mix_layer ${MIX} --exp voc12_final50_${N} --bf16 \
  $(seg_smoke_flags)
