#!/usr/bin/env bash
# COCO2017 A-FAN final settings 1-6 — usage: detect_coco_final_setting.sh N
# (reference: Detection/sh/coco/clean50/09{0..5}_final_setting*.sh —
#  shared geometry: min/max side 800/1333, anchors [64,128,256,512],
#  anchor beta 0.1111, bs 8, lr .01, wd 1e-4, steps [120k,160k],
#  finish 180k, eval post-NMS 1000; per-setting SE/SD knobs below).
. "$(dirname "$0")/_common.sh"
N=${1:-1}
OUT=${OUT:-./outputs/coco_final${N}}

case "${N}" in
  1) KNOBS="--mix_layer 0011 --gamma_sd 0.1  --sd_adv_loss_weight 0.3 --only_roi_sd" ;;
  2) KNOBS="--mix_layer 0011 --gamma_sd 0.05 --sd_adv_loss_weight 0.3 --only_roi_sd" ;;
  3) KNOBS="--mix_layer 0011 --gamma_sd 0.2  --sd_adv_loss_weight 0.3 --mix_sd" ;;
  4) KNOBS="--mix_layer 0011 --gamma_sd 0.3  --noise_sd 0.01 --mix_sd" ;;
  5) KNOBS="--mix_layer 1100 --gamma_sd 0.2  --sd_adv_loss_weight 0.3 --mix_sd" ;;
  6) KNOBS="--mix_layer 1100 --gamma_sd 0.1  --sd_adv_loss_weight 0.3 --only_roi_sd" ;;
  *) echo "setting must be 1-6"; exit 1 ;;
esac

python -m afan.cli.train_detect --variant afan -s coco2017 -b resnet50 \
  -o "${OUT}" \
  --image_min_side 800 --image_max_side 1333 \
  --anchor_sizes "[64, 128, 256, 512]" \
  --anchor_smooth_l1_loss_beta 0.1111 \
  --batch_size 8 --learning_rate 0.01 --weight_decay 0.0001 \
  --step_lr_sizes "[120000, 160000]" \
  --num_steps_to_snapshot 40000 --num_steps_to_finish 180000 \
  --pertub_idx_se 2 --gamma_se 0.1 ${KNOBS} --bf16 \
  $(det_smoke_flags)
