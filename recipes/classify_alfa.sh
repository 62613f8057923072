#!/usr/bin/env bash
# CIFAR-10 ALFA (feature-PGD adversarial training)
# (reference: Classification/cmd/run_perturb.sh — gamma .5, pgd 5 steps,
#  no randinit/clip, tap 13; SGD lr .1, MultiStep[50,150], 200 epochs).
. "$(dirname "$0")/_common.sh"
if [ -n "${SMOKE_TINY}" ]; then
  EXTRA="--data /nonexistent --epochs 1 --limit_batches 2 --batch_size 16"
elif [ -n "${SMOKE}" ]; then
  EXTRA="--data /nonexistent --epochs 2 --limit_batches 3 --batch_size 32"
else
  EXTRA="--data ${DATA}"
fi

python -m afan.cli.train_classify --mode alfa --gamma 0.5 --steps 5 \
  --perturb_idx 13 --save_dir ${OUT:-./outputs/cifar_alfa} --seed 2 \
  ${EXTRA}
