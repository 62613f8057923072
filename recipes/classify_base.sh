#!/usr/bin/env bash
# CIFAR-10 clean baseline
# (reference: Classification/cmd/run_base.sh — seed 3, SGD lr .1,
#  MultiStep[50,150] gamma .1, 200 epochs, warmup epoch 0).
. "$(dirname "$0")/_common.sh"
if [ -n "${SMOKE_TINY}" ]; then
  EXTRA="--data /nonexistent --epochs 1 --limit_batches 2 --batch_size 16"
elif [ -n "${SMOKE}" ]; then
  EXTRA="--data /nonexistent --epochs 2 --limit_batches 3 --batch_size 32"
else
  EXTRA="--data ${DATA}"
fi

python -m afan.cli.train_classify --mode base \
  --save_dir ${OUT:-./outputs/cifar_base} --seed 3 ${EXTRA}
