#!/usr/bin/env bash
# CIFAR-10 test-set inference from a checkpoint
# (reference: Classification/cmd/run_test.sh — evaluates the pretrained
#  94.82%-SA A-FAN model; torch .pth checkpoints are converted via
#  afan.interop.torch_ckpt).
. "$(dirname "$0")/_common.sh"
CKPT=${CKPT:?"set CKPT=<checkpoint path (.pt native or torch .pth)>"}
if [ -n "${SMOKE}" ]; then EXTRA="--data /nonexistent"; else EXTRA="--data ${DATA}"; fi

python -m afan.cli.infer_classify --pretrained "${CKPT}" ${EXTRA}
