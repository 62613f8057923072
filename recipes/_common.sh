# shared recipe plumbing: run from the repo root; SMOKE=1 shrinks any
# recipe to a synthetic-data end-to-end run (tiny geometry, 2 steps) so
# every recipe can be exercised without datasets or long walltime.
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-./data}

# SMOKE_TINY=1: even smaller than SMOKE — shapes sized for a CPU-only CI
# executor (the test suite EXECUTES one recipe per stack end-to-end:
# train -> checkpoint -> eval). Implies SMOKE.
if [ -n "${SMOKE_TINY}" ]; then SMOKE=1; fi

det_smoke_flags() {
  if [ -n "${SMOKE_TINY}" ]; then
    echo "--data_dir /nonexistent --backbone resnet18 --batch_size 2 \
          --image_min_side 64 --image_max_side 96 \
          --anchor_sizes [16,32] --rpn_pre_nms_top_n 256 \
          --rpn_post_nms_top_n 64 --num_steps_to_finish 2 \
          --num_steps_to_snapshot 2 --num_steps_to_display 1"
  elif [ -n "${SMOKE}" ]; then
    echo "--data_dir /nonexistent --backbone resnet18 --batch_size 2 \
          --image_min_side 128 --image_max_side 192 \
          --anchor_sizes [32,64] --rpn_pre_nms_top_n 512 \
          --rpn_post_nms_top_n 128 --num_steps_to_finish 2 \
          --num_steps_to_snapshot 2 --num_steps_to_display 1"
  else
    echo "--data_dir ${DATA}"
  fi
}

seg_smoke_flags() {
  if [ -n "${SMOKE_TINY}" ]; then
    echo "--dataset synthetic --model deeplabv3plus_mobilenet \
          --crop_size 64 --batch_size 2 --limit_itrs 2 --val_interval 2"
  elif [ -n "${SMOKE}" ]; then
    echo "--dataset synthetic --crop_size 96 --batch_size 2 \
          --limit_itrs 2 --val_interval 2"
  else
    echo "--data_root ${DATA}"
  fi
}
