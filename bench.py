"""Benchmark: the BASELINE.md tracked A-FAN workloads on one TPU chip.

Emits one JSON line per metric (driver protocol), flagship LAST:

  1. afan_det_train_step_ms     — flagship A-FAN detection step
     (`Detection/train_aug_final.py` geometry: b2, 600x1000 -> 608x1008
     canvas, R50, SE tap 2 + SD roi, spectrum 5) — BASELINE.md config 4.
  2. afan_seg_train_imgs_per_sec_per_chip — A-FAN segmentation step
     (`Segmentation/main_aug_final.py`: DeepLabv3+ R50, b4, 512 crop,
     SE tap 2 + SD concat, spectrum 3) — BASELINE.md config 5.
  3. alfa_train_mfu_pct         — model FLOPs utilization of the ALFA step
     vs the v5e bf16 peak (197 TFLOP/s), from XLA's own cost analysis of
     the compiled program (fallback: documented analytic estimate).
  4. alfa_train_imgs_per_sec_per_chip — flagship ALFA classification step
     (`Classification/main_perturb.py` defaults: batch 128, tap 13,
     5-step feature PGD, gamma 1.5/255) — BASELINE.md config 2.

`vs_baseline` denominators: the reference publishes no throughput
(BASELINE.md), so each is a documented back-of-envelope estimate of the
reference PyTorch code on one A100 (see the *_A100_EST constants). The MFU
line is the falsifiable cross-check: its vs_baseline divides our MFU by
the reference's implied A100 MFU under the SAME flops model, so the
hardware-normalized comparison does not depend on the absolute estimates.
"""
import json
import time

# Documented reference-on-A100 estimates (see module docstring):
# ALFA: plain ResNet-56/CIFAR torch training sustains ~5000 imgs/sec on
# A100; the ALFA step is ~3.3x the work (1 clean fwd+bwd, 5 tail fwd+bwd,
# head fwd, adv tail fwd+bwd) and serializes 8+ kernel launches per batch.
ALFA_A100_EST_IMGS_PER_SEC = 1500.0
# Detection: plain Faster R-CNN R50 600x1000 torch trains at ~125 ms/step
# (b2) on A100; the A-FAN step is ~19 forward-equivalents vs ~4 for the
# plain step and runs 11+ sequential model.forward dispatches.
DET_A100_EST_MS_PER_STEP = 650.0
# Segmentation: plain DeepLabv3+ R50 513-crop torch trains at ~60 imgs/s
# on A100; the A-FAN step is ~8-9 forward-equivalents vs ~3.
SEG_A100_EST_IMGS_PER_SEC = 20.0

V5E_BF16_PEAK_FLOPS = 197e12
A100_BF16_PEAK_FLOPS = 312e12


def _time_steps(run_one, sync, iters, windows=3):
    """Best-of-N-windows wall time per step. NOTE: sync by materializing a
    metric value — on this TPU runtime block_until_ready does not reliably
    await the dispatched chain (verified empirically); fetching the final
    step's loss transitively forces all steps."""
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            run_one()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit, "vs_baseline": round(vs_baseline, 3)}),
          flush=True)


def bench_detection():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from afan.models.frcnn import FRCNNConfig, FasterRCNN
    from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                        make_afan_det_step)
    from afan.train.loop import TrainState

    batch, H, W = 2, 608, 1008  # VOC 600x1000 rounded to the pad multiple
    model = FasterRCNN(cfg=FRCNNConfig(backbone="resnet50", num_classes=21),
                       dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, H, W, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[[100.0, 100, 400, 300],
                                   [50.0, 200, 250, 500]]]), (batch, 1, 1))
    labels = jnp.ones((batch, 2), jnp.int32)
    valid = jnp.ones((batch, 2), bool)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, images[:1], boxes[:1],
                           labels[:1], valid[:1], jax.random.PRNGKey(1),
                           method=model.losses)
    tx = detection_tx(lambda c: 0.001)
    state = TrainState.create(variables, tx)
    step = make_afan_det_step(model, tx, DetAfanConfig())  # flagship cfg

    holder = {"state": state}

    def run_one():
        holder["i"] = holder.get("i", 0) + 1
        holder["state"], holder["m"] = step(
            holder["state"], images, boxes, labels, valid,
            jax.random.fold_in(key, holder["i"]))

    def sync():
        _ = float(holder["m"]["loss"])

    run_one(); run_one(); sync()  # compile + warmup
    dt = _time_steps(run_one, sync, iters=10)
    _emit("afan_det_train_step_ms", dt * 1e3, "ms/step",
          DET_A100_EST_MS_PER_STEP / (dt * 1e3))


def bench_segmentation():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from afan.models.deeplab.modeling import build_model
    from afan.train.loop import TrainState
    from afan.train.segment_loop import (SegAfanConfig, make_afan_seg_step,
                                         segmentation_tx)

    batch, crop, ncls = 4, 512, 19  # cityscapes geometry, BASELINE config 5
    model = build_model("deeplabv3plus_resnet50", ncls, 16, jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, crop, crop, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, crop, crop)), jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           images[:1], False)
    tx = segmentation_tx(lambda c: 0.1)
    state = TrainState.create(variables, tx)
    step = make_afan_seg_step(model, tx, SegAfanConfig())

    holder = {"state": state}

    def run_one():
        holder["i"] = holder.get("i", 0) + 1
        holder["state"], holder["m"] = step(
            holder["state"], images, labels, jax.random.fold_in(
                key, holder["i"]))

    def sync():
        _ = float(holder["m"]["loss"])

    run_one(); run_one(); sync()
    dt = _time_steps(run_one, sync, iters=20)
    _emit("afan_seg_train_imgs_per_sec_per_chip", batch / dt, "imgs/sec",
          (batch / dt) / SEG_A100_EST_IMGS_PER_SEC)


def bench_alfa():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from afan.models.resnet_s import resnet56
    from afan.train.loop import AlfaConfig, TrainState, make_alfa_step
    from afan.train.optim import multistep_warmup_schedule, sgd

    batch = 128
    # bf16 compute: the TPU MXU's native matmul/conv dtype.
    model = resnet56(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 32, 32, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 10, batch))
    variables = model.init(rng, x[:2], 0, None, False)

    schedule = multistep_warmup_schedule(0.1, [50 * 351, 150 * 351], 0.1,
                                         warmup_steps=351)
    tx = sgd(schedule, momentum=0.9, weight_decay=5e-4)
    state = TrainState.create(variables, tx)
    cfg = AlfaConfig()  # main_perturb.py defaults: tap 13, 5 steps, 1.5/255
    step = make_alfa_step(model, tx, cfg)

    # FLOPs of one compiled step from XLA's cost analysis (for MFU);
    # falls back to the analytic estimate if the backend can't report it.
    step_flops = None
    try:
        cost = step.lower(state, x, y, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost["flops"])
    except Exception:
        # analytic: ResNet-56 fwd ~0.13 GFLOP/img; ALFA step ~14
        # forward-equivalents (1 head fwd + 5x tail fwd/bwd + clean & adv
        # fwd/bwd; bwd ~ 2x fwd).
        step_flops = 14 * 0.13e9 * batch

    holder = {"state": state}

    def run_one():
        holder["i"] = holder.get("i", 0) + 1
        holder["state"], holder["m"] = step(
            holder["state"], x, y, jax.random.fold_in(rng, holder["i"]))

    def sync():
        _ = float(holder["m"]["loss"])

    for _ in range(3):
        run_one()
    sync()
    dt = _time_steps(run_one, sync, iters=50)
    imgs_per_sec = batch / dt

    mfu = step_flops / dt / V5E_BF16_PEAK_FLOPS * 100
    # the reference's implied MFU on A100 under the SAME flops model
    ref_mfu = (step_flops / batch) * ALFA_A100_EST_IMGS_PER_SEC \
        / A100_BF16_PEAK_FLOPS * 100
    _emit("alfa_train_mfu_pct", mfu, "% of v5e bf16 peak", mfu / ref_mfu)
    _emit("alfa_train_imgs_per_sec_per_chip", imgs_per_sec, "imgs/sec",
          imgs_per_sec / ALFA_A100_EST_IMGS_PER_SEC)


def main():
    bench_detection()
    bench_segmentation()
    bench_alfa()  # flagship metric printed last


if __name__ == "__main__":
    main()
