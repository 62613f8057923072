"""A/B the fused Pallas upsample+CE kernel vs the XLA path on the real
A-FAN seg step (city-final flags) at both tracked geometries.

Interleaved same-process windows (chip variance is large run-to-run;
see ROADMAP timing methodology). Prints ms/step, imgs/s, and the loss
of each variant (fused computes interp+CE in f32, so losses may differ
in the last bf16 digits from the XLA bf16 path).

Run: python scripts/bench_seg_fused.py   (~15 min incl. compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.deeplab.modeling import build_model
from afan.train.loop import TrainState
from afan.train.segment_loop import (SegAfanConfig, make_afan_seg_step,
                                     segmentation_tx)


def build(crop, fused):
    batch, ncls = 4, 19
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, crop, crop, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, crop, crop)),
                         jnp.int32)
    key = jax.random.PRNGKey(0)
    tx = segmentation_tx(lambda c: 0.1)
    model = build_model("deeplabv3plus_resnet50", ncls, 16, jnp.bfloat16)
    variables = model.init({"params": key, "dropout": key}, images[:1],
                           False)
    state = TrainState.create(variables, tx)
    step = make_afan_seg_step(model, tx, SegAfanConfig(
        mix_mask=(0, 0, 1), mix_sd=True, fused_ce=fused))
    compiled = step.lower(state, images, labels, key).compile()
    holder = {"s": state, "i": 0}

    def one():
        holder["i"] += 1
        holder["s"], holder["m"] = compiled(
            holder["s"], images, labels,
            jax.random.fold_in(key, holder["i"]))

    one(); one(); _ = float(holder["m"]["loss"])
    return one, holder


def main():
    for crop, iters in [(768, 8), (512, 16)]:
        runs = {}
        for f in (True, False):
            # a Mosaic rejection of the fused variant must not kill the
            # XLA measurement — that failure is itself the finding
            try:
                runs[f] = build(crop, f)
            except Exception as e:
                print(f"crop {crop}: variant fused={f} FAILED to "
                      f"compile/run: {type(e).__name__}: {e}"[:400],
                      flush=True)
        best = {f: float("inf") for f in runs}
        loss = {}
        for _ in range(4):
            for f in runs:
                one, holder = runs[f]
                t0 = time.perf_counter()
                for _ in range(iters):
                    one()
                loss[f] = float(holder["m"]["loss"])
                best[f] = min(best[f],
                              (time.perf_counter() - t0) / iters)
        for f in runs:
            print(f"crop {crop}: {'fused' if f else 'xla  '} "
                  f"{best[f]*1e3:6.1f} ms ({4/best[f]:5.2f} imgs/s) "
                  f"loss={loss[f]:.4f}", flush=True)


if __name__ == "__main__":
    main()
