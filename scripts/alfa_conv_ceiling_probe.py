"""Close the ALFA MFU ceiling chain with a measurement (VERDICT r4 #3).

The round-4 batch curve put the ALFA step's envelope at ~18% of bf16
peak vs a ~29% analytic output-lane ceiling (scripts/alfa_mxu_ceiling.py)
and attributed the gap to "XLA's conv-kernel efficiency at 16/32/64-
channel CIFAR shapes" BY ANALOGY (base-vs-ALFA envelope parity). This
script pins that link with scan-chained isolated conv fwd+bwd at the
exact ResNet-56s shapes (`Classification/main_perturb.py:173-197`
workload; `resnet_s` stages): if isolated convs also plateau ~18%, the
envelope claim is measured, not analogized; if they exceed it
materially, the step has a findable sink.

Methodology = scripts/microbench_seg_convs.py (the trustworthy one):
each case is a lax.scan of K iterations whose carry is the
DIFFERENTIATED input (x - 1e-6 * dL/dx, L quadratic), so the chain is
data-dependent, XLA cannot hoist the conv, and each iteration costs
fwd + dgrad = 2 conv-equivalents. One value fetch per window; RTT
amortized over K=300.

Also prints a FLOP-weighted harmonic-mean "predicted step ceiling" per
batch: ResNet-56s spends its conv FLOPs ~equally across the three
stages (channel doubling offsets spatial halving), so the mix of the
three measured efficiencies predicts the best a step built from these
convs can do — directly comparable to the measured 18.1% b512 envelope.

Run (real TPU): python scripts/alfa_conv_ceiling_probe.py  (~10 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK = 197e12
K = 300


def bench_conv(label, B, H, W, cin, cout, kernel=3, stride=1,
               dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, cin), dtype)
    w0 = jnp.asarray(rng.rand(kernel, kernel, cin, cout) * 0.01, dtype)
    pad = kernel // 2

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Quadratic loss + differentiated carry (CLAUDE.md scan-hoist trap);
    # single-arg grad (a both-args tuple carry hung the remote compile).
    def loss(x):
        y = conv(x, w0)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    @jax.jit
    def run(x):
        def body(x, _):
            g = jax.grad(loss)(x)
            return x - 1e-6 * g.astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x

    x = run(x)
    _ = float(x[0, 0, 0, 0])  # warmup + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = run(x)
        _ = float(x[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / K)
    ho, wo = H // stride, W // stride
    fwd = 2 * B * ho * wo * cin * cout * kernel * kernel
    tfs = 2 * fwd / best / 1e12  # fwd + dgrad
    eff = tfs / V5E_PEAK * 1e12 * 100
    print(f"{label:36s}: {best*1e3:7.3f} ms  {tfs:6.1f} TF/s "
          f"({eff:4.1f}% peak)", flush=True)
    return eff


def main():
    for B in (128, 256, 512):
        print(f"== b{B} ResNet-56s CIFAR shapes, bf16, fwd+dgrad ==",
              flush=True)
        effs = []
        effs.append(bench_conv(f"stage1 3x3 16->16  @32^2 b{B}",
                               B, 32, 32, 16, 16))
        effs.append(bench_conv(f"stage2 3x3 32->32  @16^2 b{B}",
                               B, 16, 16, 32, 32))
        effs.append(bench_conv(f"stage3 3x3 64->64  @8^2  b{B}",
                               B, 8, 8, 64, 64))
        # equal per-stage FLOPs -> harmonic mean = FLOP-weighted mix
        hmean = 3.0 / sum(1.0 / e for e in effs)
        print(f"  predicted step ceiling (FLOP-weighted harmonic mean "
              f"of stages): {hmean:.1f}% of peak", flush=True)
        # the non-residual shapes (small FLOP share; for completeness)
        bench_conv(f"stem   3x3 3->16   @32^2 b{B}", B, 32, 32, 3, 16)
        bench_conv(f"down   3x3 16->32 s2 @32^2 b{B}", B, 32, 32, 16, 32,
                   stride=2)
        bench_conv(f"down   3x3 32->64 s2 @16^2 b{B}", B, 16, 16, 32, 64,
                   stride=2)


if __name__ == "__main__":
    main()
