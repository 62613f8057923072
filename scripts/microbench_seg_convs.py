"""Isolated conv fwd+bwd microbench at DeepLab-R50@512-os16 shapes.

Locates the seg step's MXU-efficiency sink (profile_seg.py shows a
uniform ~33 TF/s across ALL step ablations, so the loss is structural in
the conv pipeline — candidate culprits: dilated layer4, ASPP's big
dilation rates, the stem, or nothing-in-particular/layout).

Each case: lax.scan of K weight-update steps (w -= 1e-6 * dL/dw with
L = mean(conv(x, w))) so the chain is data-dependent; one value fetch at
the end. Analytic FLOPs: fwd = 2*B*H*W*Cin*Cout*Kh*Kw (at the OUTPUT
spatial size, stride-adjusted); fwd+bwd counted as 3x fwd (dgrad +
wgrad each ~1x fwd).

Run: python scripts/microbench_seg_convs.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK = 197e12
B = 4
K = 300   # amortize the ~35 ms tunnel RTT to ~0.12 ms/iter


def bench_conv(label, H, W, cin, cout, kernel=3, dilation=1, stride=1,
               dtype=jnp.bfloat16, groups=1):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, cin), dtype)
    w0 = jnp.asarray(rng.rand(kernel, kernel, cin // groups, cout) * 0.01,
                     dtype)
    pad = (kernel // 2) * dilation

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)

    # NB: the loss must be NONLINEAR in the conv output and the carried
    # value must evolve, else the conv is loop-invariant and XLA hoists
    # it out of the scan (first version of this script measured exactly
    # that: >100% "peak"). Carrying x and differentiating w.r.t. x gives
    # fwd + dgrad = 2 conv-equivalents per iteration. (A both-args grad
    # with a tuple carry reproducibly hung the remote axon compile.)
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
    fwd = 2 * B * ho * wo * (cin // groups) * cout * kernel * kernel
    tfs = 2 * fwd / best / 1e12  # fwd + dgrad
    print(f"{label:38s}: {best*1e3:7.3f} ms  {tfs:6.1f} TF/s "
          f"({tfs/V5E_PEAK*1e12*100:4.1f}% peak)", flush=True)


def main():
    print(f"== b{B} R50@512-os16 shapes, bf16, fwd+bwd ==", flush=True)
    # backbone 3x3s (the bottleneck middle convs)
    bench_conv("layer1 3x3 64->64   @128^2", 128, 128, 64, 64)
    bench_conv("layer2 3x3 128->128 @64^2", 64, 64, 128, 128)
    bench_conv("layer3 3x3 256->256 @32^2", 32, 32, 256, 256)
    bench_conv("layer4 3x3 512->512 @32^2 d1", 32, 32, 512, 512)
    bench_conv("layer4 3x3 512->512 @32^2 d2", 32, 32, 512, 512,
               dilation=2)
    bench_conv("layer4 3x3 512->512 @48^2 d2", 48, 48, 512, 512,
               dilation=2)
    # bottleneck 1x1s (half the backbone FLOPs)
    bench_conv("layer4 1x1 2048->512 @32^2", 32, 32, 2048, 512, kernel=1)
    bench_conv("layer4 1x1 512->2048 @32^2", 32, 32, 512, 2048, kernel=1)
    bench_conv("layer1 1x1 256->64  @128^2", 128, 128, 256, 64, kernel=1)
    # ASPP dilated 3x3s at output_stride-16 spatial
    for r in (6, 12, 18):
        bench_conv(f"aspp 3x3 1024->256 @32^2 d{r}", 32, 32, 1024, 256,
                   dilation=r)
    bench_conv("aspp 3x3 1024->256 @48^2 d18", 48, 48, 1024, 256,
               dilation=18)
    # decoder classifier conv at low_level resolution
    bench_conv("decoder 3x3 304->256 @128^2", 128, 128, 304, 256)
    # stem
    bench_conv("stem 7x7 3->64 s2 @512^2", 512, 512, 3, 64, kernel=7,
               stride=2)


if __name__ == "__main__":
    main()
