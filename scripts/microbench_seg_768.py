"""Round 3 microbench: why does the seg step's efficiency DROP at 768
crop (22.5 TF/s) vs 512 (29.4 TF/s), when isolated convs get FASTER at
larger spatial (microbench_seg_convs.py: 48^2 beats 32^2)?

Compares the same ops at 512-geometry vs 768-geometry spatial sizes.

Run: python scripts/microbench_seg_768.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 4
K = 300


def chain_time(run, x0, label, flops=None):
    x = run(x0)
    _ = float(jnp.ravel(x)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = run(x)
        _ = float(jnp.ravel(x)[0])
        best = min(best, (time.perf_counter() - t0) / K)
    msg = f"{label:44s}: {best*1e3:7.3f} ms"
    if flops:
        msg += f"  {flops/best/1e12:6.1f} TF/s"
    print(msg, flush=True)
    return best


def conv_dgrad(H, cin, cout, label, kernel=3, dilation=1):
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, H, H, cin), jnp.bfloat16)
    w = jnp.asarray(rng.rand(kernel, kernel, cin, cout) * 0.01,
                    jnp.bfloat16)
    pad = (kernel // 2) * dilation

    def loss(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    @jax.jit
    def run(x):
        def body(x, _):
            g = jax.grad(loss)(x)
            return x - 1e-6 * g.astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x

    flops = 2 * 2 * B * H * H * cin * cout * kernel * kernel
    chain_time(run, x0, label, flops)


def epilogue(low, full, label):
    """bilinear upsample low->full + masked CE fwd+bwd at 19 classes."""
    rng = np.random.RandomState(0)
    xl = jnp.asarray(rng.rand(B, low, low, 19), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 19, (B, full, full)), jnp.int32)

    def loss(x):
        up = jax.image.resize(x.astype(jnp.float32),
                              (B, full, full, 19), "bilinear")
        logp = jax.nn.log_softmax(up, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def run(x):
        def body(x, _):
            g = jax.grad(loss)(x)
            return x - 1e-6 * g.astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x

    chain_time(run, xl, label)


def main():
    print(f"== b{B}, bf16, fwd+dgrad (2x fwd flops) ==", flush=True)
    # layer1 block conv at the two geometries
    conv_dgrad(128, 64, 64, "layer1 3x3 64ch @128^2 (512 crop)")
    conv_dgrad(192, 64, 64, "layer1 3x3 64ch @192^2 (768 crop)")
    conv_dgrad(128, 256, 64, "layer1 1x1 256->64 @128^2", kernel=1)
    conv_dgrad(192, 256, 64, "layer1 1x1 256->64 @192^2", kernel=1)
    # layer2/3/4 at 768 geometry
    conv_dgrad(96, 128, 128, "layer2 3x3 128ch @96^2 (768)")
    conv_dgrad(48, 256, 256, "layer3 3x3 256ch @48^2 (768)")
    conv_dgrad(48, 512, 512, "layer4 3x3 512ch @48^2 d2 (768)",
               dilation=2)
    # decoder conv at the two low-level sizes
    conv_dgrad(128, 304, 256, "decoder 3x3 304->256 @128^2 (512)")
    conv_dgrad(192, 304, 256, "decoder 3x3 304->256 @192^2 (768)")
    # upsample+CE epilogue at the two geometries
    epilogue(128, 512, "upsample+CE 128->512 (512 crop)")
    epilogue(192, 768, "upsample+CE 192->768 (768 crop)")


if __name__ == "__main__":
    main()
