"""Round 2 microbench: decompose the seg sinks found by round 1
(microbench_seg_convs.py: stem 7x7 at 1% peak, layer1-3 at 12-27%,
dilated convs healthy at 39-63%).

Questions answered here:
  * stem: fwd-only vs fwd+wgrad cost (the real model never needs the
    stem's dgrad — images have no gradient);
  * layer1 3x3: fwd-only (is the 12% a backward artifact?);
  * bilinear upsample 128->512 + masked CE at full res (per-tail cost in
    every A-FAN forward);
  * train-mode BN at layer1 geometry (batch reductions);
  * stem space-to-depth rewrite candidate: the same 7x7 s2 conv computed
    as a 4x4 conv on 2x2-space-to-depth input (exact when the kernel is
    zero-padded to 8x8 and rearranged) — is it faster?

Run: python scripts/microbench_seg_convs2.py
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
    msg = f"{label:42s}: {best*1e3:7.3f} ms"
    if flops:
        msg += f"  {flops/best/1e12:6.1f} TF/s"
    print(msg, flush=True)
    return best


def fwd_only(conv, x0, label, flops):
    """Chained forward-only: x' = x - tiny*broadcast(mean(conv(x)))."""
    @jax.jit
    def run(x):
        def body(x, _):
            y = conv(x)
            return x - 1e-9 * jnp.mean(y.astype(jnp.float32)).astype(
                x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x
    return chain_time(run, x0, label, flops)


def wgrad_only(conv_w, w0, label, flops):
    """Chained fwd+wgrad: w' = w - lr*dL/dw, L quadratic (depends on w)."""
    def loss(w):
        y = conv_w(w)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    @jax.jit
    def run(w):
        def body(w, _):
            g = jax.grad(loss)(w)
            return w - 1e-9 * g.astype(w.dtype), ()
        w, _ = jax.lax.scan(body, w, None, length=K)
        return w
    return chain_time(run, w0, label, flops)


def main():
    rng = np.random.RandomState(0)
    print(f"== b{B}, bf16 ==", flush=True)

    # ---- stem 7x7 s2 @512^2 ----
    x512 = jnp.asarray(rng.rand(B, 512, 512, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.rand(7, 7, 3, 64) * 0.01, jnp.bfloat16)
    stem_flops = 2 * B * 256 * 256 * 3 * 64 * 49

    def stem(x, w=None):
        return jax.lax.conv_general_dilated(
            x, w7 if w is None else w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fwd_only(stem, x512, "stem 7x7 s2 @512^2 fwd-only", stem_flops)
    wgrad_only(lambda w: stem(x512, w), w7,
               "stem 7x7 s2 @512^2 fwd+wgrad", 2 * stem_flops)

    # ---- stem as space-to-depth 4x4 conv (exact rewrite candidate) ----
    # x (B,512,512,3) -> (B,259,259,12); kernel zero-padded 7x7->8x8 and
    # rearranged to (4,4,12,64); VALID 4x4 conv then yields exactly the
    # stride-2 7x7 pad-3 output (256^2). Derivation: out(i) =
    # sum_k xp[2i+k] w[k] with xp = pad3(x); writing k = 2a+p maps onto a
    # 4-tap conv over the 2-phase space-to-depth channels.
    def s2d(x):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        Bn, H, W, C = xp.shape
        xp = xp.reshape(Bn, H // 2, 2, W // 2, 2, C)
        return xp.transpose(0, 1, 3, 2, 4, 5).reshape(
            Bn, H // 2, W // 2, 4 * C)  # 518/2 = 259 taps -> 256 valid

    w8 = jnp.pad(w7, ((0, 1), (0, 0), (0, 0), (0, 0)))  # 8x7x3x64 pre-pad
    w8 = jnp.pad(w8, ((0, 0), (0, 1), (0, 0), (0, 0)))  # 8x8x3x64
    # (8,8,3,64) -> (4,2,4,2,3,64) -> (4,4,2,2,3,64) -> (4,4,12,64)
    w44 = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 12, 64)

    def stem_s2d(x):
        xs = s2d(x)
        return jax.lax.conv_general_dilated(
            xs, w44, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # correctness spot check (tolerant: bf16)
    ref = stem(x512[:1])
    got = stem_s2d(x512[:1])
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"s2d exactness: shapes {ref.shape} vs {got.shape}, "
          f"max|diff| = {err:.4f}", flush=True)
    fwd_only(stem_s2d, x512, "stem-s2d 4x4 @256^2x12 fwd-only", stem_flops)

    # ---- layer1 3x3 fwd-only ----
    x128 = jnp.asarray(rng.rand(B, 128, 128, 64), jnp.bfloat16)
    w3 = jnp.asarray(rng.rand(3, 3, 64, 64) * 0.01, jnp.bfloat16)
    l1_flops = 2 * B * 128 * 128 * 64 * 64 * 9

    def l1(x):
        return jax.lax.conv_general_dilated(
            x, w3, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fwd_only(l1, x128, "layer1 3x3 64ch @128^2 fwd-only", l1_flops)

    # ---- bilinear upsample 128->512 + masked CE (per-tail epilogue) ----
    xl = jnp.asarray(rng.rand(B, 128, 128, 19), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 19, (B, 512, 512)), jnp.int32)

    def tail_epilogue(x):
        up = jax.image.resize(x.astype(jnp.float32),
                              (B, 512, 512, 19), "bilinear")
        logp = jax.nn.log_softmax(up, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def run_ep(x):
        def body(x, _):
            g = jax.grad(tail_epilogue)(x)
            return x - 1e-6 * g.astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x
    chain_time(run_ep, xl, "upsample128->512 + CE fwd+bwd")

    # ---- train-BN at layer1 geometry ----
    x256 = jnp.asarray(rng.rand(B, 128, 128, 256), jnp.bfloat16)

    def bn_train(x):
        m = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        v = jnp.mean(jnp.square(x - m), axis=(0, 1, 2), keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-5)

    @jax.jit
    def run_bn(x):
        def body(x, _):
            y = bn_train(x)
            return x - 1e-9 * jnp.mean(y.astype(jnp.float32)).astype(
                x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x
    chain_time(run_bn, x256, "train-BN 256ch @128^2 fwd-only")


if __name__ == "__main__":
    main()
