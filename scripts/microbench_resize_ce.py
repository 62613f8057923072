"""Isolate the 768-crop resize+CE sink: which piece costs 32-40 ms per
fwd+bwd pair (ablate_seg_768_tails.py measurement)?

Pieces at the exact step shapes (b4, os4 logits 192x192x19 bf16, labels
768x768 int32):

  A. bilinear resize fwd only
  B. bilinear resize fwd+bwd (grad wrt low-res logits)
  C. CE fwd+bwd on an ALREADY-materialized 768x768x19 tensor
  D. resize+CE fwd+bwd (the real composite)
  E. resize+CE fwd+bwd with one-hot-matmul NLL instead of
     take_along_axis (gather-free formulation)
  F. composite with the resize expressed as two explicit einsums
     (separable bilinear weight matrices, bf16)

Timing: chained lax.scan over the measured body with a carried
differentiated value and a quadratic consumer (CLAUDE.md microbench
traps: linear scan bodies get hoisted; block_until_ready does not sync
— fetch the value). RTT ~35 ms amortized over 100 iterations.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.train.segment_loop import seg_cross_entropy

B, H, W, C, S = 4, 768, 768, 19, 4
h, w = H // S, W // S


def resize_hi(lg):
    return jax.image.resize(lg, (B, H, W, C), "linear")


def bilinear_matrix(n_out, n_in, scale):
    """align_corners=False bilinear weights (rows: output pixels)."""
    out = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        for tap, wt in ((lo, 1 - frac), (lo + 1, frac)):
            t = min(max(tap, 0), n_in - 1)
            out[i, t] += wt
    return out


RH = jnp.asarray(bilinear_matrix(H, h, S), jnp.bfloat16)
RW = jnp.asarray(bilinear_matrix(W, w, S), jnp.bfloat16)


def resize_einsum(lg):
    t = jnp.einsum("Hp,bpqc->bHqc", RH, lg)
    return jnp.einsum("Wq,bHqc->bHWc", RW, t)


def ce_onehot(logits, labels):
    mask = labels != 255
    safe = jnp.where(mask, labels, 0)
    oh = jax.nn.one_hot(safe, logits.shape[-1], dtype=logits.dtype)
    nll = (jax.scipy.special.logsumexp(logits, axis=-1)
           - jnp.sum(logits * oh, axis=-1))
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1)


def bench(name, body, iters=100):
    """body: lg (low-res logits) -> scalar-ish carried value."""

    def scan_fn(carry, _):
        val = body(carry)
        # quadratic feedback keeps the body un-hoistable and chained
        return carry * (0.999 + 1e-12 * val), None

    lg0 = jnp.asarray(np.random.RandomState(0).rand(B, h, w, C) * 2 - 1,
                      jnp.bfloat16)

    @jax.jit
    def run(lg):
        out, _ = jax.lax.scan(scan_fn, lg, None, length=iters)
        return jnp.sum(out)

    compiled = run.lower(lg0).compile()
    _ = float(compiled(lg0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(compiled(lg0))
        dt = (time.perf_counter() - t0 - 0.035) / iters
        best = min(best, dt)
    print(f"{name:34s}: {best * 1e3:7.2f} ms/iter", flush=True)


def main():
    labels = jnp.asarray(
        np.random.RandomState(1).randint(0, C, (B, H, W)), jnp.int32)
    hi0 = jnp.asarray(np.random.RandomState(2).rand(B, H, W, C) * 2 - 1,
                      jnp.bfloat16)

    bench("A resize fwd", lambda lg: jnp.sum(resize_hi(lg) ** 2))
    bench("B resize fwd+bwd",
          lambda lg: jnp.sum(jax.grad(
              lambda x: jnp.sum(resize_hi(x) ** 2))(lg) ** 2))
    # C: CE on materialized hi-res (lg enters via a cheap add so the scan
    # carry stays low-res; the hi-res tensor is produced by ONE broadcast
    # add, isolating the CE cost)
    bench("C CE-on-materialized fwd+bwd",
          lambda lg: jnp.sum(jax.grad(
              lambda x: seg_cross_entropy(hi0 * (1 + 0 * jnp.mean(x))
                                          + jnp.mean(x), labels))(lg) ** 2))
    bench("D resize+CE fwd+bwd",
          lambda lg: jnp.sum(jax.grad(
              lambda x: seg_cross_entropy(resize_hi(x), labels))(lg) ** 2))
    bench("E resize+CE(onehot) fwd+bwd",
          lambda lg: jnp.sum(jax.grad(
              lambda x: ce_onehot(resize_hi(x), labels))(lg) ** 2))
    bench("F einsum-resize+CE fwd+bwd",
          lambda lg: jnp.sum(jax.grad(
              lambda x: seg_cross_entropy(resize_einsum(x), labels))(lg)
              ** 2))
    bench("G einsum-resize+CE(onehot)",
          lambda lg: jnp.sum(jax.grad(
              lambda x: ce_onehot(resize_einsum(x), labels))(lg) ** 2))

    # H/I: the composed-step context — the spectrum tails vmap the
    # resize+CE over S=2 points (ablate_seg_768_tails.py bisect: that
    # site costs ~105 ms/pair vs 0.5 ms isolated). H reproduces the
    # vmap; I flattens the spectrum axis into the batch axis first.
    def d_loss(x):
        return seg_cross_entropy(resize_hi(x), labels)

    def body_vmap(lg):
        return jnp.sum(jax.grad(
            lambda x: jnp.sum(jax.vmap(d_loss)(
                jnp.stack([x, x * 0.5]))))(lg) ** 2)

    bench("H vmap(2) resize+CE fwd+bwd", body_vmap)

    labels2 = jnp.concatenate([labels, labels], 0)

    def body_flat(lg):
        def loss(x):
            flat = jnp.concatenate([x, x * 0.5], 0)
            hi = jax.image.resize(flat, (2 * B, H, W, C), "linear")
            return seg_cross_entropy(hi, labels2)
        return jnp.sum(jax.grad(loss)(lg) ** 2)

    bench("I flat(2b) resize+CE fwd+bwd", body_flat)

    # J/K: params-backward context (the step's remaining ~30 ms/site
    # penalty at the non-vmapped clean/SD sites): logits produced by a
    # 1x1 conv whose WEIGHTS carry the grad, CE at high (J) vs low (K)
    # resolution. If J-K reproduces ~30 ms the penalty is in the
    # conv-backward-through-resize composition, not the resize op.
    x0 = jnp.asarray(np.random.RandomState(3).rand(B, h, w, 256) * 2 - 1,
                     jnp.bfloat16)
    labels_lo = labels[:, ::S, ::S]

    def bench_w(name, hi_res):
        def scan_fn(wk, _):
            def loss(wkk):
                lg = jax.lax.conv_general_dilated(
                    x0, wkk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if hi_res:
                    return seg_cross_entropy(resize_hi(lg), labels)
                return seg_cross_entropy(lg, labels_lo)
            g = jax.grad(loss)(wk)
            return wk - 1e-3 * g, None

        w0 = jnp.asarray(
            np.random.RandomState(4).rand(1, 1, 256, C) * 0.1,
            jnp.bfloat16)

        @jax.jit
        def run(wk):
            out, _ = jax.lax.scan(scan_fn, wk, None, length=100)
            return jnp.sum(out)

        compiled = run.lower(w0).compile()
        _ = float(compiled(w0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(compiled(w0))
            best = min(best, (time.perf_counter() - t0 - 0.035) / 100)
        print(f"{name:34s}: {best * 1e3:7.2f} ms/iter", flush=True)

    bench_w("J conv+resize+CE wgrad", True)
    bench_w("K conv+CE(lowres) wgrad", False)

    # L/M/N: site MULTIPLICITY — the real step carries ~5 sibling
    # resize+CE sites in ONE program, and the open ROADMAP question is
    # why each costs ~30 ms composed vs 0.5 ms isolated. Each site here
    # gets a DISTINCT nonlinear input (tanh(x+k); a linear variant would
    # let XLA commute the scale through the bilinear resize and CSE the
    # sites). If per-site cost grows with N, the anomaly is scheduling
    # between sibling resize+CE instances themselves.
    def body_multi(n):
        def body(lg):
            def loss(x):
                return sum(
                    seg_cross_entropy(resize_hi(jnp.tanh(x + k)), labels)
                    for k in range(n))
            return jnp.sum(jax.grad(loss)(lg) ** 2)
        return body

    bench("L 1-site tanh resize+CE", body_multi(1))
    bench("M 2-site tanh resize+CE", body_multi(2))
    bench("N 4-site tanh resize+CE", body_multi(4))


if __name__ == "__main__":
    main()
