"""Mosaic compile + parity smoke of the fused resize+CE kernel across
every geometry a stock recipe can feed it (ADVICE r3: the TPU lowering
had only been exercised at 512/768 — VOC's 513-crop / 21-class odd
shapes could be rejected at compile time).

For each geometry: forward sums + grad through the kernel on the REAL
chip, compared against the XLA resize + _per_entry_loss_sums reference
path. One JSON line per case.

Run (real TPU): python scripts/smoke_fused_ce_tpu.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.deeplab.heads import resize_bilinear
from afan.ops.kernels.resize_ce_kernel import fused_resize_nll_sums
from afan.train.segment_loop import _per_entry_loss_sums

# (name, B, H(out), h(in), C, focal)  — os4 logits for crop H
CASES = [
    ("city768", 2, 768, 192, 19, None),
    ("city512", 2, 512, 128, 19, None),
    ("voc513", 2, 513, 129, 21, None),          # odd H -> pad-H tile
    ("voc513_focal", 2, 513, 129, 21, (1.0, 2.0)),
    ("city768_focal", 2, 768, 192, 19, (1.0, 2.0)),
    ("tiny32", 2, 32, 8, 4, None),              # the test-suite geometry
]


def run_case(name, B, H, h, C, focal):
    rng = np.random.RandomState(0)
    lo = jnp.asarray(rng.randn(B, h, h, C), jnp.float32)
    labels = jnp.asarray(rng.randint(0, C, (B, H, H)), jnp.int32)
    labels = labels.at[:, :3, :3].set(255)      # exercise the mask

    def fused(x):
        return jnp.sum(fused_resize_nll_sums(x, labels, (H, H), False,
                                             focal))

    def ref(x):
        hi = resize_bilinear(x.astype(jnp.float32), (H, H))
        return jnp.sum(_per_entry_loss_sums(hi, labels,
                                            focal is not None))

    try:
        fv, fg = jax.jit(jax.value_and_grad(fused))(lo)
        rv, rg = jax.jit(jax.value_and_grad(ref))(lo)
        fv, rv = float(fv), float(rv)
        gerr = float(jnp.max(jnp.abs(fg - rg))
                     / jnp.maximum(jnp.max(jnp.abs(rg)), 1e-6))
        ok = abs(fv - rv) / max(abs(rv), 1e-6) < 1e-4 and gerr < 1e-3
        print(json.dumps({"case": name, "ok": bool(ok),
                          "fused": round(fv, 4), "ref": round(rv, 4),
                          "grad_rel_err": round(gerr, 8)}), flush=True)
        return ok
    except Exception as e:
        print(json.dumps({"case": name, "ok": False,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        return False


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    results = [run_case(*c) for c in CASES]
    print(json.dumps({"all_ok": all(results)}), flush=True)


if __name__ == "__main__":
    main()
