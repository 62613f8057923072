"""Honest Pallas-NMS microbenchmark on the real TPU.

Methodology notes (both matter on the tunneled axon runtime):
* `jax.block_until_ready` does NOT reliably await the dispatch queue and
  independent dispatches overlap host-side — naive timing loops read
  2-10x too fast. Each measured call must DEPEND on the previous one, so
  the whole chain is built as one `lax.scan` whose carry threads a
  keep-derived epsilon into the next iteration's boxes.
* one host fetch costs a tunnel round-trip (~35 ms); the chain must be
  long enough to amortize it, and the printed per-call figure subtracts
  the separately-measured RTT.

Run: python scripts/bench_nms.py  (~3 min incl. compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import afan.ops.kernels.nms_kernel as K

N = 12000       # the training-path pre-NMS top-k (`FRCNNConfig`)
ITERS = 64


def make(seed, clustered=False):
    rng = np.random.RandomState(seed)
    if clustered:  # trained-RPN-like: boxes piled on ~30 object centers
        centers = rng.rand(30, 2) * [1008, 608]
        pick = rng.randint(0, 30, N)
        cx = centers[pick, 0] + rng.randn(N) * 30
        cy = centers[pick, 1] + rng.randn(N) * 30
        bw = rng.gamma(4.0, 30.0, N) + 16
        bh = rng.gamma(4.0, 30.0, N) + 16
    else:          # early-training-like: near-uniform
        cx = rng.rand(N) * 1008
        cy = rng.rand(N) * 608
        bw = rng.gamma(2.0, 60.0, N) + 8
        bh = rng.gamma(2.0, 60.0, N) + 8
    b = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                 1).astype(np.float32)
    s = rng.rand(N).astype(np.float32)
    return jnp.asarray(b[np.argsort(-s)])


from afan.utils.timing import measure_rtt  # noqa: E402 (path bootstrap above)


@jax.jit
def _chained(bs, valid):
    # module-level jit: both box distributions reuse ONE compiled program
    # (per-bench closures would recompile the identical program — the
    # documented same-program-twice remote-compile hang mode)
    def body(carry, _):
        boxes, acc = carry
        keep = K.nms_sorted_mask_pallas(boxes, valid, 0.7)
        eps = (keep[0].astype(jnp.float32) - 0.5) * 1e-6
        return (boxes + eps, acc + keep.sum()), None

    (_, acc), _ = jax.lax.scan(body, (bs, jnp.zeros((), jnp.float32)),
                               None, length=ITERS)
    return acc


def bench(bs, rtt, label):
    valid = jnp.ones((N,), bool)

    def chained(b):
        return _chained(b, valid)

    kept = float(chained(bs)) / ITERS
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(bs))
        best = min(best, (time.perf_counter() - t0))
    per_call = (best - rtt) / ITERS
    print(f"{label}: {per_call*1e3:6.3f} ms/call  (mean kept {kept:.0f}/{N})")
    return per_call


def smoke_parity():
    """Exact parity of the TPU Pallas lowering vs the C++ oracle
    (scripts/tpu_smoke.sh standing check — the CI golden test only
    covers interpret mode; this exercises real Mosaic)."""
    from afan.ops.native import nms_cpu

    valid = jnp.ones((N,), bool)
    ok = True
    for label, boxes in (("uniform", make(1)),
                         ("clustered", make(8, clustered=True))):
        bs = np.asarray(boxes)
        scores = np.linspace(1.0, 1e-3, N).astype(np.float32)  # pre-sorted
        keep = np.asarray(K.nms_sorted_mask_pallas(boxes, valid, 0.7))
        got = set(np.nonzero(keep)[0].tolist())
        want = set(nms_cpu(bs, scores, 0.7).tolist())
        if got == want:
            print(f"{label}: parity ok ({len(want)} kept)")
        else:
            ok = False
            print(f"{label}: PARITY MISMATCH "
                  f"(pallas {len(got)} vs oracle {len(want)}, "
                  f"diff {len(got ^ want)})")
    return ok


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        sys.exit(0 if smoke_parity() else 1)
    rtt = measure_rtt()
    print(f"tunnel RTT (subtracted): {rtt*1e3:.1f} ms")
    bench(make(0), rtt, "uniform  ")
    bench(make(7, clustered=True), rtt, "clustered")
