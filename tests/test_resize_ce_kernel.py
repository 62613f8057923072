"""Parity tests for the fused upsample+CE Pallas kernel
(afan/ops/kernels/resize_ce_kernel.py) — interpret mode on the CPU mesh,
oracled against the XLA resize_bilinear + _per_entry_loss_sums path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.models.deeplab.heads import resize_bilinear
from afan.ops.kernels.resize_ce_kernel import (bilinear_matrix,
                                               fused_resize_nll_sums)
from afan.train.segment_loop import _per_entry_loss_sums


CASES = [
    (2, 6, 5, 7, 24, 20),    # integer H scale, non-integer W scale
    (1, 8, 8, 19, 32, 32),   # cityscapes channel count, 4x
    (2, 5, 7, 3, 20, 21),    # odd sizes both axes
    (1, 9, 9, 21, 27, 27),   # ODD output H -> row-tile TH=1 (the VOC
                             # 513-crop grid shape) + 21 classes
]


class TestBilinearMatrix:
    def test_matches_jax_image_resize(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 9, 13, 4),
                        jnp.float32)
        ref = jax.image.resize(x, (2, 27, 40, 4), "linear")
        rh = jnp.asarray(bilinear_matrix(27, 9))
        rw = jnp.asarray(bilinear_matrix(40, 13))
        got = jnp.einsum("Wq,bHqc->bHWc", rw,
                         jnp.einsum("Hp,bpqc->bHqc", rh, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_rows_sum_to_one(self):
        m = bilinear_matrix(768, 192)
        np.testing.assert_allclose(m.sum(1), 1.0, rtol=1e-6)


class TestFusedResizeCE:
    @pytest.mark.parametrize("case", CASES)
    def test_forward_matches_xla(self, case):
        B, h, w, C, H, W = case
        rng = np.random.RandomState(1)
        lo = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
        lab = rng.randint(0, C, (B, H, W))
        lab[0, :3] = 255  # exercise the ignore mask
        lab = jnp.asarray(lab, jnp.int32)
        ref = _per_entry_loss_sums(resize_bilinear(lo, (H, W)), lab, False)
        got = fused_resize_nll_sums(lo, lab, (H, W), True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5)

    @pytest.mark.parametrize("case", CASES[:2])
    def test_gradient_matches_xla(self, case):
        B, h, w, C, H, W = case
        rng = np.random.RandomState(2)
        lo = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
        lab = rng.randint(0, C, (B, H, W))
        lab[0, 1] = 255
        lab = jnp.asarray(lab, jnp.int32)
        wts = jnp.asarray(np.linspace(0.2, 1.0, B), jnp.float32)
        g_ref = jax.grad(lambda x: jnp.sum(wts * _per_entry_loss_sums(
            resize_bilinear(x, (H, W)), lab, False)))(lo)
        g_got = jax.grad(lambda x: jnp.sum(wts * fused_resize_nll_sums(
            x, lab, (H, W), True)))(lo)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)

    @pytest.mark.parametrize("case", CASES[:2])
    def test_focal_forward_and_grad_match_xla(self, case):
        """focal=(alpha,gamma) reproduces seg_focal_loss semantics
        (`Segmentation/utils/loss.py:5-20`) including the backward."""
        B, h, w, C, H, W = case
        rng = np.random.RandomState(5)
        lo = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
        lab = rng.randint(0, C, (B, H, W))
        lab[0, 0] = 255
        lab = jnp.asarray(lab, jnp.int32)
        ref = _per_entry_loss_sums(resize_bilinear(lo, (H, W)), lab, True)
        got = fused_resize_nll_sums(lo, lab, (H, W), True, (1.0, 2.0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5)
        g_ref = jax.grad(lambda x: jnp.sum(_per_entry_loss_sums(
            resize_bilinear(x, (H, W)), lab, True)))(lo)
        g_got = jax.grad(lambda x: jnp.sum(fused_resize_nll_sums(
            x, lab, (H, W), True, (1.0, 2.0))))(lo)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)

    def test_bf16_logits_upcast(self):
        """bf16 logits: the kernel interps+CEs in f32 (reference torch
        precision) — must be close to the f32 XLA computation, and the
        returned gradient dtype must match the input."""
        B, h, w, C, H, W = 1, 8, 8, 19, 32, 32
        rng = np.random.RandomState(3)
        lo32 = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
        lo16 = lo32.astype(jnp.bfloat16)
        lab = jnp.asarray(rng.randint(0, C, (B, H, W)), jnp.int32)
        ref = _per_entry_loss_sums(
            resize_bilinear(lo16.astype(jnp.float32), (H, W)), lab, False)
        got = fused_resize_nll_sums(lo16, lab, (H, W), True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)
        g = jax.grad(lambda x: jnp.sum(fused_resize_nll_sums(
            x, lab, (H, W), True)))(lo16)
        assert g.dtype == jnp.bfloat16


class TestStepWithFusedCE:
    @pytest.mark.slow
    def test_fused_step_under_dp_mesh(self):
        """The kernel must trace cleanly under a sharded jit (regression:
        lru-cached jnp weight constants leaked tracers across traces) and
        match the single-device loss."""
        from afan.models.deeplab import build_model
        from afan.parallel.mesh import make_mesh, replicate_state, \
            shard_batch
        from afan.train.loop import TrainState
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 4, (8, 32, 32)))
        key0 = jax.random.PRNGKey(0)
        vs = m.init({"params": key0, "dropout": key0}, x[:1], False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        step = make_afan_seg_step(m, tx, SegAfanConfig(
            tap_se=2, sd="concat", spectrum=3, mix_mask=(0, 0, 1),
            mix_sd=True, fused_ce=True))
        s1 = TrainState.create(vs, tx)
        s1, m1 = step(s1, x, y, jax.random.PRNGKey(7))
        mesh = make_mesh()
        s8 = replicate_state(mesh, TrainState.create(vs, tx))
        xb, yb = shard_batch(mesh, x, y)
        s8, m8 = step(s8, xb, yb, replicate_state(mesh,
                                                  jax.random.PRNGKey(7)))
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-4)
    def test_step_losses_match_xla_path(self):
        """make_afan_seg_step(fused_ce=True) == (fused_ce=False) on the
        same f32 model/batch (kernel math is f32; XLA path f32 here)."""
        from afan.models.deeplab import build_model
        from afan.train.loop import TrainState
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                        jnp.float32)
        y = np.random.RandomState(1).randint(0, 4, (2, 32, 32))
        y[0, :4] = 255
        y = jnp.asarray(y)
        rng = jax.random.PRNGKey(0)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        out = {}
        for fused in (True, False):
            cfg = SegAfanConfig(tap_se=2, sd="concat", spectrum=3,
                                mix_mask=(0, 0, 1), mix_sd=True,
                                fused_ce=fused)
            step = make_afan_seg_step(m, tx, cfg)
            state, metrics = step(TrainState.create(vs, tx), x, y,
                                  jax.random.PRNGKey(3))
            out[fused] = ({k: float(v) for k, v in metrics.items()},
                          state.params)
        for k in out[True][0]:
            np.testing.assert_allclose(out[True][0][k], out[False][0][k],
                                       rtol=2e-4, err_msg=k)
        for a, b in zip(jax.tree.leaves(out[True][1]),
                        jax.tree.leaves(out[False][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)
