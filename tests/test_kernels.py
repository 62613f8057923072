"""Pallas kernel parity tests (interpreter mode on the CPU test mesh)."""
import jax.numpy as jnp
import numpy as np
import pytest

from afan.ops.kernels.pgd_step import pgd_update_pallas, pgd_update_reference


class TestPgdStepKernel:
    @pytest.mark.parametrize("shape", [(128,), (4, 33, 7), (2, 16, 16, 16)])
    def test_matches_reference(self, shape):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        g = jnp.asarray(rng.randn(*shape), jnp.float32)
        got = pgd_update_pallas(x, g, gamma=0.01, interpret=True)
        want = pgd_update_reference(x, g, gamma=0.01)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)

    def test_clip_matches_reference(self):
        rng = np.random.RandomState(1)
        shape = (3, 50)
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        g = jnp.asarray(rng.randn(*shape), jnp.float32)
        c = jnp.asarray(rng.randn(*shape), jnp.float32)
        got = pgd_update_pallas(x, g, c, gamma=0.05, eps=0.1, clip=True,
                                interpret=True)
        want = pgd_update_reference(x, g, c, gamma=0.05, eps=0.1, clip=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
        assert float(jnp.max(jnp.abs(got - c))) <= 0.1 + 1e-6


class TestNmsKernel:
    def _random(self, n, seed):
        rng = np.random.RandomState(seed)
        xy = rng.rand(n, 2) * 400
        wh = rng.rand(n, 2) * 80 + 4
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        order = np.argsort(-scores)
        return boxes[order], scores[order]

    # n=3000 pads to 3 CHUNKs: exercises the boundary-chunk iota mask AND
    # the mask-free streaming sweep over later chunks — the path the
    # 12k-anchor training pipeline runs, previously untested (every case
    # capped at one 1024-wide chunk).
    @pytest.mark.parametrize("n", [128, 300, 1024, 3000])
    def test_matches_oracle(self, n):
        from afan.ops.kernels.nms_kernel import nms_sorted_mask_pallas
        from afan.ops.native import nms_cpu
        bs, ss = self._random(n, n)
        keep = np.asarray(nms_sorted_mask_pallas(
            jnp.asarray(bs), jnp.ones(n, bool), 0.6, interpret=True))
        want = set(nms_cpu(bs, ss, 0.6).tolist())
        assert set(np.nonzero(keep)[0].tolist()) == want

    def test_multichunk_dense_overlap(self):
        # heavy cross-chunk suppression: big boxes drawn from few cluster
        # centers so early tiles suppress boxes 2+ chunks away (deep
        # suppression chains also push past STATIC_ROUNDS)
        from afan.ops.kernels.nms_kernel import nms_sorted_mask_pallas
        from afan.ops.native import nms_cpu
        rng = np.random.RandomState(99)
        n = 2600
        centers = rng.rand(8, 2) * 300
        which = rng.randint(0, 8, n)
        xy = centers[which] + rng.randn(n, 2) * 12
        wh = rng.rand(n, 2) * 120 + 60
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        order = np.argsort(-scores)
        bs, ss = boxes[order], scores[order]
        keep = np.asarray(nms_sorted_mask_pallas(
            jnp.asarray(bs), jnp.ones(n, bool), 0.5, interpret=True))
        want = set(nms_cpu(bs, ss, 0.5).tolist())
        assert set(np.nonzero(keep)[0].tolist()) == want

    def test_valid_mask(self):
        from afan.ops.kernels.nms_kernel import nms_sorted_mask_pallas
        from afan.ops.native import nms_cpu
        bs, ss = self._random(256, 7)
        valid = np.arange(256) < 100
        keep = np.asarray(nms_sorted_mask_pallas(
            jnp.asarray(bs), jnp.asarray(valid), 0.6, interpret=True))
        want = set(nms_cpu(bs[:100], ss[:100], 0.6).tolist())
        assert set(np.nonzero(keep)[0].tolist()) == want
        assert not keep[100:].any()
