"""Property tests for the shared A-FAN core (SURVEY.md §4 test plan items:
spectrum endpoints/linearity, AFN output statistics, ball projections,
PGD ascent semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.core import (
    linfball_proj, l2ball_proj, tensor_clamp,
    mix_feature, mix_spectrum,
    sample_points, sample_points_list, spectrum_weights,
    pgd, input_pgd, uniform_init, perturbation_norms,
)


class TestProjections:
    def test_tensor_clamp(self):
        t = jnp.asarray([-2.0, 0.5, 3.0])
        lo = jnp.asarray([-1.0, 0.0, 0.0])
        hi = jnp.asarray([1.0, 1.0, 2.0])
        np.testing.assert_allclose(tensor_clamp(t, lo, hi), [-1.0, 0.5, 2.0])

    def test_linf_ball_membership(self):
        rng = np.random.RandomState(0)
        center = jnp.asarray(rng.randn(4, 8), jnp.float32)
        t = jnp.asarray(rng.randn(4, 8) * 10, jnp.float32)
        proj = linfball_proj(center, 0.3, t)
        assert float(jnp.max(jnp.abs(proj - center))) <= 0.3 + 1e-6
        # points already inside are untouched
        inside = center + 0.1
        np.testing.assert_allclose(linfball_proj(center, 0.3, inside), inside)

    def test_l2_ball_membership_and_identity_inside(self):
        rng = np.random.RandomState(1)
        center = jnp.asarray(rng.randn(4, 16), jnp.float32)
        t = jnp.asarray(center + rng.randn(4, 16) * 5, jnp.float32)
        proj = l2ball_proj(center, 1.0, t)
        norms = jnp.linalg.norm((proj - center).reshape(4, -1), axis=1)
        assert float(jnp.max(norms)) <= 1.0 + 1e-5
        # direction is preserved (radial projection)
        d_orig = (t - center).reshape(4, -1)
        d_proj = (proj - center).reshape(4, -1)
        cos = jnp.sum(d_orig * d_proj, 1) / (
            jnp.linalg.norm(d_orig, axis=1) * jnp.linalg.norm(d_proj, axis=1))
        np.testing.assert_allclose(np.asarray(cos), 1.0, atol=1e-5)
        inside = center + 0.01
        np.testing.assert_allclose(l2ball_proj(center, 1.0, inside), inside,
                                   rtol=1e-5)


class TestSpectrum:
    def test_weights_match_reference_construction(self):
        # get_sample_points builds [0, 1/(n-1)*1.., 1] (Detection/attack_algo.py:236-245)
        for n in (2, 3, 5, 7, 10):
            ws = np.asarray(spectrum_weights(n))
            percent = 1.0 / (n - 1)
            expect = [0.0] + [i * percent for i in range(1, n - 1)] + [1.0]
            np.testing.assert_allclose(ws, expect, rtol=1e-6)

    def test_endpoints_and_lerp(self):
        rng = np.random.RandomState(2)
        clean = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
        adv = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
        pts = sample_points(clean, adv, 5)
        assert pts.shape == (5,) + clean.shape
        np.testing.assert_allclose(pts[0], clean, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(pts[-1], adv, rtol=1e-6, atol=1e-7)
        # torch.lerp: x + w*(y-x)
        np.testing.assert_allclose(
            np.asarray(pts[2]), np.asarray(clean + 0.5 * (adv - clean)),
            rtol=1e-5)
        lst = sample_points_list(clean, adv, 5)
        assert len(lst) == 5
        np.testing.assert_allclose(lst[3], pts[3])

    def test_linearity(self):
        clean = jnp.zeros((1, 2, 2, 2))
        adv = jnp.ones((1, 2, 2, 2))
        pts = sample_points(clean, adv, 5)
        diffs = np.diff(np.asarray(pts)[:, 0, 0, 0, 0])
        np.testing.assert_allclose(diffs, 0.25, rtol=1e-5)


class TestAFN:
    def _torch_semantics(self, clean, adv):
        # mix_feature (Detection/attack_algo.py:254-265): dim=1 (channels,
        # NCHW) stats with torch's UNBIASED var.  Our tensors are NHWC so
        # channel axis is -1.
        eps = 1e-5
        mean_cl = clean.mean(axis=-1, keepdims=True)
        std_cl = np.sqrt(clean.var(axis=-1, keepdims=True, ddof=1) + eps)
        mean_adv = adv.mean(axis=-1, keepdims=True)
        std_adv = np.sqrt(adv.var(axis=-1, keepdims=True, ddof=1) + eps)
        return (clean - mean_cl) / std_cl * std_adv + mean_adv

    def test_matches_reference_formula(self):
        rng = np.random.RandomState(3)
        clean = rng.randn(2, 4, 4, 16).astype(np.float32)
        adv = rng.randn(2, 4, 4, 16).astype(np.float32)
        got = np.asarray(mix_feature(jnp.asarray(clean), jnp.asarray(adv)))
        np.testing.assert_allclose(got, self._torch_semantics(clean, adv),
                                   rtol=1e-4, atol=1e-5)

    def test_output_stats_match_adv(self):
        rng = np.random.RandomState(4)
        clean = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
        adv = jnp.asarray(rng.randn(2, 8, 8, 64) * 3 + 1, jnp.float32)
        mixed = mix_feature(clean, adv)
        # per-position channel mean must equal adv's channel mean
        np.testing.assert_allclose(
            np.asarray(mixed.mean(-1)), np.asarray(adv.mean(-1)),
            rtol=1e-3, atol=1e-3)

    def test_channel_axis_nchw(self):
        rng = np.random.RandomState(5)
        clean = rng.randn(2, 16, 4, 4).astype(np.float32)
        adv = rng.randn(2, 16, 4, 4).astype(np.float32)
        got = np.asarray(mix_feature(jnp.asarray(clean), jnp.asarray(adv),
                                     channel_axis=1))
        # transpose-roundtrip equivalence with the NHWC path
        got2 = np.asarray(mix_feature(
            jnp.asarray(clean.transpose(0, 2, 3, 1)),
            jnp.asarray(adv.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, got2, rtol=1e-5, atol=1e-6)

    def test_mix_spectrum_mask(self):
        rng = np.random.RandomState(6)
        clean = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
        adv = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
        spec = sample_points(clean, adv, 5)
        mixed = mix_spectrum(clean, spec, mask=(0, 1, 0, 1, 0))
        np.testing.assert_allclose(mixed[0], spec[0])
        np.testing.assert_allclose(mixed[2], spec[2])
        np.testing.assert_allclose(mixed[1], mix_feature(clean, spec[1]),
                                   rtol=1e-5)
        np.testing.assert_allclose(mixed[3], mix_feature(clean, spec[3]),
                                   rtol=1e-5)


class TestPGD:
    def test_linear_model_analytic(self):
        # loss = w . x  →  grad = w, so k steps move x by k*gamma*sign(w).
        w = jnp.asarray([1.0, -2.0, 0.5, -0.1])
        x = jnp.zeros((4,))
        adv = pgd(lambda z: jnp.sum(w * z), x, steps=3, gamma=0.01)
        np.testing.assert_allclose(
            np.asarray(adv), 0.03 * np.sign(np.asarray(w)), rtol=1e-6)

    def test_clip_keeps_eps_ball(self):
        w = jnp.ones((8,))
        x = jnp.zeros((8,))
        adv = pgd(lambda z: jnp.sum(w * z), x, steps=10, gamma=0.05,
                  eps=0.1, clip=True)
        assert float(jnp.max(jnp.abs(adv - x))) <= 0.1 + 1e-6

    def test_ascent_increases_loss(self):
        rng = np.random.RandomState(7)
        a = jnp.asarray(rng.randn(16, 16), jnp.float32)

        def loss(z):
            return jnp.sum((a @ z.ravel()) ** 2)

        x = jnp.asarray(rng.randn(16), jnp.float32)
        adv = pgd(loss, x, steps=5, gamma=0.01)
        assert float(loss(adv)) > float(loss(x))

    def test_randinit_within_eps(self):
        x = jnp.zeros((100,))
        rng = jax.random.PRNGKey(0)
        adv = pgd(lambda z: jnp.sum(z * 0.0), x, steps=0, gamma=0.1,
                  eps=0.25, randinit=True, rng=rng)
        assert float(jnp.max(jnp.abs(adv))) <= 0.25
        assert float(jnp.std(adv)) > 0.05  # actually random

    def test_grad_step_mode_normalized(self):
        # batchless: loss = w.x → dir = w / max|w|; 2 steps of gamma
        w = jnp.asarray([1.0, -2.0, 0.5, -0.1])
        x = jnp.zeros((4,))
        adv = pgd(lambda z: jnp.sum(w * z), x, steps=2, gamma=0.01,
                  step_mode="grad")
        np.testing.assert_allclose(np.asarray(adv),
                                   0.02 * np.asarray(w) / 2.0, rtol=1e-5)
        # batched: per-sample normalization
        wb = jnp.asarray([[2.0, 1.0], [0.5, -0.25]])
        xb = jnp.zeros((2, 2))
        advb = pgd(lambda z: jnp.sum(wb * z), xb, steps=1, gamma=0.1,
                   step_mode="grad")
        np.testing.assert_allclose(
            np.asarray(advb), [[0.1, 0.05], [0.1, -0.05]], rtol=1e-5)

    def test_random_steps_mean_and_determinism(self):
        w = jnp.ones((8,))
        x = jnp.zeros((8,))
        k = jax.random.PRNGKey(3)
        a1 = pgd(lambda z: jnp.sum(w * z), x, steps=50, gamma=0.01,
                 random_steps=True, rng=k)
        a2 = pgd(lambda z: jnp.sum(w * z), x, steps=50, gamma=0.01,
                 random_steps=True, rng=k)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        # 50 uniform(0, .02) steps → total displacement ~ 50 * 0.01
        total = float(a1[0])
        assert 0.35 < total < 0.65
        fixed = pgd(lambda z: jnp.sum(w * z), x, steps=50, gamma=0.01)
        assert not np.allclose(np.asarray(a1), np.asarray(fixed))

    def test_bailout_matches_scan_when_no_plateau(self):
        # a quadratic loss keeps growing, so a tight tolerance never
        # triggers and the while_loop result bit-matches the scan path.
        w = jnp.asarray([1.0, -2.0, 0.5, -0.1])
        x = jnp.asarray([0.3, -0.2, 0.1, 0.05])
        loss = lambda z: jnp.sum((w * z) ** 2)
        full = pgd(loss, x, steps=5, gamma=0.01)
        bo = pgd(loss, x, steps=5, gamma=0.01, bailout_tol=1e-12)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(bo))

    def test_bailout_stops_early_on_plateau(self):
        # linear loss: every step changes the loss by the same amount, so
        # a huge tolerance bails after the SECOND step (the first delta is
        # computed against the +inf sentinel). Result == the 2-step scan.
        w = jnp.asarray([1.0, -2.0, 0.5, -0.1])
        x = jnp.zeros((4,))
        loss = lambda z: jnp.sum(w * z)
        bo = pgd(loss, x, steps=50, gamma=0.01, bailout_tol=1e9)
        two = pgd(loss, x, steps=2, gamma=0.01)
        np.testing.assert_array_equal(np.asarray(bo), np.asarray(two))
        # and it jits (the eval CLIs wrap it in jax.jit)
        jj = jax.jit(lambda z: pgd(loss, z, steps=50, gamma=0.01,
                                   bailout_tol=1e9))
        np.testing.assert_array_equal(np.asarray(jj(x)), np.asarray(two))

    def test_bad_step_mode_raises(self):
        with pytest.raises(ValueError):
            pgd(lambda z: jnp.sum(z), jnp.zeros((2,)), steps=1, gamma=0.1,
                step_mode="nope")

    def test_input_pgd_clamps_01(self):
        x = jnp.full((4,), 0.99)
        adv = input_pgd(lambda z: jnp.sum(z), x, steps=5, gamma=0.1)
        assert float(jnp.max(adv)) <= 1.0
        x2 = jnp.full((4,), 0.01)
        adv2 = input_pgd(lambda z: -jnp.sum(z), x2, steps=5, gamma=0.1)
        assert float(jnp.min(adv2)) >= 0.0

    def test_perturbation_norms(self):
        clean = jnp.zeros((2, 3, 3, 1))
        adv = clean.at[0].set(0.5)
        l2, linf = perturbation_norms(clean, adv)
        np.testing.assert_allclose(np.asarray(l2), [1.5, 0.0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(linf), [0.5, 0.0])

    def test_uniform_init_range(self):
        r = uniform_init(jax.random.PRNGKey(1), (1000,), 0.3)
        assert float(jnp.min(r)) >= -0.3 and float(jnp.max(r)) <= 0.3

    def test_requires_rng_for_randinit(self):
        with pytest.raises(ValueError):
            pgd(lambda z: jnp.sum(z), jnp.zeros(3), steps=1, gamma=0.1,
                eps=0.1, randinit=True)
