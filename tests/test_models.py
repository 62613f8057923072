"""ResNet-s structure and split-forward tests."""
import jax
import jax.numpy as jnp
import numpy as np

from afan.models.resnet_s import ResNetS, resnet56, LEARNABLE_TAPS


def tiny():
    return ResNetS(num_blocks=(1, 1, 1), num_classes=10)


class TestResNetS:
    def test_resnet56_param_count(self):
        # Reference ResNet-56 has 853,018 torch params (`resnet_s.py:1-21`:
        # "ResNet56 | 56 | 0.85M"); ours adds the 9-element eta vector that
        # torch counts too (`resnet_s.py:113-114`) → 853,027 total.
        m = resnet56()
        shapes = jax.eval_shape(
            lambda r, x: m.init(r, x, 0, None, False),
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
        assert n == 853_027

    def test_stage_count(self):
        # 34 stages for resnet56: norm+conv+bn+relu + 27 blocks + pool+flat+fc
        m = resnet56()
        shapes = jax.eval_shape(
            lambda r, x: m.init(r, x, 0, None, False),
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        # 27 blocks => bn params exist for block 26
        assert "blocks_26" in shapes["params"]
        assert "blocks_27" not in shapes["params"]
        for tap in LEARNABLE_TAPS:
            assert 0 < tap < 34

    def test_split_forward_equals_full(self):
        m = tiny()
        x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        full = m.apply(vs, x, 0, None, False)
        n = 10  # 4 stem + 3 blocks + 3 head stages
        for tap in (1, 4, 5, 7):
            feat = m.apply(vs, x, 0, tap, False)
            out = m.apply(vs, feat, tap, n, False)
            np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                       rtol=1e-4, atol=1e-5)

    def test_head_tail_aliases(self):
        m = tiny()
        x = jnp.zeros((2, 16, 16, 3))
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        feat = m.apply(vs, x, method=lambda mdl, x: mdl.head(x, 4))
        out = m.apply(vs, feat, method=lambda mdl, f: mdl.tail(f, 4))
        assert out.shape == (2, 10)

    def test_eta_param(self):
        m = ResNetS(num_blocks=(1, 1, 1), init_weight=1.0 / 9)
        vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                    0, None, False)
        np.testing.assert_allclose(np.asarray(vs["params"]["w"]), 1.0 / 9,
                                   rtol=1e-6)
        assert vs["params"]["w"].shape == (9,)

    def test_option_a_shortcut_downsamples(self):
        m = tiny()
        x = jnp.zeros((2, 16, 16, 3))
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        f4 = m.apply(vs, x, 0, 5, False)   # after block @16
        f5 = m.apply(vs, x, 0, 6, False)   # after block @32 stride 2
        assert f4.shape == (2, 16, 16, 16)
        assert f5.shape == (2, 8, 8, 32)
