"""Train-step tests: base / ALFA / learnable-eta on a tiny ResNet-s.

Mirrors the reference's implicit acceptance criteria (SURVEY.md §4): the
loss decreases on learnable data, the adversarial loss exceeds the clean
loss at the tapped feature, eta stays sum-to-one after projection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from afan.models.resnet_s import ResNetS
from afan.train.loop import (
    AlfaConfig, LearnableConfig, TrainState, accuracy, cross_entropy,
    make_alfa_step, make_base_step, make_eval_step, make_learnable_step,
    sum_project,
)
from afan.train.optim import (
    multistep_warmup_schedule, poly_schedule, sgd, warmup_multistep_schedule,
)


def tiny_model():
    return ResNetS(num_blocks=(1, 1, 1), num_classes=4)


def tiny_batch(n=8, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 4, n)
    # linearly separable-ish images: class-dependent mean
    x = rng.rand(n, 16, 16, 3) * 0.1 + y[:, None, None, None] * 0.25
    return jnp.asarray(x, jnp.float32), jnp.asarray(y)


@pytest.fixture(scope="module")
def model_state():
    m = tiny_model()
    x, _ = tiny_batch()
    vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
    return m, vs


class TestSchedules:
    def test_multistep_warmup(self):
        s = multistep_warmup_schedule(0.1, [100, 200], 0.1, warmup_steps=10)
        # warmup: step*max_lr/(warmup-1) (main_perturb.py:288-293)
        np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-9)
        np.testing.assert_allclose(float(s(9)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(50)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(150)), 0.01, rtol=1e-6)
        np.testing.assert_allclose(float(s(250)), 0.001, rtol=1e-6)

    def test_warmup_multistep_detection(self):
        # lr * gamma^k * (factor + (1-factor)*min(step/iters,1))
        # (Detection/extension/lr_scheduler.py:13-21)
        s = warmup_multistep_schedule(0.008, [6250, 8750], 0.1, 1 / 3, 500)
        np.testing.assert_allclose(float(s(0)), 0.008 / 3, rtol=1e-5)
        np.testing.assert_allclose(float(s(500)), 0.008, rtol=1e-5)
        np.testing.assert_allclose(float(s(7000)), 0.0008, rtol=1e-5)
        np.testing.assert_allclose(float(s(9000)), 0.00008, rtol=1e-5)

    def test_poly(self):
        s = poly_schedule(0.1, 1000, 0.9)
        np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(500)), 0.1 * 0.5 ** 0.9, rtol=1e-5)
        assert float(s(1000)) == 0.0


class TestBaseStep:
    def test_loss_decreases(self, model_state):
        m, vs = model_state
        tx = sgd(lambda c: 0.05, momentum=0.9, weight_decay=5e-4)
        state = TrainState.create(vs, tx)
        step = make_base_step(m, tx)
        x, y = tiny_batch()
        losses = []
        for _ in range(8):
            state, metrics = step(state, x, y)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8


class TestAlfaStep:
    def test_step_runs_and_learns(self, model_state):
        m, vs = model_state
        tx = sgd(lambda c: 0.05, momentum=0.9, weight_decay=5e-4)
        state = TrainState.create(vs, tx)
        cfg = AlfaConfig(tap=5, steps=2, gamma=1.5 / 255, eps=2 / 255)
        step = make_alfa_step(m, tx, cfg)
        x, y = tiny_batch()
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, metrics = step(state, x, y, jax.random.fold_in(rng, i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        # PGD moved the feature: every element steps by +-gamma each of the
        # 2 steps, so per-element |delta| <= 2*gamma and L-inf > 0.
        assert float(metrics["pert_linf"]) > 0
        assert float(metrics["pert_linf"]) <= 2 * cfg.gamma + 1e-6

    def test_adv_loss_geq_clean_at_init(self, model_state):
        # the ascent maximizes the tail loss, so tail(adv) loss must be >=
        # tail(clean) loss for a fresh model
        m, vs = model_state
        x, y = tiny_batch()
        from afan.core.attack import pgd
        feat = m.apply(vs, x, 0, 5, True, mutable=["batch_stats"])[0]

        def tail_loss(f):
            logits = m.apply(vs, f, 5, 10, True, mutable=["batch_stats"])[0]
            return cross_entropy(logits, y)

        adv = pgd(tail_loss, feat, steps=3, gamma=0.01)
        assert float(tail_loss(adv)) >= float(tail_loss(feat))


class TestLearnableStep:
    def test_sum_project(self):
        w = jnp.asarray([0.5, 0.5, 0.5])
        np.testing.assert_allclose(float(jnp.sum(sum_project(w))), 1.0,
                                   rtol=1e-6)

    def test_step_runs_and_projects(self):
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4, init_weight=1 / 9)
        x, y = tiny_batch()
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)

        def label_fn(params):
            return jax.tree.map_with_path(
                lambda path, _: "w" if path[0].key == "w" else "model", params)

        tx = optax.multi_transform(
            {"model": sgd(lambda c: 0.05, 0.9, 5e-4),
             "w": sgd(lambda c: 0.01, 0.9, 0.0)}, label_fn)
        state = TrainState.create(vs, tx)
        cfg = LearnableConfig(taps=(2, 5, 7), steps=1, l1_coef=0.01)
        step = make_learnable_step(m, tx, cfg)
        state, metrics = step(state, x, y, jax.random.PRNGKey(2))
        # eta sums to one after projection (main_learnable.py:369-378)
        np.testing.assert_allclose(float(jnp.sum(state.params["w"])), 1.0,
                                   rtol=1e-5)
        assert metrics["pert_l2"].shape == (3,)
        state, _ = step(state, x, y, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(jnp.sum(state.params["w"])), 1.0,
                                   rtol=1e-5)


class TestEval:
    def test_eval_step(self, model_state):
        m, vs = model_state
        tx = sgd(lambda c: 0.1)
        state = TrainState.create(vs, tx)
        x, y = tiny_batch()
        out = make_eval_step(m)(state, x, y)
        assert 0.0 <= float(out["accuracy"]) <= 100.0
        assert int(out["count"]) == 8

    def test_accuracy_fn(self):
        logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        labels = jnp.asarray([0, 1, 1])
        np.testing.assert_allclose(float(accuracy(logits, labels)),
                                   100.0 * 2 / 3, rtol=1e-5)
