"""Tests for the robustness/analysis eval surface and observability."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from afan.eval.robustness import (loss_landscape_probe,
                                  make_robust_eval_step,
                                  perturb_weight_directions)
from afan.models.resnet_s import ResNetS
from afan.train.loop import TrainState
from afan.train.optim import sgd


class TestRobustEval:
    def test_pgd_lowers_accuracy_of_trained_model(self):
        # train a tiny model a few steps, then robust acc <= clean acc
        from afan.train.loop import make_base_step, make_eval_step
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4)
        rng = np.random.RandomState(0)
        y = jnp.asarray(rng.randint(0, 4, 16))
        x = jnp.asarray(rng.rand(16, 16, 16, 3) * 0.1
                        + np.asarray(y)[:, None, None, None] * 0.25,
                        jnp.float32)
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        tx = sgd(lambda c: 0.1, 0.9)
        state = TrainState.create(vs, tx)
        step = make_base_step(m, tx)
        for _ in range(10):
            state, _ = step(state, x, y)
        clean = make_eval_step(m)(state, x, y)
        rob = make_robust_eval_step(m, 4, steps=3, gamma=8 / 255,
                                    eps=16 / 255)(
            state, x, y, jax.random.PRNGKey(1))
        assert int(rob["correct"]) <= int(clean["correct"])

    def test_weight_directions_normalized(self):
        params = {"a": np.zeros((4, 4)), "b": {"c": np.zeros(7)}}
        dirs = perturb_weight_directions(params, np.random.RandomState(0))
        total = sum(float((np.asarray(d) ** 2).sum())
                    for d in jax.tree.leaves(dirs))
        np.testing.assert_allclose(total, 1.0, rtol=1e-5)

    def test_loss_landscape_probe(self):
        params = {"w": jnp.asarray([1.0, 2.0])}
        dirs = {"w": jnp.asarray([1.0, 0.0])}

        def loss(p):
            return jnp.sum(p["w"] ** 2)

        vals = loss_landscape_probe(loss, params, dirs, [0.0, 1.0, 2.0])
        np.testing.assert_allclose(vals, [5.0, 8.0, 13.0], rtol=1e-6)


class TestObserve:
    def test_scalar_writer_jsonl(self, tmp_path):
        from afan.utils.observe import ScalarWriter
        w = ScalarWriter(str(tmp_path), use_tensorboard=False)
        w.add_scalar("train/loss", 0.5, 3)
        w.add_scalar("train/loss", 0.4, 4)
        w.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "scalars.jsonl")]
        assert lines[-1]["value"] == 0.4 and lines[-1]["step"] == 4

    def test_step_timer_cadence(self):
        from afan.utils.observe import StepTimer
        t = StepTimer(8, 100, display_every=5)
        assert t.tick(3) is None
        assert "samples/sec" in t.tick(5)


class TestVocColorMap:
    def test_known_entries(self):
        from afan.cli.eval_segment import voc_color_map
        cmap = voc_color_map()
        np.testing.assert_array_equal(cmap[0], [0, 0, 0])        # background
        np.testing.assert_array_equal(cmap[1], [128, 0, 0])      # aeroplane
        np.testing.assert_array_equal(cmap[15], [192, 128, 128])  # person
