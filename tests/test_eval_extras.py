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


class TestInputSurface:
    def test_alp_grid_semantics(self):
        """Legacy ALP probe (`Detection/py/evaluator_alp_zzy.py:131-186`):
        grid shape, finite losses off-center, and the reference's own
        0/0 NaN at the x=y=0 cell are all reproduced."""
        from afan.eval.robustness import make_input_surface_fn
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        from afan.train.detect_loop import detection_tx
        from afan.train.loop import TrainState

        cfg = FRCNNConfig(backbone="resnet18", num_classes=4,
                          train_pre_nms_top_n=128, train_post_nms_top_n=32,
                          roi_samples=8, roi_fg_cap=2, rpn_samples=16,
                          rpn_fg_cap=8, anchor_sizes=(32, 64))
        m = FasterRCNN(cfg=cfg)
        imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                           jnp.float32)
        gtb = jnp.asarray([[[8., 8, 40, 40]]])
        gtc = jnp.asarray([[2]], jnp.int32)
        gtv = jnp.asarray([[True]])
        vs = m.init({"params": jax.random.PRNGKey(0)}, imgs, gtb, gtc, gtv,
                    jax.random.PRNGKey(1), method=m.losses)
        state = TrainState.create(vs, detection_tx(lambda c: 0.0))
        fn = make_input_surface_fn(m, extent=0.1, points=4, chunk=4)
        Z = np.asarray(fn(state, imgs, gtb, gtc, gtv, jax.random.PRNGKey(2)))
        assert Z.shape == (4, 4)
        # grid is arange(-.1, .1, .05): center cell (x=y=0) is [2, 2]
        center = Z[2, 2]
        off = np.delete(Z.reshape(-1), 2 * 4 + 2)
        assert np.all(np.isfinite(off)) and np.all(off > 0)
        assert np.isnan(center)  # reference parity: 0/0 rescale at origin


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


class TestFeatureVis:
    def test_spectrum_dump(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from afan.eval.feature_vis import (make_spectrum_features_fn,
                                           save_spectrum_pngs)
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        from afan.train.detect_loop import detection_tx
        from afan.train.loop import TrainState

        cfg = FRCNNConfig(backbone="resnet18", num_classes=4,
                          train_pre_nms_top_n=128, train_post_nms_top_n=32,
                          roi_samples=8, roi_fg_cap=2, rpn_samples=16,
                          rpn_fg_cap=8, anchor_sizes=(32, 64))
        m = FasterRCNN(cfg=cfg)
        imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                           jnp.float32)
        gtb = jnp.asarray([[[8., 8, 40, 40]]])
        gtc = jnp.asarray([[2]], jnp.int32)
        gtv = jnp.asarray([[True]])
        vs = m.init({"params": jax.random.PRNGKey(0)}, imgs, gtb, gtc, gtv,
                    jax.random.PRNGKey(1), method=m.losses)
        state = TrainState.create(vs, detection_tx(lambda c: 0.0))
        fn = make_spectrum_features_fn(m, tap=2, gamma=0.9 / 255, steps=1,
                                       eps=2.0 / 255, n_points=3)
        spec = fn(state, imgs, gtb, gtc, gtv, jax.random.PRNGKey(2))
        assert spec.shape[0] == 3 and spec.shape[1] == 1
        # endpoint 0 is the clean head feature
        clean = m.apply(state.variables(), imgs, 2, False,
                        method=m.backbone_head)
        # (tolerance: the jitted spectrum program and the eager apply may
        # fuse convolutions differently on CPU)
        np.testing.assert_allclose(np.asarray(spec[0]), np.asarray(clean),
                                   atol=5e-4, rtol=5e-4)
        # endpoints differ (the ascent moved the feature)
        assert float(jnp.abs(spec[2] - spec[0]).max()) > 0
        n = save_spectrum_pngs(np.asarray(spec), np.asarray(imgs), ["img7"],
                               str(tmp_path))
        assert n == 4  # input + 3 spectrum points
        import os
        assert os.path.exists(tmp_path / "img7_input.png")
        assert os.path.exists(tmp_path / "img7_spec2.png")
