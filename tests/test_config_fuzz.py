"""Randomized flag-combination fuzz of the three step factories.

The reference ships ~23 trainer variants whose flag surfaces multiply
(spectrum size x AFN masks x SD modes x weight presets x input-adv x
remat ...). The recipe tests execute the CANONICAL combinations; this
matrix samples random VALID configs (seeded, reproducible) and asserts
every one of them compiles and takes a finite training step on tiny
shapes — guarding against accepted-but-broken flag combos (the class of
bug where `--lr_policy step` was accepted but silently ignored, commit
c4213c0, and where an SD-only config crashed the spectrum block,
commit 8ddfc5c).

Marked slow: each sampled config is its own XLA compile.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _finite_step(step, state, *args):
    state, metrics = step(state, *args)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    assert int(state.step) == 1
    return loss


class TestClassifyFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_alfa_config(self, seed):
        from afan.models.resnet_s import ResNetS
        from afan.train.loop import AlfaConfig, TrainState, make_alfa_step
        from afan.train.optim import sgd
        r = np.random.RandomState(seed)
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4)
        x = jnp.asarray(r.rand(4, 16, 16, 3), jnp.float32)
        y = jnp.asarray(r.randint(0, 4, 4))
        vs = m.init(jax.random.PRNGKey(seed), x, 0, None, False)
        tx = sgd(lambda c: 0.05, momentum=0.9, weight_decay=5e-4)
        cfg = AlfaConfig(
            tap=int(r.choice([2, 4, 6])),
            steps=int(r.choice([1, 3, 5])),
            gamma=float(r.choice([0.5, 1.5])) / 255,
            eps=2.0 / 255,
            randinit=bool(r.randint(2)),
            clip=bool(r.randint(2)),
            step_mode=str(r.choice(["sign", "grad"])),
            random_steps=bool(r.randint(2)),
        )
        step = make_alfa_step(m, tx, cfg)
        _finite_step(step, TrainState.create(vs, tx), x, y,
                     jax.random.PRNGKey(seed + 100))


class TestDetectFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_afan_config(self, seed):
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                            make_afan_det_step)
        from afan.train.loop import TrainState
        r = np.random.RandomState(seed)
        cfg = FRCNNConfig(backbone="resnet18", num_classes=4,
                          train_pre_nms_top_n=128, train_post_nms_top_n=32,
                          roi_samples=8, roi_fg_cap=2, rpn_samples=16,
                          rpn_fg_cap=8, anchor_sizes=(32, 64))
        m = FasterRCNN(cfg=cfg)
        imgs = jnp.asarray(r.rand(1, 64, 64, 3), jnp.float32)
        gtb = jnp.asarray([[[8.0, 8, 40, 40]]])
        gtc = jnp.asarray([[2]], jnp.int32)
        gtv = jnp.asarray([[True]])
        vs = m.init({"params": jax.random.PRNGKey(seed)}, imgs, gtb, gtc,
                    gtv, jax.random.PRNGKey(1), method=m.losses)
        tx = detection_tx(lambda c: 0.001)
        spectrum = int(r.choice([3, 5]))
        n_taps = int(r.choice([0, 1, 2]))
        taps = tuple(sorted(r.choice([1, 2, 3], n_taps, replace=False)))
        weight_mode = str(r.choice(["final", "sat_preset", "single"]))
        acfg = DetAfanConfig(
            taps_se=taps,
            gammas_se=tuple(0.9 / 255 for _ in taps),
            spectrum=spectrum,
            mix_mask=tuple(int(b) for b in r.randint(2, size=spectrum)),
            sd=[None, "roi", "rpn"][r.randint(3)] if taps else "roi",
            only_roi_sd=bool(r.randint(2)),
            mix_sd=bool(r.randint(2)),
            noise_sd=float(r.choice([0.0, 0.1])),
            steps=int(r.choice([1, 2])),
            randinit=bool(r.randint(2)),
            clip=bool(r.randint(2)),
            step_mode=str(r.choice(["sign", "grad"])),
            random_steps=bool(r.randint(2)),
            remat_tails=bool(r.randint(2)),
            weight_mode=weight_mode,
            loss_setting=int(r.choice([1, 2, 3, 4])),
            share_proposals=bool(r.randint(2)),
            input_adv=bool(r.randint(2)),
            input_adv_steps=1,
        )
        step = make_afan_det_step(m, tx, acfg)
        _finite_step(step, TrainState.create(vs, tx), imgs, gtb, gtc, gtv,
                     jax.random.PRNGKey(seed + 200))


class TestSegmentFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_afan_config(self, seed):
        from afan.models.deeplab import build_model
        from afan.train.loop import TrainState
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        r = np.random.RandomState(seed)
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        x = jnp.asarray(r.rand(1, 32, 32, 3), jnp.float32)
        y = r.randint(0, 4, (1, 32, 32))
        y[0, :3] = 255
        y = jnp.asarray(y)
        rng = jax.random.PRNGKey(seed)
        vs = m.init({"params": rng, "dropout": rng}, x, False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        spectrum = int(r.choice([2, 3, 5]))
        weight_mode = str(r.choice(["final", "sat_preset", "multi_preset"]))
        n_extra = int(r.choice([0, 1]))
        extra = tuple(r.choice([1, 3, 4], n_extra, replace=False))
        cfg = SegAfanConfig(
            tap_se=2,
            extra_taps=tuple(int(t) for t in extra),
            extra_gammas=tuple(0.01 / 255 for _ in extra),
            sd=[None, "aspp", "concat"][r.randint(3)],
            steps=int(r.choice([1, 2])),
            spectrum=spectrum,
            mix_mask=tuple(int(b) for b in r.randint(2, size=spectrum)),
            mix_sd=bool(r.randint(2)),
            mix_all=bool(r.randint(2)),
            noise_sd=float(r.choice([0.0, 0.1])),
            randinit=bool(r.randint(2)),
            clip=bool(r.randint(2)),
            step_mode=str(r.choice(["sign", "grad"])),
            random_steps=bool(r.randint(2)),
            use_focal=bool(r.randint(2)),
            remat_tails=bool(r.randint(2)),
            fold_sites=bool(r.randint(2)),
            weight_mode=weight_mode,
            loss_setting=int(r.choice([1, 2]))
            if weight_mode == "multi_preset" else int(r.choice([1, 2, 3, 4])),
            input_adv=bool(r.randint(2)),
            input_adv_steps=1,
        )
        step = make_afan_seg_step(m, tx, cfg)
        _finite_step(step, TrainState.create(vs, tx), x, y,
                     jax.random.PRNGKey(seed + 300))
