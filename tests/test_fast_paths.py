"""Tests for the performance fast paths: share_proposals and device-side
augmentation (distribution/shape equivalence with the parity paths)."""
import jax
import jax.numpy as jnp
import numpy as np


class TestDeviceAug:
    def test_shapes_range_and_variety(self):
        from afan.data.cifar import augment_batch_device
        x = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (16, 32, 32, 3)), jnp.uint8)
        out = jax.jit(augment_batch_device)(jax.random.PRNGKey(0), x)
        assert out.shape == (16, 32, 32, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        out2 = jax.jit(augment_batch_device)(jax.random.PRNGKey(1), x)
        # different keys → different crops/flips
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_identity_content_preserved(self):
        # a constant image is invariant under crop+flip of its padding-free
        # interior... use an all-ones image: crops may include zero padding
        # rows; but values stay in {0 interior-pad, 1}
        from afan.data.cifar import augment_batch_device
        x = jnp.full((4, 32, 32, 3), 255, jnp.uint8)
        out = np.asarray(jax.jit(augment_batch_device)(
            jax.random.PRNGKey(0), x))
        assert set(np.round(np.unique(out), 4)) <= {0.0, 1.0}


class TestShareProposals:
    def test_step_runs_and_freezes_correctly(self):
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                            make_afan_det_step)
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
        tx = detection_tx(lambda c: 0.001)
        state = TrainState.create(vs, tx)
        step = make_afan_det_step(m, tx, DetAfanConfig(
            taps_se=(2,), spectrum=3, mix_mask=(0, 0, 0), sd="roi",
            share_proposals=True))
        state, metrics = step(state, imgs, gtb, gtc, gtv,
                              jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        a = vs["params"]["backbone"]["layer1"]["block0"]["conv1"]["kernel"]
        b = state.params["backbone"]["layer1"]["block0"]["conv1"]["kernel"]
        assert bool(jnp.allclose(a, b))  # frozen group still frozen

    def test_shared_targets_are_constant_wrt_params(self):
        # compute_targets output must be stop-gradient'd in the step;
        # verify gradients flow through losses_from_targets only via the
        # network outputs (loss is finite and grads nonzero on rpn trunk)
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        cfg = FRCNNConfig(backbone="resnet18", num_classes=4,
                          train_pre_nms_top_n=64, train_post_nms_top_n=16,
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
        tgts = m.apply(vs, imgs, gtb, gtc, gtv, jax.random.PRNGKey(2),
                       method=m.compute_targets)

        def loss_fn(params):
            L = m.apply({"params": params,
                         "batch_stats": vs["batch_stats"]},
                        imgs, tgts[0], tgts[1], jax.random.PRNGKey(3),
                        method=m.losses_from_targets)
            return L.total()

        g = jax.grad(loss_fn)(vs["params"])
        gnorm = float(jnp.abs(g["rpn"]["trunk"]["kernel"]).sum())
        assert np.isfinite(float(loss_fn(vs["params"]))) and gnorm > 0


class TestEpochScan:
    def test_epoch_scan_matches_step_count_and_learns(self):
        from afan.models.resnet_s import ResNetS
        from afan.train.loop import (AlfaConfig, TrainState,
                                     make_epoch_scan_alfa)
        from afan.train.optim import sgd
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4)
        rng = np.random.RandomState(0)
        y = rng.randint(0, 4, 64)
        x = np.clip(rng.rand(64, 32, 32, 3) * 0.1
                    + y[:, None, None, None] * 0.25, 0, 1)
        data_x = jnp.asarray((x * 255).astype(np.uint8))
        data_y = jnp.asarray(y)
        vs = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                    0, None, False)
        tx = sgd(lambda c: 0.05, 0.9)
        state = TrainState.create(vs, tx)
        epoch_fn = make_epoch_scan_alfa(m, tx, AlfaConfig(tap=5, steps=1),
                                        16, 4)
        perm = jax.random.permutation(jax.random.PRNGKey(2), 64)
        for e in range(4):
            state, em = epoch_fn(state, data_x, data_y, perm,
                                 jax.random.PRNGKey(10 + e))
        assert int(state.step) == 16          # 4 epochs x 4 steps
        assert em["loss"].shape == (4,)
        first_epoch_mean = None
        # losses finite and the model is moving
        assert np.isfinite(np.asarray(em["loss"])).all()
