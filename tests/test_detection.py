"""Detection stack tests: boxes, anchors, sampling, RPN labeling/proposals,
ROI targets, the A-FAN detection step, and the voc_eval mAP port."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.models.frcnn import boxes as B
from afan.models.frcnn.anchors import generate_anchors
from afan.models.frcnn.rpn import generate_proposals, label_anchors
from afan.models.frcnn.roi_head import roi_targets
from afan.models.frcnn.sampling import beta_smooth_l1, masked_mean, sample_fg_bg


class TestBoxes:
    def test_center_roundtrip(self):
        rng = np.random.RandomState(0)
        bx = jnp.asarray(rng.rand(10, 4) * 100, jnp.float32)
        bx = bx.at[:, 2:].add(bx[:, :2])
        np.testing.assert_allclose(np.asarray(B.from_center(B.to_center(bx))),
                                   np.asarray(bx), rtol=1e-5)

    def test_delta_roundtrip(self):
        rng = np.random.RandomState(1)
        src = jnp.asarray([[10, 10, 50, 60], [0, 0, 30, 30]], jnp.float32)
        dst = jnp.asarray([[12, 8, 55, 66], [5, 5, 20, 28]], jnp.float32)
        deltas = B.encode_deltas(src, dst)
        back = B.decode_deltas(src, deltas)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dst),
                                   rtol=1e-4, atol=1e-4)

    def test_iou_batched(self):
        a = jnp.asarray([[[0., 0, 10, 10]]])
        b = jnp.asarray([[[0., 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]]])
        got = np.asarray(B.iou(a, b))[0, 0]
        np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0], rtol=1e-5)

    def test_inside_and_clip(self):
        bx = jnp.asarray([[-5., 2, 50, 90], [10, 10, 20, 20]])
        ins = np.asarray(B.inside(bx, 0, 0, 40, 40))
        assert ins.tolist() == [False, True]
        clipped = np.asarray(B.clip(bx, 0, 0, 40, 40))
        np.testing.assert_allclose(clipped[0], [0, 2, 40, 40])


class TestAnchors:
    def test_reference_construction(self):
        # 2x2 grid, 1 ratio (1,1), 1 size → centers are interior linspace pts
        a = generate_anchors(100, 100, 2, 2, ratios=((1, 1),), sizes=(10,))
        assert a.shape == (4, 4)
        centers = (a[:, :2] + a[:, 2:]) / 2
        expect = np.asarray(np.meshgrid([100 / 3, 200 / 3], [100 / 3, 200 / 3],
                                        indexing="ij")).reshape(2, -1).T
        # ys-major order → center = (x, y) with y varying slowest
        np.testing.assert_allclose(centers[:, 1], expect[:, 0], rtol=1e-5)
        np.testing.assert_allclose((a[:, 2] - a[:, 0]), 10, rtol=1e-6)

    def test_ratio_geometry(self):
        a = generate_anchors(500, 500, 1, 1, ratios=((1, 2),), sizes=(100,))
        w = a[0, 2] - a[0, 0]
        h = a[0, 3] - a[0, 1]
        # ratio 0.5 → width = 100*sqrt(2), height = 100/sqrt(2)
        np.testing.assert_allclose(w, 100 * np.sqrt(2), rtol=1e-5)
        np.testing.assert_allclose(h, 100 / np.sqrt(2), rtol=1e-5)
        np.testing.assert_allclose(w * h, 100 * 100, rtol=1e-5)


class TestSampling:
    def test_fg_cap_and_fill(self):
        fg = jnp.asarray([True] * 10 + [False] * 90)
        bg = ~fg
        res = sample_fg_bg(jax.random.PRNGKey(0), fg, bg, 32, 8)
        assert int(res.is_fg.sum()) == 8          # capped at 8
        assert int(res.valid.sum()) == 32          # filled with bg
        # all fg slots index actual fg candidates
        assert bool(jnp.all(res.indices[res.is_fg] < 10))
        assert bool(jnp.all(res.indices[res.valid & ~res.is_fg] >= 10))

    def test_scarce_candidates(self):
        fg = jnp.zeros(20, bool).at[3].set(True)
        bg = jnp.zeros(20, bool).at[7].set(True)
        res = sample_fg_bg(jax.random.PRNGKey(1), fg, bg, 16, 8)
        assert int(res.valid.sum()) == 2
        assert int(res.is_fg.sum()) == 1

    def test_uniformity(self):
        # every fg candidate should be selected with roughly equal frequency
        fg = jnp.asarray([True] * 20 + [False] * 20)
        bg = ~fg
        counts = np.zeros(20)
        for i in range(200):
            res = sample_fg_bg(jax.random.PRNGKey(i), fg, bg, 8, 4)
            sel = np.asarray(res.indices[res.is_fg])
            counts[sel] += 1
        # expectation 200*4/20 = 40 per candidate
        assert counts.min() > 15 and counts.max() < 70

    def test_masked_mean_and_l1(self):
        v = jnp.asarray([1.0, 2.0, 3.0])
        m = jnp.asarray([True, False, True])
        np.testing.assert_allclose(float(masked_mean(v, m)), 2.0)
        assert float(masked_mean(v, jnp.zeros(3, bool))) == 0.0
        # beta smooth l1: |d|<beta → .5 d^2/beta else |d|-.5beta, sum/numel
        inp = jnp.asarray([[0.5, 2.0], [9.0, 9.0]])
        tgt = jnp.zeros((2, 2))
        mask = jnp.asarray([True, False])
        got = float(beta_smooth_l1(inp, tgt, 1.0, mask))
        want = (0.5 * 0.25 + (2.0 - 0.5)) / 2
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestRPN:
    def test_label_anchors_rules(self):
        anchors = jnp.asarray([
            [0, 0, 10, 10],      # IoU 1 with gt0 → fg (>=.7)
            [0, 0, 9, 10],       # IoU .82 → fg
            [50, 50, 60, 60],    # IoU 0 → bg
            [-5, 0, 10, 10],     # outside → -1
            [3, 3, 14, 14],      # IoU .28 (<.3) → bg
            [2, 2, 13, 13],      # IoU .42 → ignore (-1)
        ], jnp.float32)
        gt = jnp.asarray([[0., 0, 10, 10]])
        labels, assign = label_anchors(anchors, gt, jnp.ones(1, bool),
                                       100, 100)
        assert labels.tolist() == [1, 1, 0, -1, 0, -1]
        assert assign.tolist() == [0] * 6

    def test_gt_argmax_addition(self):
        # no anchor reaches .7, but the best one gets labeled fg
        anchors = jnp.asarray([[0., 0, 20, 20], [30, 30, 50, 50]])
        gt = jnp.asarray([[0., 0, 10, 10]])
        labels, _ = label_anchors(anchors, gt, jnp.ones(1, bool), 100, 100)
        assert labels[0] == 1   # argmax addition (iou .25 > 0)

    def test_padded_gt_ignored(self):
        anchors = jnp.asarray([[0., 0, 10, 10]])
        gt = jnp.asarray([[0., 0, 10, 10], [0, 0, 10, 10]])
        valid = jnp.asarray([False, True])
        labels, assign = label_anchors(anchors, gt, valid, 100, 100)
        assert labels[0] == 1 and assign[0] == 1  # matched the VALID gt

    def test_generate_proposals_static(self):
        anchors = jnp.asarray([[0., 0, 10, 10], [1, 1, 11, 11],
                               [40, 40, 60, 60]], jnp.float32)
        obj = jnp.asarray([[0., 5], [0, 4], [0, 3]])
        deltas = jnp.zeros((3, 4))
        boxes, valid = generate_proposals(anchors, obj, deltas, 100, 100,
                                          3, 4)
        # first two overlap at +1 IoU 100/142 >= .7 → second suppressed
        assert valid.tolist() == [True, True, False, False]
        np.testing.assert_allclose(np.asarray(boxes[0]), [0, 0, 10, 10])
        np.testing.assert_allclose(np.asarray(boxes[1]), [40, 40, 60, 60])
        np.testing.assert_allclose(np.asarray(boxes[3]), 0)  # zero-padded


class TestRoiTargets:
    def test_labels_and_padding_bg(self):
        props = jnp.asarray([[0., 0, 10, 10], [50, 50, 60, 60],
                             [0, 0, 0, 0]], jnp.float32)  # zero pad slot
        gt = jnp.asarray([[0., 0, 10, 10]])
        cls = jnp.asarray([7])
        tgt = roi_targets(jax.random.PRNGKey(0), props, gt, cls,
                          jnp.ones(1, bool), num_samples=3, fg_cap=2)
        fg_slots = np.asarray(tgt.sample.is_fg)
        # exactly one fg (proposal 0, class 7)
        assert fg_slots.sum() == 1
        assert int(tgt.gt_classes[np.nonzero(fg_slots)[0][0]]) == 7


class TestVocEval:
    def test_perfect_detections_ap1(self):
        from afan.eval.det_map import evaluate_detections
        gt = {"img0": (np.asarray([[10., 10, 50, 50]]), np.asarray([1]),
                       np.asarray([False])),
              "img1": (np.asarray([[20., 20, 60, 60]]), np.asarray([1]),
                       np.asarray([False]))}
        mean_ap, aps = evaluate_detections(
            3, gt, ["img0", "img1"],
            np.asarray([[10., 10, 50, 50], [20, 20, 60, 60]]),
            np.asarray([1, 1]), np.asarray([0.9, 0.8]))
        # class 1 perfect (11-pt AP=1), class 2 has no dets and no gt → 0
        assert aps[1] == pytest.approx(1.0, abs=1e-6)

    def test_duplicate_detection_is_fp(self):
        from afan.eval.det_map import evaluate_detections
        # 2 gts; middle det duplicates gt0 → FP between the two TPs, so
        # precision at full recall is 2/3 and the 11-pt AP drops below 1
        gt = {"img0": (np.asarray([[10., 10, 50, 50], [100., 100, 150, 150]]),
                       np.asarray([1, 1]), np.asarray([False, False]))}
        mean_ap, aps = evaluate_detections(
            2, gt, ["img0", "img0", "img0"],
            np.asarray([[10., 10, 50, 50], [11, 11, 50, 50],
                        [100, 100, 150, 150]]),
            np.asarray([1, 1, 1]), np.asarray([0.9, 0.8, 0.7]))
        assert aps[1] == pytest.approx((6 * 1.0 + 5 * 2 / 3) / 11, abs=1e-6)

    def test_difficult_neutral(self):
        from afan.eval.det_map import evaluate_detections
        gt = {"img0": (np.asarray([[10., 10, 50, 50]]), np.asarray([1]),
                       np.asarray([True]))}   # difficult gt
        mean_ap, aps = evaluate_detections(
            2, gt, ["img0"], np.asarray([[10., 10, 50, 50]]),
            np.asarray([1]), np.asarray([0.9]))
        # matching a difficult gt: neither tp nor fp; npos=0 → AP 0
        assert aps[1] == 0.0


class TestDetectionStepTiny:
    def test_sd_only_step(self):
        """Legacy `py/train_aug_single_sd.py` family: SD attack with NO
        SE taps (taps_se=()) — the step must skip the spectrum and still
        train."""
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
        acfg = DetAfanConfig(taps_se=(), gammas_se=(), sd="roi",
                             mix_sd=True)
        step = make_afan_det_step(m, tx, acfg)
        state, metrics = step(state, imgs, gtb, gtc, gtv,
                              jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_spectrum"]) == 0.0
        assert float(metrics["loss_sd"]) > 0.0

    def test_afan_step_and_detect(self):
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                            make_afan_det_step,
                                            make_detect_fn)
        from afan.train.loop import TrainState
        cfg = FRCNNConfig(backbone="resnet18", num_classes=4,
                          train_pre_nms_top_n=128, train_post_nms_top_n=32,
                          eval_pre_nms_top_n=64, eval_post_nms_top_n=8,
                          roi_samples=8, roi_fg_cap=2, rpn_samples=16,
                          rpn_fg_cap=8, anchor_sizes=(32, 64))
        m = FasterRCNN(cfg=cfg)
        imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                           jnp.float32)
        gtb = jnp.asarray([[[8., 8, 40, 40], [0, 0, 0, 0]]])
        gtc = jnp.asarray([[2, 0]], jnp.int32)
        gtv = jnp.asarray([[True, False]])
        vs = m.init({"params": jax.random.PRNGKey(0)}, imgs, gtb, gtc, gtv,
                    jax.random.PRNGKey(1), method=m.losses)
        tx = detection_tx(lambda c: 0.001)
        state = TrainState.create(vs, tx)
        acfg = DetAfanConfig(taps_se=(2,), spectrum=3, mix_mask=(0, 1, 0),
                             sd="roi", mix_sd=True)
        step = make_afan_det_step(m, tx, acfg)
        state, metrics = step(state, imgs, gtb, gtc, gtv,
                              jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        # frozen layer1
        a = vs["params"]["backbone"]["layer1"]["block0"]["conv1"]["kernel"]
        b = state.params["backbone"]["layer1"]["block0"]["conv1"]["kernel"]
        assert bool(jnp.allclose(a, b))
        boxes, probs, keep = make_detect_fn(m)(state, imgs)
        assert boxes.shape == (1, 8, 4, 4)
        assert keep.dtype == jnp.bool_
