"""Op parity tests: TPU (jit) NMS / ROIAlign vs the native C++ CPU oracles,
plus the reference's golden NMS regression fixtures
(`Detection/test/nms/test_nms.py:39-52`, data fixtures copied — 1934 boxes
kept at IoU 0.7)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.ops.native import nms_cpu, roi_align_cpu
from afan.ops.nms import nms_mask, nms_padded, pairwise_iou
from afan.ops.roi_align import pool_rois, roi_align

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def random_boxes(n, size=200.0, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * 60 + 1
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


class TestNMSReferenceCases:
    # the 4 cases of the reference unit test (`test_nms.py:21-52`)
    def test_single(self):
        idx, mask = nms_padded(jnp.asarray([[5., 5, 10, 10]]),
                               jnp.asarray([0.8]), 0.7, 1)
        assert mask.tolist() == [True] and idx.tolist() == [0]

    def test_small(self):
        boxes = jnp.asarray([[5., 5, 10, 10], [5, 5, 10, 10], [5, 5, 30, 30]])
        scores = jnp.asarray([0.6, 0.9, 0.4])
        keep = nms_mask(boxes, scores, 0.7)
        assert np.nonzero(np.asarray(keep))[0].tolist() == [1, 2]

    def test_golden_large(self):
        det = np.load(os.path.join(FIXTURES, "nms-large-input.npy"))
        boxes, scores = det[:, :4], det[:, 4]
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.7))
        kept = np.nonzero(keep)[0]
        assert len(kept) == 1934
        expect = np.load(os.path.join(FIXTURES, "nms-large-output.npy"))
        assert sorted(kept.tolist()) == sorted(expect.tolist())

    def test_golden_large_oracle(self):
        det = np.load(os.path.join(FIXTURES, "nms-large-input.npy"))
        kept = nms_cpu(det[:, :4], det[:, 4], 0.7)
        expect = np.load(os.path.join(FIXTURES, "nms-large-output.npy"))
        assert sorted(kept.tolist()) == sorted(expect.tolist())


class TestNMSParity:
    @pytest.mark.parametrize("n,seed", [(1, 0), (37, 1), (200, 2), (513, 3)])
    def test_matches_oracle(self, n, seed):
        boxes, scores = random_boxes(n, seed=seed)
        expect = set(nms_cpu(boxes, scores, 0.5).tolist())
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5))
        assert set(np.nonzero(keep)[0].tolist()) == expect

    def test_no_plus_one_convention(self):
        boxes, scores = random_boxes(100, seed=4)
        expect = set(nms_cpu(boxes, scores, 0.5, plus_one=False).tolist())
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, plus_one=False))
        assert set(np.nonzero(keep)[0].tolist()) == expect

    def test_valid_mask(self):
        boxes, scores = random_boxes(64, seed=5)
        valid = np.arange(64) < 40
        expect = set(nms_cpu(boxes[:40], scores[:40], 0.5).tolist())
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, valid=jnp.asarray(valid)))
        assert set(np.nonzero(keep)[0].tolist()) == expect
        assert not keep[40:].any()

    def test_padded_order_and_fill(self):
        boxes, scores = random_boxes(50, seed=6)
        idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                               0.5, 50)
        kept = np.asarray(idx)[np.asarray(mask)]
        # score-descending
        s = scores[kept]
        assert (np.diff(s) <= 1e-7).all()
        assert (np.asarray(idx)[~np.asarray(mask)] == -1).all()

    @pytest.mark.parametrize("n,post_n,seed", [(200, 50, 7), (80, 100, 8),
                                               (300, 300, 9)])
    def test_select_presorted_matches_padded(self, n, post_n, seed):
        """The proposal-path fast selection (cumsum rank instead of a
        second top_k) must produce byte-identical padded outputs."""
        from afan.ops.nms import nms_select_presorted
        boxes, scores = random_boxes(n, seed=seed)
        order = np.argsort(-scores)
        bs = jnp.asarray(boxes[order])
        ss = jnp.asarray(scores[order])
        idx, mask = nms_padded(bs, ss, 0.5, post_n)
        want = np.where(np.asarray(mask)[:, None],
                        np.asarray(bs)[np.asarray(idx)], 0.0)
        got, valid = nms_select_presorted(bs, 0.5, post_n)
        np.testing.assert_array_equal(np.asarray(got), want)
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(mask))

    def test_select_presorted_valid_mask(self):
        """Padded slots threaded via valid_sorted must not participate as
        real (0,0,0,0) boxes."""
        from afan.ops.nms import nms_select_presorted
        boxes, scores = random_boxes(60, seed=11)
        order = np.argsort(-scores)
        bs60 = boxes[order]
        # pad with garbage rows marked invalid
        bs = jnp.asarray(np.concatenate(
            [bs60, np.zeros((20, 4), np.float32)]))
        vs = jnp.asarray(np.arange(80) < 60)
        got, valid = nms_select_presorted(bs, 0.5, 40, valid_sorted=vs)
        want, want_valid = nms_select_presorted(jnp.asarray(bs60), 0.5, 40)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(valid),
                                      np.asarray(want_valid))


class TestIoU:
    def test_pairwise_matches_manual(self):
        a = jnp.asarray([[0., 0, 10, 10]])
        b = jnp.asarray([[5., 5, 15, 15], [20., 20, 30, 30]])
        got = np.asarray(pairwise_iou(a, b))
        # standard convention: inter 25, union 175
        np.testing.assert_allclose(got, [[25 / 175, 0.0]], rtol=1e-6)
        got1 = np.asarray(pairwise_iou(a, b, plus_one=True))
        # +1: inter 36, areas 121 each, union 206
        np.testing.assert_allclose(got1[0, 0], 36 / 206, rtol=1e-6)


class TestRoiAlign:
    def test_matches_oracle_static_grid(self):
        rng = np.random.RandomState(0)
        feat = rng.randn(2, 16, 20, 8).astype(np.float32)
        boxes = np.asarray([[10, 8, 150, 100], [0, 0, 310, 250],
                            [40, 40, 45, 45]], np.float32)
        bidx = np.asarray([0, 1, 0], np.int64)
        want = roi_align_cpu(feat, boxes, bidx, (7, 7), 1 / 16, 2)
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                   jnp.asarray(bidx), (7, 7), 1 / 16, 2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_adaptive_vs_static_divergence_is_bounded(self):
        # quantify the documented sampling-ratio divergence (module docstring)
        rng = np.random.RandomState(1)
        feat = rng.rand(1, 32, 32, 4).astype(np.float32)
        boxes = np.asarray([[0, 0, 400, 400]], np.float32)
        bidx = np.zeros(1, np.int64)
        adaptive = roi_align_cpu(feat, boxes, bidx, (14, 14), 1 / 16, 0)
        static = roi_align_cpu(feat, boxes, bidx, (14, 14), 1 / 16, 2)
        err = np.abs(adaptive - static).mean()
        assert err < 0.1  # smooth features -> small divergence

    def test_chunked_equals_unchunked(self):
        rng = np.random.RandomState(2)
        feat = rng.randn(1, 8, 8, 4).astype(np.float32)
        boxes = (rng.rand(10, 4) * 60).astype(np.float32)
        boxes[:, 2:] += boxes[:, :2] + 16
        bidx = np.zeros(10, np.int64)
        a = roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                      jnp.asarray(bidx), (7, 7), 1 / 16, 2, roi_chunk=4)
        b = roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                      jnp.asarray(bidx), (7, 7), 1 / 16, 2, roi_chunk=256)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_pool_rois_shape(self):
        feat = jnp.zeros((1, 16, 16, 8))
        boxes = jnp.asarray([[0., 0, 64, 64]])
        out = pool_rois(feat, boxes, jnp.zeros(1, jnp.int32))
        assert out.shape == (1, 7, 7, 8)

    def test_gradients_flow(self):
        import jax
        feat = jnp.ones((1, 8, 8, 2))
        boxes = jnp.asarray([[0., 0, 64, 64]])

        def f(feat):
            return roi_align(feat, boxes, jnp.zeros(1, jnp.int32),
                             (4, 4), 1 / 16, 2).sum()

        g = jax.grad(f)(feat)
        assert float(jnp.abs(g).sum()) > 0


class TestRoiPoolMax:
    """POOLING mode (`roi/pooler.py:24-33`): adaptive max pool of the
    integer ROI crop, checked against a literal numpy oracle."""

    @staticmethod
    def _oracle(feat, box, scale=1.0 / 16, out=(7, 7)):
        import math
        H, W = feat.shape[:2]
        x1 = int(min(max(round(box[0] * scale), 0), W))
        y1 = int(min(max(round(box[1] * scale), 0), H))
        x2 = int(min(max(round(box[2] * scale), 0), W))
        y2 = int(min(max(round(box[3] * scale), 0), H))
        w, h = max(x2 - x1, 1), max(y2 - y1, 1)
        crop = feat[y1:y1 + h, x1:x1 + w]
        ph, pw = out
        res = np.zeros((ph, pw, feat.shape[-1]), feat.dtype)
        for i in range(ph):
            for j in range(pw):
                ys, ye = math.floor(i * h / ph), math.ceil((i + 1) * h / ph)
                xs, xe = math.floor(j * w / pw), math.ceil((j + 1) * w / pw)
                res[i, j] = crop[ys:ye, xs:xe].max(axis=(0, 1))
        return res

    def test_matches_adaptive_max_pool(self):
        from afan.ops.roi_align import roi_pool_max
        rng = np.random.RandomState(0)
        feat = rng.randn(2, 38, 63, 8).astype(np.float32)
        # boxes in image coords (scale 1/16), varied sizes incl. tiny and
        # full-extent
        boxes = np.asarray([
            [0, 0, 1000, 600],        # whole image
            [100, 50, 500, 400],
            [33, 21, 70, 60],         # tiny crop (2-3 feature px)
            [900, 500, 1010, 620],    # clipped at the boundary
        ], np.float32)
        bidx = np.asarray([0, 1, 0, 1], np.int32)
        got = np.asarray(roi_pool_max(jnp.asarray(feat), jnp.asarray(boxes),
                                      jnp.asarray(bidx)))
        for r in range(len(boxes)):
            want = self._oracle(feat[bidx[r]], boxes[r])
            np.testing.assert_allclose(got[r], want, err_msg=f"roi {r}")

    def test_pool_rois_dispatch(self):
        from afan.ops.roi_align import pool_rois
        feat = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 4),
                           np.float32)
        boxes = jnp.asarray([[0.0, 0, 128, 128]])
        bidx = jnp.asarray([0], jnp.int32)
        out_a = pool_rois(feat, boxes, bidx, mode="align")
        out_p = pool_rois(feat, boxes, bidx, mode="pooling")
        assert out_a.shape == out_p.shape == (1, 7, 7, 4)
        with pytest.raises(ValueError):
            pool_rois(feat, boxes, bidx, mode="bogus")


class TestRoiAlignEinsum:
    """The MXU (separable-matmul) ROIAlign must equal the gather oracle."""

    def test_matches_gather_exactly(self):
        from afan.ops.roi_align import roi_align_einsum, roi_align_gather
        rng = np.random.RandomState(3)
        feat = rng.randn(3, 25, 40, 16).astype(np.float32)
        boxes = np.asarray([
            [0, 0, 640, 400],          # whole image
            [100, 50, 300, 350],
            [-40, -40, 90, 90],        # partially out of bounds
            [600, 380, 700, 500],      # clipped at far corner
            [33, 21, 35, 24],          # tiny
        ], np.float32)
        bidx = np.asarray([0, 1, 2, 0, 1], np.int32)
        a = roi_align_einsum(jnp.asarray(feat), jnp.asarray(boxes),
                             jnp.asarray(bidx), (14, 14), 1.0 / 16, 2)
        b = roi_align_gather(jnp.asarray(feat), jnp.asarray(boxes),
                             jnp.asarray(bidx), (14, 14), 1.0 / 16, 2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_no_cross_image_bleed(self):
        # identical box on two images whose features differ only in the
        # OTHER image must pool identically
        from afan.ops.roi_align import roi_align_einsum
        rng = np.random.RandomState(4)
        f1 = rng.randn(2, 10, 10, 4).astype(np.float32)
        f2 = f1.copy()
        f2[1] += 100.0  # poison image 1
        box = jnp.asarray([[0.0, 0, 160, 160]])
        zero = jnp.asarray([0], jnp.int32)
        a = roi_align_einsum(jnp.asarray(f1), box, zero, (7, 7))
        b = roi_align_einsum(jnp.asarray(f2), box, zero, (7, 7))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_grad_flows(self):
        from afan.ops.roi_align import roi_align_einsum
        feat = jnp.ones((1, 8, 8, 2))
        box = jnp.asarray([[0.0, 0, 64, 64]])

        def s(f):
            return jnp.sum(roi_align_einsum(f, box,
                                            jnp.zeros(1, jnp.int32), (7, 7)))
        g = jax.grad(s)(feat)
        assert float(jnp.sum(g)) > 0
