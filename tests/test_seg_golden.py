"""Golden cross-checks for the segmentation metric protocol.

`afan/eval/seg_miou.py` ports the reference's streaming confusion-matrix
metrics (`Segmentation/metrics/stream_metrics.py:56-80`); these tests pit
it against a SECOND, independently-written implementation
(`tests/seg_oracle.py`, per-pixel TP/FP/FN counters, no numpy) on
hand-derived scenes and randomized multi-image streams exercising the
load-bearing edge cases together: the 255 ignore index, classes absent
from both gt and prediction (excluded from Mean IoU via NaN), classes
predicted but never in gt (IoU 0 but Mean-Acc-undefined), and multi-batch
accumulation through both the host and device update paths.
"""
import math

import numpy as np
import pytest

from afan.eval.seg_miou import StreamSegMetrics, confusion_matrix_jnp

from seg_oracle import oracle_seg_metrics


def _agree(scenes, n_classes, via_device=False):
    m = StreamSegMetrics(n_classes)
    for gt, pred in scenes:
        if via_device:
            import jax.numpy as jnp
            m.update_hist(confusion_matrix_jnp(
                jnp.asarray(gt)[None], jnp.asarray(pred)[None], n_classes))
        else:
            m.update(np.asarray(gt)[None], np.asarray(pred)[None])
    ours = m.get_results()
    ref = oracle_seg_metrics(scenes, n_classes)
    for key in ("Overall Acc", "Mean Acc", "FreqW Acc", "Mean IoU"):
        if math.isnan(ref[key]):
            assert math.isnan(ours[key]), key
        else:
            assert ours[key] == pytest.approx(ref[key], abs=1e-12), key
    for c, v in ref["Class IoU"].items():
        if math.isnan(v):
            assert math.isnan(ours["Class IoU"][c]), c
        else:
            assert ours["Class IoU"][c] == pytest.approx(v, abs=1e-12), c
    return ours


class TestSegGolden:
    def test_absent_class_excluded_from_mean_iou(self):
        # Class 2 appears in neither gt nor pred: Mean IoU averages the
        # two PRESENT classes only (0/0 -> NaN -> nanmean skips it).
        gt = np.asarray([[0, 0], [1, 1]])
        pred = np.asarray([[0, 1], [1, 1]])
        r = _agree([(gt, pred)], 3)
        # class0 iou 1/2, class1 iou 2/3, class2 undefined
        assert r["Mean IoU"] == pytest.approx((0.5 + 2 / 3) / 2)
        assert math.isnan(r["Class IoU"][2])

    def test_predicted_only_class_counts_zero_iou(self):
        # Class 1 never occurs in gt but IS predicted: IoU defined (=0),
        # so it DOES drag Mean IoU down; Mean Acc excludes it (no gt).
        gt = np.asarray([[0, 0], [0, 0]])
        pred = np.asarray([[0, 1], [0, 0]])
        r = _agree([(gt, pred)], 2)
        assert r["Class IoU"][1] == 0.0
        assert r["Mean IoU"] == pytest.approx((3 / 4 + 0.0) / 2)
        assert r["Mean Acc"] == pytest.approx(3 / 4)

    def test_ignore_pixels_drop_their_predictions(self):
        # An ignored pixel contributes nothing — not even a FP for the
        # class it predicted.
        gt = np.asarray([[255, 0], [0, 0]])
        pred = np.asarray([[1, 0], [0, 0]])
        r = _agree([(gt, pred)], 2)
        assert r["Overall Acc"] == pytest.approx(1.0)
        assert math.isnan(r["Class IoU"][1])

    @pytest.mark.parametrize("via_device", [False, True])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_randomized_streams(self, seed, via_device):
        rng = np.random.RandomState(seed)
        n_classes = 7
        scenes = []
        for _ in range(4):
            shape = (rng.randint(3, 9), rng.randint(3, 9))
            # bias labels to a subset so some classes are absent
            gt = rng.randint(0, 4, shape)
            gt[rng.rand(*shape) < 0.15] = 255
            pred = rng.randint(0, 6, shape)  # class 6 never predicted
            scenes.append((gt, pred))
        _agree(scenes, n_classes, via_device=via_device)

    @pytest.mark.slow
    def test_fuzz_sweep_100_streams(self):
        """Seeded 100-stream oracle sweep (VERDICT r4 #5), biased toward
        absent-class x predicted-only-class x ignore-255 interactions
        (gt restricted to a random class subset; heavy ignore masks;
        streams where some update is all-ignore). Disagreements report
        the failing seed for replay."""
        import pytest as _pytest
        for seed in range(500, 600):
            rng = np.random.RandomState(seed)
            n_classes = int(rng.randint(2, 10))
            gt_hi = int(rng.randint(1, n_classes + 1))      # absent tail
            pred_hi = int(rng.randint(1, n_classes + 1))
            ignore_p = float(rng.choice([0.0, 0.1, 0.5, 0.95]))
            scenes = []
            for _ in range(int(rng.randint(1, 6))):
                shape = (int(rng.randint(1, 12)), int(rng.randint(1, 12)))
                gt = rng.randint(0, gt_hi, shape)
                gt[rng.rand(*shape) < ignore_p] = 255
                pred = rng.randint(0, pred_hi, shape)
                scenes.append((gt, pred))
            try:
                _agree(scenes, n_classes)
            except AssertionError as e:
                _pytest.fail(
                    f"seg oracle disagreement at seed={seed} "
                    f"n_classes={n_classes} gt_hi={gt_hi} "
                    f"pred_hi={pred_hi} ignore_p={ignore_p}: {e}")
