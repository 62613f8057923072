"""Tests: torch checkpoint interop + the self-contained COCO-protocol AP."""
import numpy as np
import pytest


class TestCocoAP:
    def test_perfect_detections(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = {"a": (np.asarray([[0., 0, 10, 10], [20, 20, 40, 40]]),
                    np.asarray([1, 2]))}
        ap = coco_bbox_ap(3, gt, ["a", "a"],
                          np.asarray([[0., 0, 10, 10], [20, 20, 40, 40]]),
                          np.asarray([1, 2]), np.asarray([0.9, 0.9]))
        assert ap["AP"] == pytest.approx(1.0, abs=1e-6)
        assert ap["AP50"] == pytest.approx(1.0, abs=1e-6)

    def test_loose_box_passes_50_fails_75(self):
        from afan.eval.coco_map import coco_bbox_ap
        # IoU ≈ 0.58: TP at 0.5/0.55, FP at 0.6+
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        ap = coco_bbox_ap(2, gt, ["a"], np.asarray([[0., 0, 10, 7.3]]),
                          np.asarray([1]), np.asarray([0.9]))
        assert ap["AP50"] == pytest.approx(1.0, abs=1e-6)
        assert ap["AP75"] == 0.0
        assert 0.0 < ap["AP"] < 1.0

    def test_missing_class_skipped(self):
        from afan.eval.coco_map import coco_bbox_ap
        # class 2 has no gt anywhere → excluded from the mean (COCOeval -1)
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        ap = coco_bbox_ap(3, gt, ["a"], np.asarray([[0., 0, 10, 10]]),
                          np.asarray([1]), np.asarray([0.9]))
        assert ap["AP"] == pytest.approx(1.0, abs=1e-6)

    def test_ranking_matters(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        # high-scored FP above the TP → precision at recall 1 is 1/2
        ap = coco_bbox_ap(2, gt, ["a", "a"],
                          np.asarray([[50., 50, 60, 60], [0, 0, 10, 10]]),
                          np.asarray([1, 1]), np.asarray([0.9, 0.5]))
        assert ap["AP50"] < 1.0


class TestCocoSummary12:
    """The full COCOeval summarize() surface: area ranges + maxDets
    (`Detection/dataset/coco2017.py:160-171` prints all 12 metrics)."""

    def _two_scale_case(self):
        # one small gt (10x10=100 < 32^2) and one large gt
        # (120x120=14400 > 96^2), both detected exactly
        gt = {"a": (np.asarray([[0., 0, 10, 10], [200, 200, 320, 320]]),
                    np.asarray([1, 1]))}
        det_boxes = np.asarray([[0., 0, 10, 10], [200, 200, 320, 320]])
        return gt, det_boxes

    def test_area_range_slices(self):
        from afan.eval.coco_map import coco_eval_summary
        gt, det = self._two_scale_case()
        res = coco_eval_summary(2, gt, ["a", "a"], det,
                                np.asarray([1, 1]), np.asarray([0.9, 0.8]))
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        assert res["APs"] == pytest.approx(1.0, abs=1e-6)
        assert res["APl"] == pytest.approx(1.0, abs=1e-6)
        assert res["APm"] == -1.0  # no medium gt anywhere → COCOeval -1
        assert res["ARs"] == pytest.approx(1.0, abs=1e-6)
        assert res["ARl"] == pytest.approx(1.0, abs=1e-6)
        assert res["ARm"] == -1.0

    def test_maxdets_recall_caps(self):
        from afan.eval.coco_map import coco_eval_summary
        gt, det = self._two_scale_case()
        res = coco_eval_summary(2, gt, ["a", "a"], det,
                                np.asarray([1, 1]), np.asarray([0.9, 0.8]))
        # with maxDets=1 only the top-scored det counts → recall 1/2
        assert res["AR1"] == pytest.approx(0.5, abs=1e-6)
        assert res["AR10"] == pytest.approx(1.0, abs=1e-6)
        assert res["AR100"] == pytest.approx(1.0, abs=1e-6)

    def test_det_matched_to_out_of_range_gt_is_ignored(self):
        from afan.eval.coco_map import coco_eval_summary
        # a large gt + its exact detection must not count as FP in the
        # small-area slice (it is matched to an ignored gt); a small gt
        # missed entirely drives APs to 0
        gt = {"a": (np.asarray([[0., 0, 10, 10], [200, 200, 320, 320]]),
                    np.asarray([1, 1]))}
        res = coco_eval_summary(
            2, gt, ["a"], np.asarray([[200., 200, 320, 320]]),
            np.asarray([1]), np.asarray([0.9]))
        assert res["APs"] == 0.0
        assert res["APl"] == pytest.approx(1.0, abs=1e-6)

    def test_unmatched_out_of_range_det_ignored(self):
        from afan.eval.coco_map import coco_eval_summary
        # small-area slice: a spurious LARGE detection is outside the
        # range → ignored, so the small gt's perfect detection keeps AP 1
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        res = coco_eval_summary(
            2, gt, ["a", "a"],
            np.asarray([[0., 0, 10, 10], [400., 400, 520, 520]]),
            np.asarray([1, 1]), np.asarray([0.5, 0.9]))
        assert res["APs"] == pytest.approx(1.0, abs=1e-6)
        # in the 'all' slice the same spurious det is a high-scored FP
        assert res["AP"] < 1.0

    def test_formatter_has_12_lines(self):
        from afan.eval.coco_map import coco_eval_summary, format_coco_summary
        gt, det = self._two_scale_case()
        res = coco_eval_summary(2, gt, ["a", "a"], det,
                                np.asarray([1, 1]), np.asarray([0.9, 0.8]))
        text = format_coco_summary(res)
        assert len(text.splitlines()) == 12
        assert "maxDets=  1" in text and "area= small" in text


class TestCocoProtocolEdges:
    """The COCOeval behaviors hardest to get right without a pycocotools
    oracle: per-image maxDets truncation order and score-tie stability."""

    def test_maxdets_truncates_per_image_by_score(self):
        from afan.eval.coco_map import coco_eval_summary
        # image a: 2 gt, detections = 1 junk FP at score .95 plus 2
        # perfect TPs at .5/.4. AR@1 keeps only the top-scored det of the
        # image (the FP) -> recall 0; AR@10 keeps all -> recall 1.
        gt = {"a": (np.asarray([[0., 0, 10, 10], [20., 20, 30, 30]]),
                    np.asarray([1, 1]))}
        res = coco_eval_summary(
            2, gt, ["a", "a", "a"],
            np.asarray([[50., 50, 60, 60], [0., 0, 10, 10],
                        [20., 20, 30, 30]]),
            np.asarray([1, 1, 1]), np.asarray([0.95, 0.5, 0.4]))
        assert res["AR1"] == 0.0
        assert res["AR10"] == pytest.approx(1.0, abs=1e-6)

    def test_maxdets_is_per_image_not_global(self):
        from afan.eval.coco_map import coco_eval_summary
        # image a: 1 junk det at .9; image b: its own det at .1 matching
        # its gt. A GLOBAL maxDets=1 would drop b's det (lower score);
        # COCOeval truncates per image, so b keeps recall 1.
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1])),
              "b": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        res = coco_eval_summary(
            2, gt, ["a", "b"],
            np.asarray([[50., 50, 60, 60], [0., 0, 10, 10]]),
            np.asarray([1, 1]), np.asarray([0.9, 0.1]))
        assert res["AR1"] == pytest.approx(0.5, abs=1e-6)  # a misses, b hits

    def test_trailing_fp_forgiven_by_envelope(self):
        from afan.eval.coco_map import coco_eval_summary
        # Two dets with EQUAL scores on one gt: one matches (TP), the
        # other double-matches (FP). Because the FP lands AFTER full
        # recall is reached, COCOeval's precision envelope (max precision
        # at recall >= r) keeps AP at 1.0 — trailing FPs past the last TP
        # do not lower interpolated AP. Tie-break jitter cannot change
        # this: either order yields the same (recall, precision) steps.
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        res = coco_eval_summary(
            2, gt, ["a", "a"],
            np.asarray([[0., 0, 10, 10], [0., 0, 10, 9.9]]),
            np.asarray([1, 1]), np.asarray([0.7, 0.7]))
        assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
        assert res["AR100"] == pytest.approx(1.0, abs=1e-6)

    def test_leading_fp_halves_ap(self):
        from afan.eval.coco_map import coco_eval_summary
        # Contrast case: the FP outranks the TP, so the first PR step is
        # (recall 0, precision 0) and the envelope at every recall is the
        # second step's precision 1/2 -> AP50 = 0.5. FPs before the last
        # TP DO hurt.
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        res = coco_eval_summary(
            2, gt, ["a", "a"],
            np.asarray([[50., 50, 60, 60], [0., 0, 10, 10]]),
            np.asarray([1, 1]), np.asarray([0.9, 0.5]))
        assert res["AP50"] == pytest.approx(0.5, abs=1e-2)
        assert res["AR100"] == pytest.approx(1.0, abs=1e-6)


class TestCocoCrowd:
    """iscrowd gt are ignore regions under the crowd-modified IoU
    (inter/area_det), per pycocotools COCOeval as run by
    `Detection/dataset/coco2017.py:160-171`."""

    def _base(self):
        # one valid gt, perfectly detected at score .9
        gt = {"a": (np.asarray([[0., 0, 10, 10]]), np.asarray([1]))}
        return gt

    def test_det_over_crowd_neither_tp_nor_fp(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = self._base()
        crowd = {"a": (np.asarray([[100., 100, 200, 200]]),
                       np.asarray([1]))}
        # second det sits fully inside the crowd region: ignored → AP
        # stays perfect despite the "extra" detection
        res = coco_bbox_ap(2, gt, ["a", "a"],
                           np.asarray([[0., 0, 10, 10],
                                       [120., 120, 140, 140]]),
                           np.asarray([1, 1]), np.asarray([0.9, 0.95]),
                           crowd=crowd)
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        # contrast: without the crowd info the same det is a top-scored FP
        res_no = coco_bbox_ap(2, gt, ["a", "a"],
                              np.asarray([[0., 0, 10, 10],
                                          [120., 120, 140, 140]]),
                              np.asarray([1, 1]), np.asarray([0.9, 0.95]))
        assert res_no["AP"] < 1.0

    def test_crowd_iou_is_inter_over_det_area(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = self._base()
        # 20x20 det inside a 100x100 crowd: standard IoU = 400/10000 =
        # 0.04 (no match), crowd IoU = 400/400 = 1.0 (ignored). This is
        # exactly what distinguishes the crowd formula.
        crowd = {"a": (np.asarray([[100., 100, 200, 200]]),
                       np.asarray([1]))}
        res = coco_bbox_ap(2, gt, ["a", "a"],
                           np.asarray([[0., 0, 10, 10],
                                       [150., 150, 170, 170]]),
                           np.asarray([1, 1]), np.asarray([0.9, 0.95]),
                           crowd=crowd)
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)

    def test_crowd_never_counts_in_npos(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = self._base()
        # an undetected crowd gt must not depress recall
        crowd = {"a": (np.asarray([[100., 100, 200, 200]]),
                       np.asarray([1]))}
        res = coco_bbox_ap(2, gt, ["a"], np.asarray([[0., 0, 10, 10]]),
                           np.asarray([1]), np.asarray([0.9]), crowd=crowd)
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        assert res["AR100"] == pytest.approx(1.0, abs=1e-6)

    def test_crowd_absorbs_multiple_dets(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = self._base()
        # pycocotools skips a matched gt only when NOT iscrowd — one crowd
        # region may swallow any number of detections
        crowd = {"a": (np.asarray([[100., 100, 200, 200]]),
                       np.asarray([1]))}
        res = coco_bbox_ap(2, gt, ["a", "a", "a"],
                           np.asarray([[0., 0, 10, 10],
                                       [110., 110, 130, 130],
                                       [150., 150, 180, 180]]),
                           np.asarray([1, 1, 1]),
                           np.asarray([0.9, 0.95, 0.93]), crowd=crowd)
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)

    def test_crowd_is_per_class(self):
        from afan.eval.coco_map import coco_bbox_ap
        gt = {"a": (np.asarray([[0., 0, 10, 10], [0., 20, 10, 30]]),
                    np.asarray([1, 2]))}
        # class-2 crowd does NOT shelter a class-1 detection
        crowd = {"a": (np.asarray([[100., 100, 200, 200]]),
                       np.asarray([2]))}
        res = coco_bbox_ap(3, gt, ["a", "a", "a"],
                           np.asarray([[0., 0, 10, 10],
                                       [0., 20, 10, 30],
                                       [120., 120, 140, 140]]),
                           np.asarray([1, 2, 1]),
                           np.asarray([0.9, 0.9, 0.95]), crowd=crowd)
        assert res["AP"] < 1.0  # the class-1 det over it is a real FP

    def test_valid_gt_preferred_over_crowd(self):
        from afan.eval.coco_map import coco_bbox_ap
        # a det overlapping BOTH a valid gt (IoU .5+) and a crowd region
        # must match the valid gt (TP), not vanish into the crowd
        gt = self._base()
        crowd = {"a": (np.asarray([[0., 0, 50, 50]]), np.asarray([1]))}
        res = coco_bbox_ap(2, gt, ["a"], np.asarray([[0., 0, 10, 10]]),
                           np.asarray([1]), np.asarray([0.9]), crowd=crowd)
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        assert res["AR100"] == pytest.approx(1.0, abs=1e-6)


class TestCocoLoader:
    def test_parse_json(self, tmp_path):
        import json
        from afan.data.coco import load_coco_samples
        ann = {
            "images": [{"id": 7, "file_name": "x.jpg", "width": 100,
                        "height": 80}],
            "annotations": [
                {"image_id": 7, "category_id": 3, "bbox": [10, 10, 20, 30],
                 "iscrowd": 0},
                {"image_id": 7, "category_id": 1, "bbox": [0, 0, 5, 5],
                 "iscrowd": 1},  # crowd → not a training target
            ],
            "categories": [],
        }
        path = tmp_path / "inst.json"
        path.write_text(json.dumps(ann))
        samples, nc = load_coco_samples(str(path), "/img")
        assert nc == 92 and len(samples) == 1
        s = samples[0]
        np.testing.assert_allclose(s.boxes, [[10, 10, 30, 40]])
        assert s.labels.tolist() == [3]
        # the crowd gt survives as an eval-time ignore region
        np.testing.assert_allclose(s.crowd_boxes, [[0, 0, 5, 5]])
        assert s.crowd_labels.tolist() == [1]

    def test_crowd_only_image_skipped(self, tmp_path):
        import json
        from afan.data.coco import load_coco_samples
        ann = {"images": [{"id": 1, "file_name": "a.jpg", "width": 50,
                           "height": 50}],
               "annotations": [
                   {"image_id": 1, "category_id": 2, "bbox": [0, 0, 10, 10],
                    "iscrowd": 1}],
               "categories": []}
        path = tmp_path / "inst.json"
        path.write_text(json.dumps(ann))
        samples, _ = load_coco_samples(str(path), "/img")
        assert samples == []  # no non-crowd objects → not a training image

    def test_subset_remap(self, tmp_path):
        import json
        from afan.data.coco import load_coco_samples, ANIMAL_IDS
        ann = {"images": [{"id": 1, "file_name": "a.jpg", "width": 50,
                           "height": 50}],
               "annotations": [
                   {"image_id": 1, "category_id": 17, "bbox": [0, 0, 10, 10],
                    "iscrowd": 0},      # cat → subset label 2
                   {"image_id": 1, "category_id": 3, "bbox": [0, 0, 9, 9],
                    "iscrowd": 0}],     # car → dropped in animal subset
               "categories": []}
        path = tmp_path / "inst.json"
        path.write_text(json.dumps(ann))
        samples, nc = load_coco_samples(str(path), "/img", ANIMAL_IDS)
        assert nc == 11
        assert samples[0].labels.tolist() == [2]

    def test_pickle_cache_roundtrip(self, tmp_path):
        import json
        from afan.data.coco import load_coco_samples
        ann = {"images": [{"id": 1, "file_name": "a.jpg", "width": 50,
                           "height": 50}],
               "annotations": [
                   {"image_id": 1, "category_id": 2, "bbox": [0, 0, 10, 10],
                    "iscrowd": 0}],
               "categories": []}
        path = tmp_path / "inst.json"
        path.write_text(json.dumps(ann))
        s1, nc1 = load_coco_samples(str(path), "/img")
        caches = list(tmp_path.glob("*.afan_cache_*.pkl"))
        assert len(caches) == 1
        # second load comes from the cache and matches
        s2, nc2 = load_coco_samples(str(path), "/img")
        assert nc2 == nc1 and len(s2) == len(s1)
        np.testing.assert_array_equal(s2[0].boxes, s1[0].boxes)
        # rewriting the json invalidates the cache (mtime check)
        import os as _os
        _os.utime(str(path), None)
        ann["annotations"][0]["bbox"] = [5, 5, 10, 10]
        path.write_text(json.dumps(ann))
        s3, _ = load_coco_samples(str(path), "/img")
        np.testing.assert_allclose(s3[0].boxes, [[5, 5, 15, 15]])


class TestTorchInterop:
    def test_resnet_s_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        import jax, jax.numpy as jnp
        from afan.interop.torch_ckpt import load_torch_resnet_s
        from afan.models.resnet_s import ResNetS

        # synthesize a torch state dict with the reference's key layout
        # for a tiny (1,1,1) ResNet-s
        rng = np.random.RandomState(0)
        sd = {}
        sd["sequential_model.1.weight"] = torch.tensor(
            rng.randn(16, 3, 3, 3).astype(np.float32))
        for pre, ch in [("sequential_model.2", 16)]:
            sd[f"{pre}.weight"] = torch.ones(ch)
            sd[f"{pre}.bias"] = torch.zeros(ch)
            sd[f"{pre}.running_mean"] = torch.zeros(ch)
            sd[f"{pre}.running_var"] = torch.ones(ch)
        chans = [16, 32, 64]
        ins = [16, 16, 32]
        for b in range(3):
            idx = 4 + b
            sd[f"sequential_model.{idx}.conv1.weight"] = torch.tensor(
                rng.randn(chans[b], ins[b], 3, 3).astype(np.float32))
            sd[f"sequential_model.{idx}.conv2.weight"] = torch.tensor(
                rng.randn(chans[b], chans[b], 3, 3).astype(np.float32))
            for bn in ("bn1", "bn2"):
                pre = f"sequential_model.{idx}.{bn}"
                sd[f"{pre}.weight"] = torch.ones(chans[b])
                sd[f"{pre}.bias"] = torch.zeros(chans[b])
                sd[f"{pre}.running_mean"] = torch.zeros(chans[b])
                sd[f"{pre}.running_var"] = torch.ones(chans[b])
        sd["sequential_model.9.weight"] = torch.tensor(
            rng.randn(10, 64).astype(np.float32))
        sd["sequential_model.9.bias"] = torch.zeros(10)
        sd["w"] = torch.full((9,), 1.0 / 9)
        path = tmp_path / "ckpt.pt"
        torch.save({"state_dict": sd}, str(path))

        params, stats, frac = load_torch_resnet_s(str(path),
                                                  num_blocks=(1, 1, 1))
        assert frac == 1.0
        # the converted tree must drop into the flax model and run
        m = ResNetS(num_blocks=(1, 1, 1))
        x = jnp.zeros((2, 32, 32, 3))
        init = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        from afan.train.checkpoint import overlap_restore
        merged, mfrac = overlap_restore(init["params"], params)
        assert mfrac == 1.0  # every init leaf found a converted leaf
        out = m.apply({"params": merged, "batch_stats": stats},
                      x, 0, None, False)
        assert out.shape == (2, 10)
