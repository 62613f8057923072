"""Property tests for the full paired-transform library
(`Segmentation/utils/ext_transforms.py` parity surface)."""
import numpy as np
import pytest

from afan.data.ext_transforms import (ExtCenterCrop, ExtColorJitter,
                                      ExtCompose, ExtLambda, ExtNormalize,
                                      ExtPad, ExtRandomCrop,
                                      ExtRandomHorizontalFlip,
                                      ExtRandomRotation, ExtRandomScale,
                                      ExtRandomVerticalFlip, ExtResize,
                                      ExtScale, ExtToTensor, IGNORE)


def _pair(h=40, w=60, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h, w, 3).astype(np.float32)
    lab = rng.randint(0, 21, (h, w)).astype(np.int32)
    return img, lab


class TestGeometric:
    def test_hflip_pairs(self):
        img, lab = _pair()
        rng = np.random.RandomState(0)
        fi, fl = ExtRandomHorizontalFlip(p=1.1)(img, lab, rng)
        np.testing.assert_array_equal(fi, img[:, ::-1])
        np.testing.assert_array_equal(fl, lab[:, ::-1])
        ni, nl = ExtRandomHorizontalFlip(p=-0.1)(img, lab, rng)
        np.testing.assert_array_equal(ni, img)

    def test_vflip_pairs(self):
        img, lab = _pair()
        fi, fl = ExtRandomVerticalFlip(p=1.1)(img, lab,
                                              np.random.RandomState(0))
        np.testing.assert_array_equal(fi, img[::-1])
        np.testing.assert_array_equal(fl, lab[::-1])

    def test_center_crop(self):
        img, lab = _pair(41, 61)
        ci, cl = ExtCenterCrop(20)(img, lab, np.random.RandomState(0))
        assert ci.shape == (20, 20, 3) and cl.shape == (20, 20)
        np.testing.assert_array_equal(cl, lab[10:30, 20:40])

    def test_random_scale_label_nearest(self):
        img, lab = _pair()
        si, sl = ExtRandomScale((1.5, 1.5))(img, lab,
                                            np.random.RandomState(0))
        assert si.shape == (60, 90, 3) and sl.shape == (60, 90)
        assert set(np.unique(sl)) <= set(np.unique(lab))

    def test_scale_fixed(self):
        img, lab = _pair(40, 60)
        si, sl = ExtScale(0.5)(img, lab, np.random.RandomState(0))
        assert sl.shape == (20, 30)

    def test_resize_short_side_and_pair(self):
        img, lab = _pair(40, 60)
        ri, rl = ExtResize(20)(img, lab, np.random.RandomState(0))
        assert rl.shape == (20, 30)          # short side matched
        ri, rl = ExtResize((25, 33))(img, lab, np.random.RandomState(0))
        assert ri.shape == (25, 33, 3) and rl.shape == (25, 33)

    def test_rotation_labels_stay_valid(self):
        img, lab = _pair()
        lab = lab + 1  # no class 0, so fill is detectable
        ri, rl = ExtRandomRotation(30)(img, lab, np.random.RandomState(3))
        assert rl.shape == lab.shape
        # nearest resample: no new label values except the fill (0)
        assert set(np.unique(rl)) <= set(np.unique(lab)) | {0}
        ri2, rl2 = ExtRandomRotation(30, label_fill=IGNORE)(
            img, lab, np.random.RandomState(3))
        assert set(np.unique(rl2)) <= set(np.unique(lab)) | {IGNORE}

    def test_pad_divisor(self):
        img, lab = _pair(33, 50)
        pi, pl = ExtPad(32)(img, lab, np.random.RandomState(0))
        assert pi.shape[0] % 32 == 0 and pi.shape[1] % 32 == 0
        assert pl.shape == pi.shape[:2]
        assert (pl == IGNORE).sum() > 0  # padded rows are ignore
        same_i, same_l = ExtPad(1)(img, lab, np.random.RandomState(0))
        np.testing.assert_array_equal(same_i, img)

    def test_random_crop_pad_if_needed(self):
        img, lab = _pair(10, 12)
        ci, cl = ExtRandomCrop(16, pad_if_needed=True)(
            img, lab, np.random.RandomState(0))
        assert ci.shape == (16, 16, 3) and cl.shape == (16, 16)
        assert (cl == IGNORE).sum() > 0

    def test_random_crop_fixed_padding(self):
        img, lab = _pair(20, 20)
        ci, cl = ExtRandomCrop(24, padding=2)(img, lab,
                                              np.random.RandomState(0))
        assert cl.shape == (24, 24)


class TestPhotometric:
    def test_color_jitter_range_and_label_untouched(self):
        img, lab = _pair()
        ji, jl = ExtColorJitter(0.5, 0.5, 0.5, 0.2)(
            img, lab, np.random.RandomState(1))
        assert ji.min() >= 0.0 and ji.max() <= 1.0
        np.testing.assert_array_equal(jl, lab)

    def test_color_jitter_identity_when_zero(self):
        img, lab = _pair()
        ji, _ = ExtColorJitter()(img, lab, np.random.RandomState(0))
        np.testing.assert_allclose(ji, np.clip(img, 0, 1), atol=1e-6)

    def test_hue_rotation_full_circle_identity(self):
        img, lab = _pair()
        out = ExtColorJitter._hue(img, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_normalize(self):
        img, lab = _pair()
        mean, std = [0.5, 0.4, 0.3], [0.2, 0.2, 0.2]
        ni, _ = ExtNormalize(mean, std)(img, lab, np.random.RandomState(0))
        np.testing.assert_allclose(
            ni, (img - np.asarray(mean, np.float32)) / 0.2, rtol=1e-5)

    def test_to_tensor_uint8(self):
        rng = np.random.RandomState(0)
        img8 = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        lab = rng.randint(0, 5, (8, 8))
        ti, tl = ExtToTensor()(img8, lab, rng)
        assert ti.dtype == np.float32 and ti.max() <= 1.0
        assert tl.dtype == np.int32

    def test_lambda_image_only(self):
        img, lab = _pair()
        li, ll = ExtLambda(lambda im: im * 0)(img, lab,
                                              np.random.RandomState(0))
        assert li.sum() == 0
        np.testing.assert_array_equal(ll, lab)


class TestCompose:
    def test_chain_deterministic_per_seed(self):
        img, lab = _pair()
        t = ExtCompose([ExtRandomScale((0.8, 1.2)),
                        ExtRandomCrop(24, pad_if_needed=True),
                        ExtRandomHorizontalFlip(),
                        ExtColorJitter(0.3, 0.3, 0.3)])
        a_i, a_l = t(img, lab, np.random.RandomState(5))
        b_i, b_l = t(img, lab, np.random.RandomState(5))
        np.testing.assert_array_equal(a_i, b_i)
        np.testing.assert_array_equal(a_l, b_l)
        assert a_i.shape == (24, 24, 3)

    @pytest.mark.parametrize("dataset", ["voc", "cityscapes"])
    def test_driver_pipelines(self, dataset):
        from afan.data.ext_transforms import (cityscapes_train_transform,
                                              voc_train_transform)
        img, lab = _pair(100, 80)
        t = (voc_train_transform(64) if dataset == "voc"
             else cityscapes_train_transform(64))
        oi, ol = t(img, lab, np.random.RandomState(0))
        assert oi.shape == (64, 64, 3) and ol.shape == (64, 64)
