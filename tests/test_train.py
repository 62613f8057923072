"""Train-step tests: base / ALFA / learnable-eta on a tiny ResNet-s.

Mirrors the reference's implicit acceptance criteria (SURVEY.md §4): the
loss decreases on learnable data, the adversarial loss exceeds the clean
loss at the tapped feature, eta stays sum-to-one after projection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.models.resnet_s import ResNetS
from afan.train.loop import (
    AlfaConfig, LearnableConfig, TrainState, accuracy, cross_entropy,
    make_alfa_step, make_base_step, make_eval_step, make_learnable_step,
    sum_project,
)
from afan.train.optim import (
    learnable_tx, multistep_warmup_schedule, poly_schedule, sgd,
    warmup_multistep_schedule,
)


def tiny_model():
    return ResNetS(num_blocks=(1, 1, 1), num_classes=4)


def tiny_batch(n=8, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 4, n)
    # linearly separable-ish images: class-dependent mean
    x = rng.rand(n, 16, 16, 3) * 0.1 + y[:, None, None, None] * 0.25
    return jnp.asarray(x, jnp.float32), jnp.asarray(y)


@pytest.fixture(scope="module")
def model_state():
    m = tiny_model()
    x, _ = tiny_batch()
    vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
    return m, vs


class TestSchedules:
    def test_multistep_warmup(self):
        s = multistep_warmup_schedule(0.1, [100, 200], 0.1, warmup_steps=10)
        # warmup: step*max_lr/(warmup-1) (main_perturb.py:288-293)
        np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-9)
        np.testing.assert_allclose(float(s(9)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(50)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(150)), 0.01, rtol=1e-6)
        np.testing.assert_allclose(float(s(250)), 0.001, rtol=1e-6)

    def test_warmup_multistep_detection(self):
        # lr * gamma^k * (factor + (1-factor)*min(step/iters,1))
        # (Detection/extension/lr_scheduler.py:13-21)
        s = warmup_multistep_schedule(0.008, [6250, 8750], 0.1, 1 / 3, 500)
        np.testing.assert_allclose(float(s(0)), 0.008 / 3, rtol=1e-5)
        np.testing.assert_allclose(float(s(500)), 0.008, rtol=1e-5)
        np.testing.assert_allclose(float(s(7000)), 0.0008, rtol=1e-5)
        np.testing.assert_allclose(float(s(9000)), 0.00008, rtol=1e-5)

    def test_poly(self):
        s = poly_schedule(0.1, 1000, 0.9)
        np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(500)), 0.1 * 0.5 ** 0.9, rtol=1e-5)
        # reference PolyLR floors at min_lr=1e-6 (scheduler.py:4)
        np.testing.assert_allclose(float(s(1000)), 1e-6, rtol=1e-5)


class TestBaseStep:
    def test_loss_decreases(self, model_state):
        m, vs = model_state
        tx = sgd(lambda c: 0.05, momentum=0.9, weight_decay=5e-4)
        state = TrainState.create(vs, tx)
        step = make_base_step(m, tx)
        x, y = tiny_batch()
        losses = []
        for _ in range(8):
            state, metrics = step(state, x, y)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8


class TestAlfaStep:
    def test_step_runs_and_learns(self, model_state):
        m, vs = model_state
        tx = sgd(lambda c: 0.05, momentum=0.9, weight_decay=5e-4)
        state = TrainState.create(vs, tx)
        cfg = AlfaConfig(tap=5, steps=2, gamma=1.5 / 255, eps=2 / 255)
        step = make_alfa_step(m, tx, cfg)
        x, y = tiny_batch()
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, metrics = step(state, x, y, jax.random.fold_in(rng, i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        # PGD moved the feature: every element steps by +-gamma each of the
        # 2 steps, so per-element |delta| <= 2*gamma and L-inf > 0.
        assert float(metrics["pert_linf"]) > 0
        assert float(metrics["pert_linf"]) <= 2 * cfg.gamma + 1e-6

    def test_adv_loss_geq_clean_at_init(self, model_state):
        # the ascent maximizes the tail loss, so tail(adv) loss must be >=
        # tail(clean) loss for a fresh model
        m, vs = model_state
        x, y = tiny_batch()
        from afan.core.attack import pgd
        feat = m.apply(vs, x, 0, 5, True, mutable=["batch_stats"])[0]

        def tail_loss(f):
            logits = m.apply(vs, f, 5, 10, True, mutable=["batch_stats"])[0]
            return cross_entropy(logits, y)

        adv = pgd(tail_loss, feat, steps=3, gamma=0.01)
        assert float(tail_loss(adv)) >= float(tail_loss(feat))


class TestLearnableStep:
    def test_sum_project(self):
        w = jnp.asarray([0.5, 0.5, 0.5])
        np.testing.assert_allclose(float(jnp.sum(sum_project(w))), 1.0,
                                   rtol=1e-6)

    def test_step_runs_and_projects(self):
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4, init_weight=1 / 9)
        x, y = tiny_batch()
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        # the shared two-group factory (also used by the CLI, bench.py,
        # the multichip dryrun, and scripts/learnable_flops.py)
        tx = learnable_tx(lambda c: 0.05, w_lr=0.01)
        state = TrainState.create(vs, tx)
        cfg = LearnableConfig(taps=(2, 5, 7), steps=1, l1_coef=0.01)
        step = make_learnable_step(m, tx, cfg)
        state, metrics = step(state, x, y, jax.random.PRNGKey(2))
        # eta sums to one after projection (main_learnable.py:369-378)
        np.testing.assert_allclose(float(jnp.sum(state.params["w"])), 1.0,
                                   rtol=1e-5)
        assert metrics["pert_l2"].shape == (3,)
        state, _ = step(state, x, y, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(jnp.sum(state.params["w"])), 1.0,
                                   rtol=1e-5)


class TestEval:
    def test_eval_step(self, model_state):
        m, vs = model_state
        tx = sgd(lambda c: 0.1)
        state = TrainState.create(vs, tx)
        x, y = tiny_batch()
        out = make_eval_step(m)(state, x, y)
        assert 0.0 <= float(out["accuracy"]) <= 100.0
        assert int(out["count"]) == 8

    def test_accuracy_fn(self):
        logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        labels = jnp.asarray([0, 1, 1])
        np.testing.assert_allclose(float(accuracy(logits, labels)),
                                   100.0 * 2 / 3, rtol=1e-5)


class TestOptStateResume:
    """Full-fidelity resume (`Detection/model.py:189-217` persists the
    optimizer+scheduler): train 6 / checkpoint at 3 / resume must
    bit-match the uninterrupted run — momentum AND schedule position."""

    def test_bitmatch_resume(self, tmp_path, model_state):
        from afan.train.checkpoint import (load_checkpoint, overlap_restore,
                                           restore_opt_state,
                                           save_checkpoint)
        m, vs = model_state
        # milestone at step 4 → the LR DROPS between resume and finish,
        # so a schedule-count reset would show up in the final params
        tx = sgd(multistep_warmup_schedule(0.1, [4], 0.1, warmup_steps=2),
                 0.9, 5e-4)
        step = make_alfa_step(m, tx, AlfaConfig(tap=2, steps=2))
        x, y = tiny_batch()
        rngs = [jax.random.PRNGKey(100 + i) for i in range(6)]

        full = TrainState.create(vs, tx)
        for r in rngs:
            full, _ = step(full, x, y, r)

        half = TrainState.create(vs, tx)
        for r in rngs[:3]:
            half, _ = step(half, x, y, r)
        path = str(tmp_path / "ckpt.pt")
        save_checkpoint(path, {"params": half.params,
                               "batch_stats": half.batch_stats,
                               "opt_state": half.opt_state,
                               "step": int(half.step)})

        saved = load_checkpoint(path)
        resumed = TrainState.create(vs, tx)
        params, frac = overlap_restore(resumed.params, saved["params"])
        assert frac == 1.0
        opt, ok = restore_opt_state(resumed.opt_state, saved["opt_state"])
        assert ok
        resumed = resumed.replace(
            params=params, opt_state=opt,
            batch_stats=saved["batch_stats"],
            step=jnp.asarray(saved["step"], jnp.int32))
        for r in rngs[3:]:
            resumed, _ = step(resumed, x, y, r)

        for a, b in zip(jax.tree.leaves(full.params),
                        jax.tree.leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_without_opt_state_differs(self, model_state):
        # control: dropping momentum/schedule at resume measurably changes
        # the outcome — this is exactly the bug the payload fix closes
        m, vs = model_state
        tx = sgd(multistep_warmup_schedule(0.1, [4], 0.1, warmup_steps=2),
                 0.9, 5e-4)
        step = make_alfa_step(m, tx, AlfaConfig(tap=2, steps=2))
        x, y = tiny_batch()
        rngs = [jax.random.PRNGKey(100 + i) for i in range(6)]
        full = TrainState.create(vs, tx)
        for r in rngs:
            full, _ = step(full, x, y, r)
        broken = TrainState.create(vs, tx)
        for r in rngs[:3]:
            broken, _ = step(broken, x, y, r)
        stale = TrainState.create(vs, tx)  # fresh opt_state, kept params
        broken = stale.replace(params=broken.params,
                               batch_stats=broken.batch_stats)
        for r in rngs[3:]:
            broken, _ = step(broken, x, y, r)
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(full.params),
                                 jax.tree.leaves(broken.params))]
        assert max(diffs) > 0.0


class TestDetectionParamLabels:
    """Exact frozen/train split for the detection optimizer
    (`backbone/resnet50.py:36-38`: conv1..layer1 frozen;
    `Detection/model.py:27-35`: every backbone BN frozen). Name-based
    path matching must survive model refactors (a nesting change must not
    silently unfreeze the stem)."""

    def _labels(self, backbone):
        import jax
        from afan.models.frcnn import FasterRCNN, FRCNNConfig
        from afan.train.detect_loop import detection_param_labels
        cfg = FRCNNConfig(backbone=backbone, num_classes=4,
                          train_pre_nms_top_n=64, train_post_nms_top_n=16,
                          eval_pre_nms_top_n=32, eval_post_nms_top_n=8,
                          roi_samples=8, roi_fg_cap=2, rpn_samples=16,
                          rpn_fg_cap=8, anchor_sizes=(32, 64))
        m = FasterRCNN(cfg=cfg)
        imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
        gtb = jnp.zeros((1, 2, 4), jnp.float32)
        gtc = jnp.zeros((1, 2), jnp.int32)
        gtv = jnp.zeros((1, 2), bool)
        # eval_shape: we only need the param TREE, not the values
        vs = jax.eval_shape(
            lambda: m.init({"params": jax.random.PRNGKey(0)}, imgs, gtb,
                           gtc, gtv, jax.random.PRNGKey(1),
                           method=m.losses))
        labels = detection_param_labels(vs["params"])
        flat = {}
        for path, lab in jax.tree_util.tree_flatten_with_path(labels)[0]:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            flat[key] = lab
        return flat

    @pytest.mark.parametrize("backbone", ["resnet50", "resnet101"])
    def test_exact_label_sets(self, backbone):
        flat = self._labels(backbone)
        for key, lab in flat.items():
            parts = key.split("/")
            if parts[0] != "backbone":
                assert lab == "train", key  # rpn/roi heads always train
                continue
            in_layer1 = "layer1" in parts
            is_stem = any(k in ("conv1", "bn1") for k in parts) and \
                not any(k.startswith("layer") for k in parts)
            is_bn = any(k.startswith("bn") or k.startswith("ds_bn")
                        for k in parts)
            expected = "frozen" if (in_layer1 or is_stem or is_bn) \
                else "train"
            assert lab == expected, key
        # regression pins: exact frozen counts (scale+bias per BN plus
        # layer1 convs and the stem conv)
        frozen = sorted(k for k, v in flat.items() if v == "frozen")
        train = sorted(k for k, v in flat.items() if v == "train")
        assert any("rpn" in k for k in train)
        assert any("roi" in k or "head" in k for k in train)
        # resnet50: 53 BNs (stem + 16x3 + 4 downsample) x2 leaves + stem
        # conv + 10 layer1 convs = 117; resnet101: 104 BNs x2 + 11 = 219
        n_expected = {"resnet50": 117, "resnet101": 219}
        # (computed once from the current tree; a refactor that changes
        # this count must consciously update the pin)
        assert len(frozen) == n_expected[backbone], len(frozen)


class TestLearnableSinglePass:
    """multi_head single-pass prefix forward must be bit-identical to the
    per-tap re-forward formulation it replaces."""

    def test_multi_head_matches_heads(self, model_state):
        m, vs = model_state
        x, _ = tiny_batch()
        taps = (2, 4, 6)
        feats = m.apply(vs, x, taps, False, method=m.multi_head)
        for t, f in zip(taps, feats):
            ref = m.apply(vs, x, 0, t, False)
            np.testing.assert_array_equal(np.asarray(f), np.asarray(ref))

    def test_step_parity(self):
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4, init_weight=1 / 9)
        x, y = tiny_batch()
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        tx = sgd(lambda c: 0.05, 0.9, 0.0)
        cfg = LearnableConfig(taps=(2, 4, 6), steps=2)
        fast = make_learnable_step(m, tx, cfg, single_pass=True)
        slow = make_learnable_step(m, tx, cfg, single_pass=False)
        s1, m1 = fast(TrainState.create(vs, tx), x, y,
                      jax.random.PRNGKey(5))
        s2, m2 = slow(TrainState.create(vs, tx), x, y,
                      jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(m1["loss"]),
                                      np.asarray(m2["loss"]))
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOptStateRestorePathMatching:
    """restore_opt_state pairs leaves by flattened KEY PATH — a reordered
    container chain in an old pickle (optax classes differing across
    versions) must fall back to fresh init, never silently swap
    same-shaped leaves."""

    def test_reordered_same_shape_leaves_rejected(self):
        from afan.train.checkpoint import restore_opt_state
        fresh = {"a": {"mu": np.zeros((3, 3)), "nu": np.ones((3, 3))},
                 "count": np.zeros(())}
        # same leaf count + shapes, but the dict paths differ
        saved = {"b": {"mu": np.full((3, 3), 7.0),
                       "nu": np.full((3, 3), 8.0)},
                 "count": np.asarray(5.0)}
        out, ok = restore_opt_state(fresh, saved)
        assert not ok
        np.testing.assert_array_equal(np.asarray(out["a"]["mu"]),
                                      np.zeros((3, 3)))

    def test_same_paths_restored_regardless_of_declaration_order(self):
        from afan.train.checkpoint import restore_opt_state
        fresh = {"a": np.zeros((2,)), "z": np.zeros((2,))}
        saved = {"z": np.asarray([3.0, 4.0]), "a": np.asarray([1.0, 2.0])}
        out, ok = restore_opt_state(fresh, saved)
        assert ok
        np.testing.assert_array_equal(np.asarray(out["a"]),
                                      [1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(out["z"]),
                                      [3.0, 4.0])

    def test_shape_mismatch_rejected(self):
        from afan.train.checkpoint import restore_opt_state
        fresh = {"a": np.zeros((2,))}
        saved = {"a": np.zeros((3,))}
        _, ok = restore_opt_state(fresh, saved)
        assert not ok


class TestMultiHeadValidation:
    """multi_head rejects empty/out-of-range taps with clear errors
    instead of a bare max()/IndexError."""

    def test_empty_taps(self, model_state):
        m, vs = model_state
        x, _ = tiny_batch()
        with pytest.raises(ValueError, match="at least one tap"):
            m.apply(vs, x, (), False, method=m.multi_head)

    def test_out_of_range_tap(self, model_state):
        m, vs = model_state
        x, _ = tiny_batch()
        with pytest.raises(ValueError, match="out of range"):
            m.apply(vs, x, (2, 999), False, method=m.multi_head)
