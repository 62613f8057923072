"""Round-trip tests for the torchvision / full-model checkpoint
converters: a randomly-initialized flax tree, exported to torch layout and
converted back, must overlap-restore with matched-fraction == 1.0 and
identical values (VERDICT round-2 item 3; mirrors the reference's
overlap-load protocol, `Detection/backbone/resnet50_ori.py:281-293`,
`Detection/model.py:200-217`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.interop.torch_zoo import (convert_torch_deeplab,
                                    convert_torch_frcnn,
                                    convert_torchvision_resnet,
                                    resnet_params_to_torch_sd)
from afan.train.checkpoint import overlap_restore


def _randomize(tree, seed=0):
    """Replace every leaf with fresh random values (so a restore that
    silently keeps initialization cannot pass equality checks)."""
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*np.shape(x)), jnp.float32), tree)


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(p): l
          for p, l in jax.tree_util.tree_leaves_with_path(b)}
    for p, leaf in fa:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fb[jax.tree_util.keystr(p)]),
            rtol=1e-6, err_msg=jax.tree_util.keystr(p))


class TestResnetTorsoRoundTrip:
    @pytest.mark.parametrize("frozen", [True, False])
    def test_resnet18_round_trip(self, frozen):
        from afan.models.resnet import resnet18
        model = resnet18(frozen_bn=frozen, include_normalize=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), 0, 4, False)
        params = _randomize(variables["params"], 1)
        stats = _randomize(variables["batch_stats"], 2)
        sd = resnet_params_to_torch_sd(params, stats, frozen_bn=frozen)
        # torch layout sanity: torchvision key names, OIHW convs
        assert "conv1.weight" in sd and sd["conv1.weight"].shape == (64, 3,
                                                                     7, 7)
        assert "layer2.0.downsample.0.weight" in sd
        got_p, got_s, skipped = convert_torchvision_resnet(sd, frozen)
        assert skipped == []
        rp, frac_p = overlap_restore(params, got_p)
        rs, frac_s = overlap_restore(stats, got_s)
        assert frac_p == 1.0 and frac_s == 1.0
        _assert_trees_equal(rp, params)
        _assert_trees_equal(rs, stats)

    def test_fc_and_buffers_skipped(self):
        sd = {"fc.weight": np.zeros((10, 512)), "fc.bias": np.zeros(10),
              "bn1.num_batches_tracked": np.zeros(()),
              "conv1.weight": np.zeros((64, 3, 7, 7))}
        p, s, skipped = convert_torchvision_resnet(sd)
        assert set(skipped) == {"fc.weight", "fc.bias"}
        assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)


class TestDiskRoundTrip:
    def test_torch_save_load_backbone(self, tmp_path):
        torch = pytest.importorskip("torch")
        from afan.interop.torch_zoo import load_torchvision_backbone
        rng = np.random.RandomState(0)
        sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
              "bn1.weight": rng.randn(64).astype(np.float32),
              "bn1.bias": rng.randn(64).astype(np.float32),
              "bn1.running_mean": rng.randn(64).astype(np.float32),
              "bn1.running_var": rng.rand(64).astype(np.float32),
              "fc.weight": rng.randn(10, 512).astype(np.float32),
              "fc.bias": rng.randn(10).astype(np.float32)}
        path = str(tmp_path / "zoo.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
        p, s, skipped = load_torchvision_backbone(path, frozen_bn=True)
        np.testing.assert_allclose(
            np.asarray(p["conv1"]["kernel"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        np.testing.assert_allclose(np.asarray(p["bn1"]["bn"]["scale"]),
                                   sd["bn1.weight"])
        np.testing.assert_allclose(np.asarray(s["bn1"]["bn"]["mean"]),
                                   sd["bn1.running_mean"])
        assert set(skipped) == {"fc.weight", "fc.bias"}


def _conv_to_torch(out, name, tree, transpose=True):
    k = np.asarray(tree["kernel"])
    out[f"{name}.weight"] = np.transpose(k, (3, 2, 0, 1)) if transpose \
        else k
    if "bias" in tree:
        out[f"{name}.bias"] = np.asarray(tree["bias"])


def _linear_to_torch(out, name, tree):
    out[f"{name}.weight"] = np.transpose(np.asarray(tree["kernel"]), (1, 0))
    out[f"{name}.bias"] = np.asarray(tree["bias"])


def _bn_to_torch(out, name, ptree, stree):
    out[f"{name}.weight"] = np.asarray(ptree["scale"])
    out[f"{name}.bias"] = np.asarray(ptree["bias"])
    out[f"{name}.running_mean"] = np.asarray(stree["mean"])
    out[f"{name}.running_var"] = np.asarray(stree["var"])


class TestFrcnnFullModelRoundTrip:
    def test_round_trip(self):
        from afan.models.frcnn import FRCNNConfig, FasterRCNN
        cfg = FRCNNConfig(backbone="resnet18", num_classes=4,
                          train_pre_nms_top_n=64, train_post_nms_top_n=16,
                          roi_samples=8, roi_fg_cap=2, rpn_samples=16,
                          rpn_fg_cap=8, anchor_sizes=(32, 64))
        model = FasterRCNN(cfg=cfg)
        imgs = jnp.zeros((1, 64, 64, 3))
        gtb = jnp.asarray([[[8.0, 8, 40, 40]]])
        variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, gtb,
                               jnp.ones((1, 1), jnp.int32),
                               jnp.ones((1, 1), bool),
                               jax.random.PRNGKey(1), method=model.losses)
        params = _randomize(variables["params"], 3)
        stats = _randomize(variables["batch_stats"], 4)

        sd = {}
        for k, v in resnet_params_to_torch_sd(
                params["backbone"], stats["backbone"],
                frozen_bn=True).items():
            sd[f"features.{k}"] = v
        _conv_to_torch(sd, "rpn._features.0", params["rpn"]["trunk"])
        _conv_to_torch(sd, "rpn._anchor_objectness",
                       params["rpn"]["objectness"])
        _conv_to_torch(sd, "rpn._anchor_transformer",
                       params["rpn"]["transformer"])
        _linear_to_torch(sd, "detection._proposal_class",
                         params["roi_pred"]["proposal_class"])
        _linear_to_torch(sd, "detection._proposal_transformer",
                         params["roi_pred"]["proposal_transformer"])
        # the reference stores layer4 twice (features.layer4 aliases
        # detection.hidden); the converter must ignore the alias
        for k, v in list(sd.items()):
            if k.startswith("features.layer4."):
                sd["detection.hidden." + k[len("features.layer4."):]] = v

        got_p, got_s, skipped = convert_torch_frcnn(sd)
        assert skipped == []
        rp, frac_p = overlap_restore(params, got_p)
        rs, frac_s = overlap_restore(stats, got_s)
        assert frac_p == 1.0 and frac_s == 1.0
        _assert_trees_equal(rp, params)
        _assert_trees_equal(rs, stats)


class TestDeepLabFullModelRoundTrip:
    @pytest.mark.parametrize("plus", [True, False])
    def test_round_trip(self, plus):
        from afan.models.deeplab.modeling import DeepLab
        model = DeepLab(backbone_name="resnet50", num_classes=5, plus=plus)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 65, 65, 3)), False)
        params = _randomize(variables["params"], 5)
        stats = _randomize(variables["batch_stats"], 6)

        sd = {}
        for k, v in resnet_params_to_torch_sd(
                params["backbone"], stats["backbone"],
                frozen_bn=False).items():
            sd[f"backbone.{k}"] = v

        cp, cs = params["classifier"], stats["classifier"]

        def cbr(torch_conv, torch_bn, ptree, stree):
            _conv_to_torch(sd, torch_conv, ptree["conv"])
            _bn_to_torch(sd, torch_bn, ptree["bn"], stree["bn"])

        if plus:
            aspp, final = "classifier.aspp", "classifier.classifier"
            cbr("classifier.project.0", "classifier.project.1",
                cp["project"], cs["project"])
        else:
            aspp, final = "classifier.classifier.0", None
        for i, b in enumerate(("b0", "b1", "b2", "b3")):
            cbr(f"{aspp}.convs.{i}.0", f"{aspp}.convs.{i}.1",
                cp["aspp"][b], cs["aspp"][b])
        cbr(f"{aspp}.convs.4.1", f"{aspp}.convs.4.2",
            cp["aspp"]["pool"], cs["aspp"]["pool"])
        cbr(f"{aspp}.project.0", f"{aspp}.project.1",
            cp["aspp"]["project"], cs["aspp"]["project"])
        if plus:
            cbr(f"{final}.0", f"{final}.1",
                cp["classifier"]["conv"], cs["classifier"]["conv"])
            _conv_to_torch(sd, f"{final}.3", cp["classifier"]["logits"])
        else:
            cbr("classifier.classifier.1", "classifier.classifier.2",
                cp["classifier"]["conv"], cs["classifier"]["conv"])
            _conv_to_torch(sd, "classifier.classifier.4",
                           cp["classifier"]["logits"])

        got_p, got_s, skipped = convert_torch_deeplab(sd, plus=plus)
        assert skipped == []
        rp, frac_p = overlap_restore(params, got_p)
        rs, frac_s = overlap_restore(stats, got_s)
        assert frac_p == 1.0 and frac_s == 1.0
        _assert_trees_equal(rp, params)
        _assert_trees_equal(rs, stats)
