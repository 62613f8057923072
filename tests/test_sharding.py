"""Data-parallel mesh tests on the 8-device virtual CPU mesh.

The reference never tested DataParallel off-hardware (SURVEY.md §4); here the
full ALFA train step runs batch-sharded over 8 devices and must match the
single-device result bit-for-bit up to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afan.models.resnet_s import ResNetS
from afan.parallel.mesh import (
    batch_sharding, check_divisible, make_mesh, replicate_state, shard_batch,
)
from afan.train.loop import AlfaConfig, TrainState, make_alfa_step
from afan.train.optim import sgd


class TestMesh:
    def test_eight_devices(self):
        assert jax.device_count() == 8
        mesh = make_mesh()
        assert mesh.size == 8

    def test_check_divisible(self):
        mesh = make_mesh()
        check_divisible(16, mesh)
        with pytest.raises(ValueError):
            check_divisible(12, mesh)

    def test_shard_batch_layout(self):
        mesh = make_mesh()
        x = np.zeros((16, 8, 8, 3), np.float32)
        xs = shard_batch(mesh, x)
        assert xs.sharding.spec == batch_sharding(mesh).spec
        # each device holds 2 rows of the batch
        assert xs.addressable_shards[0].data.shape[0] == 2

    def test_dp_step_matches_single_device(self):
        m = ResNetS(num_blocks=(1, 1, 1), num_classes=4)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(16, 16, 16, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 4, 16))
        vs = m.init(jax.random.PRNGKey(0), x, 0, None, False)
        tx = sgd(lambda c: 0.05, momentum=0.9)
        cfg = AlfaConfig(tap=5, steps=1)
        step = make_alfa_step(m, tx, cfg)
        key = jax.random.PRNGKey(7)

        # single-device reference
        s1 = TrainState.create(vs, tx)
        s1, m1 = step(s1, x, y, key)

        # 8-way data parallel: replicate state, shard batch
        mesh = make_mesh()
        s8 = replicate_state(mesh, TrainState.create(vs, tx))
        xb, yb = shard_batch(mesh, x, y)
        s8, m8 = step(s8, xb, yb, replicate_state(mesh, key))

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)
        l1 = jax.tree.leaves(s1.params)
        l8 = jax.tree.leaves(s8.params)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_host_local_batch_to_global(self):
        # single-process: the multi-host assembly path must reduce to a
        # correctly sharded global batch
        from afan.parallel.mesh import host_local_batch_to_global
        mesh = make_mesh()
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        gx = host_local_batch_to_global(mesh, [x])
        assert gx.shape == (16, 4)
        np.testing.assert_array_equal(np.asarray(gx), x)
        assert gx.addressable_shards[0].data.shape[0] == 2  # 16/8 devices

    @pytest.mark.slow
    def test_seg_spatial_step_matches_single_device(self):
        """2-D data x spatial mesh (beyond-reference, SURVEY §5 'spatial
        sharding of activations'): the seg A-FAN step with image ROWS
        sharded over ICI must match the unsharded step — XLA inserts the
        conv halo exchanges and makes BN statistics global."""
        from afan.models.deeplab import build_model
        from afan.parallel.mesh import make_mesh_2d, shard_batch_spatial
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 4, (2, 64, 64)))
        key0 = jax.random.PRNGKey(0)
        vs = m.init({"params": key0, "dropout": key0}, x[:1], False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        cfg = SegAfanConfig(tap_se=2, sd="concat", spectrum=3,
                            mix_mask=(0, 0, 1), mix_sd=True)
        step = make_afan_seg_step(m, tx, cfg)
        key = jax.random.PRNGKey(7)

        s1 = TrainState.create(vs, tx)
        s1, m1 = step(s1, x, y, key)

        mesh = make_mesh_2d(2, 4)  # batch 2 over data, 64 rows over 4
        s24 = replicate_state(mesh, TrainState.create(vs, tx))
        xb, yb = shard_batch_spatial(mesh, x, y)
        assert xb.addressable_shards[0].data.shape == (1, 16, 64, 3)
        s24, m24 = step(s24, xb, yb, replicate_state(mesh, key))

        # (rtol 1e-4: spatially-sharded BN/loss reductions reassociate
        # float32 sums across 4 row shards)
        np.testing.assert_allclose(float(m1["loss"]), float(m24["loss"]),
                                   rtol=1e-4)
        # (atol 5e-4: beyond reduction-order noise, the PGD ascent takes
        # sign(grad) — a last-bit gradient difference near zero flips a
        # sign and moves that feature element by a full gamma, which the
        # update then propagates into isolated O(1e-4) param deltas)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s24.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)
        for a, b in zip(jax.tree.leaves(s1.batch_stats),
                        jax.tree.leaves(s24.batch_stats)):
            assert b.sharding.is_fully_replicated
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)

    @pytest.mark.slow
    def test_train_segment_spatial_cli(self, tmp_path, monkeypatch):
        """--spatial_shards end-to-end through the CLI on the 8-device
        CPU mesh (2-D 4x2 mesh, 2 steps + a validation)."""
        monkeypatch.chdir(tmp_path)
        from afan.cli.train_segment import main
        main(["--variant", "afan", "--dataset", "voc",
              "--data_root", "/nonexistent",
              "--model", "deeplabv3plus_mobilenet", "--crop_size", "32",
              "--batch_size", "4", "--spatial_shards", "2",
              "--limit_itrs", "2", "--val_interval", "2",
              "--exp", "sptest"])
        logs = list((tmp_path / "checkpoints").rglob("train.log"))
        assert logs
        text = logs[0].read_text()
        assert "2-D mesh: data=4 x spatial=2" in text
        assert "[Val] itrs 2" in text and "done; best mIoU" in text

    def test_shard_batch_spatial_rejects_indivisible(self):
        from afan.parallel.mesh import make_mesh_2d, shard_batch_spatial
        mesh = make_mesh_2d(2, 4)
        with pytest.raises(ValueError):
            shard_batch_spatial(mesh, np.zeros((2, 30, 8, 3), np.float32))

    @pytest.mark.slow
    def test_seg_dp_step_matches_single_device(self):
        """Seg A-FAN under DP: mutable batch_stats must be GLOBAL-batch
        statistics (replicated), and params/stats must match the
        single-device step (`Segmentation/main_aug_final.py:119`)."""
        from afan.models.deeplab import build_model
        from afan.train.optim import poly_schedule
        from afan.train.segment_loop import (SegAfanConfig,
                                             make_afan_seg_step,
                                             segmentation_tx)
        m = build_model("deeplabv3plus_mobilenet", 4, 16)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 4, (8, 32, 32)))
        key0 = jax.random.PRNGKey(0)
        vs = m.init({"params": key0, "dropout": key0}, x[:1], False)
        tx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
        cfg = SegAfanConfig(tap_se=2, sd="concat", spectrum=3,
                            mix_mask=(0, 0, 1), mix_sd=True)
        step = make_afan_seg_step(m, tx, cfg)
        key = jax.random.PRNGKey(7)

        s1 = TrainState.create(vs, tx)
        s1, m1 = step(s1, x, y, key)

        mesh = make_mesh()
        s8 = replicate_state(mesh, TrainState.create(vs, tx))
        xb, yb = shard_batch(mesh, x, y)
        s8, m8 = step(s8, xb, yb, replicate_state(mesh, key))

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)
        # (atol 1e-4: cross-device reduction order perturbs the last
        # float32 bits through BN + two PGD ascents)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-4)
        # batch_stats: replicated AND equal to the single-device update
        for a, b in zip(jax.tree.leaves(s1.batch_stats),
                        jax.tree.leaves(s8.batch_stats)):
            assert b.sharding.is_fully_replicated
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-4)
