"""Multi-process DCN worker: one rank of a 2-process x 4-virtual-device
data-parallel ALFA step over the JAX distributed runtime (gloo CPU
collectives). Launched by tests/test_multiprocess.py; prints DCN_LOSS=...

This exercises the half of SURVEY.md §2.5 that a single process cannot:
per-host data loading assembled into a global batch
(`host_local_batch_to_global`) with the gradient psum riding the
cross-process (DCN-analog) channel.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from afan.models.resnet_s import ResNetS
    from afan.parallel.mesh import host_local_batch_to_global, make_mesh
    from afan.train.loop import AlfaConfig, TrainState, make_alfa_step
    from afan.train.optim import sgd

    assert jax.process_count() == nproc, jax.process_count()
    mesh = make_mesh()  # all global devices (nproc * local_count)
    repl = NamedSharding(mesh, P())

    model = ResNetS(num_blocks=(1, 1, 1), num_classes=10)
    tx = sgd(lambda c: 0.1, momentum=0.9, weight_decay=5e-4)

    # identical global batch on every rank; each rank feeds its local slice
    global_batch = 16
    rng_np = np.random.RandomState(0)
    x_all = rng_np.rand(global_batch, 16, 16, 3).astype(np.float32)
    y_all = rng_np.randint(0, 10, global_batch).astype(np.int32)
    per = global_batch // nproc
    xb, yb = host_local_batch_to_global(
        mesh, [x_all[pid * per:(pid + 1) * per],
               y_all[pid * per:(pid + 1) * per]])

    # params/state built inside jit with replicated out-sharding: the same
    # SPMD computation runs on every process, so the state is globally
    # consistent without any host-side broadcast
    def build():
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 3)), 0, None, False)
        return TrainState.create(variables, tx), jax.random.PRNGKey(1)

    state, key = jax.jit(build, out_shardings=(repl, repl))()

    step = make_alfa_step(model, tx, AlfaConfig(tap=5, steps=2))
    state, metrics = step(state, xb, yb, key)
    loss = float(metrics["loss"])
    print(f"DCN_LOSS={loss:.8f}", flush=True)

    # Seg A-FAN across the 2-process mesh: BN batch_stats must be computed
    # over the GLOBAL batch (cross-process collective), so both ranks print
    # the same loss and match the single-process execution.
    from afan.models.deeplab import build_model
    from afan.train.optim import poly_schedule
    from afan.train.segment_loop import (SegAfanConfig, make_afan_seg_step,
                                         segmentation_tx)
    seg = build_model("deeplabv3plus_mobilenet", 4, 16)
    seg_rng = np.random.RandomState(42)
    sx_all = seg_rng.rand(global_batch, 32, 32, 3).astype(np.float32)
    sy_all = seg_rng.randint(0, 4, (global_batch, 32, 32)).astype(np.int32)
    sxb, syb = host_local_batch_to_global(
        mesh, [sx_all[pid * per:(pid + 1) * per],
               sy_all[pid * per:(pid + 1) * per]])
    stx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)

    def sbuild():
        k = jax.random.PRNGKey(2)
        svars = seg.init({"params": k, "dropout": k},
                         jnp.zeros((1, 32, 32, 3)), False)
        return TrainState.create(svars, stx), jax.random.PRNGKey(3)

    sstate, skey = jax.jit(sbuild, out_shardings=(repl, repl))()
    sstep = make_afan_seg_step(seg, stx, SegAfanConfig(
        tap_se=2, sd="concat", spectrum=3, mix_mask=(0, 0, 1),
        mix_sd=True))
    sstate, smetrics = sstep(sstate, sxb, syb, skey)
    print(f"DCN_SEG_LOSS={float(smetrics['loss']):.8f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
