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
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
