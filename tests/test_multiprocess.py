"""2-process x 4-virtual-device DCN harness (VERDICT round-2 item 6):
launches two JAX distributed-runtime processes on localhost, each feeding
its host-local half of the batch via ``host_local_batch_to_global``, runs
one data-parallel ALFA step, and asserts both ranks agree with the
single-process 8-device result (the in-process mesh from conftest)."""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    """Same model/batch/step on the in-process 8-device CPU mesh."""
    from afan.models.resnet_s import ResNetS
    from afan.parallel.mesh import make_mesh, replicate_state, shard_batch
    from afan.train.loop import AlfaConfig, TrainState, make_alfa_step
    from afan.train.optim import sgd

    model = ResNetS(num_blocks=(1, 1, 1), num_classes=10)
    tx = sgd(lambda c: 0.1, momentum=0.9, weight_decay=5e-4)
    rng_np = np.random.RandomState(0)
    x = rng_np.rand(16, 16, 16, 3).astype(np.float32)
    y = rng_np.randint(0, 10, 16).astype(np.int32)
    mesh = make_mesh()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 16, 16, 3)), 0, None, False)
    state = replicate_state(mesh, TrainState.create(variables, tx))
    xb, yb = shard_batch(mesh, jnp.asarray(x), jnp.asarray(y))
    key = replicate_state(mesh, jax.random.PRNGKey(1))
    step = make_alfa_step(model, tx, AlfaConfig(tap=5, steps=2))
    _, metrics = step(state, xb, yb, key)
    return float(metrics["loss"])


def _single_process_seg_loss() -> float:
    """Seg A-FAN on the in-process 8-device mesh, same data as the worker."""
    from afan.models.deeplab import build_model
    from afan.parallel.mesh import make_mesh, replicate_state, shard_batch
    from afan.train.loop import TrainState
    from afan.train.optim import poly_schedule
    from afan.train.segment_loop import (SegAfanConfig, make_afan_seg_step,
                                         segmentation_tx)
    seg = build_model("deeplabv3plus_mobilenet", 4, 16)
    seg_rng = np.random.RandomState(42)
    x = seg_rng.rand(16, 32, 32, 3).astype(np.float32)
    y = seg_rng.randint(0, 4, (16, 32, 32)).astype(np.int32)
    stx = segmentation_tx(poly_schedule(0.01, 100), 0.9, 1e-4)
    k = jax.random.PRNGKey(2)
    svars = seg.init({"params": k, "dropout": k},
                     jnp.zeros((1, 32, 32, 3)), False)
    mesh = make_mesh()
    state = replicate_state(mesh, TrainState.create(svars, stx))
    xb, yb = shard_batch(mesh, jnp.asarray(x), jnp.asarray(y))
    sstep = make_afan_seg_step(seg, stx, SegAfanConfig(
        tap_se=2, sd="concat", spectrum=3, mix_mask=(0, 0, 1),
        mix_sd=True))
    _, smetrics = sstep(state, xb, yb,
                        replicate_state(mesh, jax.random.PRNGKey(3)))
    return float(smetrics["loss"])


@pytest.mark.slow
def test_two_process_dcn_matches_single_process():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 4 local devices per process -> 8 global
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4")
    worker = os.path.join(HERE, "dcn_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), "2"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
    losses, seg_losses = [], []
    for out in outs:
        m = re.search(r"DCN_LOSS=([0-9.]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
        ms = re.search(r"DCN_SEG_LOSS=([0-9.]+)", out)
        assert ms, out[-3000:]
        seg_losses.append(float(ms.group(1)))
    # both ranks see the same (psum-reduced, replicated) loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    assert seg_losses[0] == pytest.approx(seg_losses[1], abs=1e-6)
    # and it matches the single-process 8-device execution
    ref = _single_process_loss()
    assert losses[0] == pytest.approx(ref, abs=1e-5)
    seg_ref = _single_process_seg_loss()
    assert seg_losses[0] == pytest.approx(seg_ref, abs=1e-4)
