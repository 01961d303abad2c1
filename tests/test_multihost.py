"""Multi-host correctness: a real 2-process jax.distributed run (CPU
coordination service, 4 virtual devices per process) exercising the
make_array_from_process_local_data batch-assembly path
(parallel/mesh.py shard_batch), compared against a single-process run on the
same global batch."""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_step(tmp_path):
    port = _free_port()
    procs = []
    outs = []
    for rank in range(2):
        out = tmp_path / f"worker{rank}.npz"
        outs.append(out)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        env.pop("JAX_NUM_PROCESSES", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_multihost_worker.py"),
             str(rank), "2", str(port), str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1500)
        logs.append(stdout.decode())
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {rank} failed:\n{log}"

    a = np.load(outs[0])
    b = np.load(outs[1])
    assert a["step"] == b["step"] == 1
    # both processes hold identical replicated results
    np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
    np.testing.assert_allclose(a["leaf"], b["leaf"], rtol=1e-6, atol=1e-7)

    # single-process reference on the same global batch (this pytest process
    # already has 8 CPU devices)
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.models.fcmae import FCMAE
    from mmearth_tpu.parallel import mesh as mesh_lib
    from mmearth_tpu.train import optim as optim_lib
    from mmearth_tpu.train.step import TrainState, init_fcmae, make_pretrain_step

    model = FCMAE(
        img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        decoder_depth=1, decoder_embed_dim=32, sparse=True, loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES,
        out_modalities={"sentinel2": M.OUT_MODALITIES["sentinel2"],
                        "biome": M.OUT_MODALITIES["biome"]},
        dtype=jnp.float32,
    )
    mesh = mesh_lib.create_mesh(data=8, model=1)
    batch_np = ge._synthetic_batch(8, 40, rng_seed=7)
    batch_np = {k: v for k, v in batch_np.items() if k in ("sentinel2", "biome")}
    params = init_fcmae(model, 0, {k: jnp.asarray(v[:2]) for k, v in batch_np.items()})
    tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1e-3)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_pretrain_step(model, random_crop=True))
    state, metrics = step_fn(state, mesh_lib.shard_batch(batch_np, mesh), jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["loss"]), float(a["loss"]), rtol=1e-5)
    leaf = np.asarray(state.params["encoder"]["stages_0_0"]["dwconv"]["kernel"])
    np.testing.assert_allclose(leaf, a["leaf"], rtol=1e-4, atol=1e-6)
