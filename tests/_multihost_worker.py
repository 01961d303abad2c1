"""Worker process for the 2-process jax.distributed test (run via subprocess
by tests/test_multihost.py).  Each process owns 4 virtual CPU devices of an
8-device global mesh, builds the per-host slice of a deterministic global
batch, assembles it with make_array_from_process_local_data
(parallel/mesh.py shard_batch multi-process path), runs ONE pretrain step,
and dumps its view of the results for the parent to compare."""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=num_procs, process_id=proc_id
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge  # noqa: E402
from mmearth_tpu.configs import modalities as M  # noqa: E402
from mmearth_tpu.models.fcmae import FCMAE  # noqa: E402
from mmearth_tpu.parallel import mesh as mesh_lib  # noqa: E402
from mmearth_tpu.train import optim as optim_lib  # noqa: E402
from mmearth_tpu.train.step import TrainState, init_fcmae, make_pretrain_step  # noqa: E402

assert jax.process_count() == num_procs
assert jax.device_count() == 4 * num_procs
assert jax.local_device_count() == 4

model = FCMAE(
    img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
    decoder_depth=1, decoder_embed_dim=32, sparse=True, loss_aggr="uncertainty",
    inp_modalities=M.INP_MODALITIES,
    out_modalities={"sentinel2": M.OUT_MODALITIES["sentinel2"],
                    "biome": M.OUT_MODALITIES["biome"]},
    dtype=jnp.float32,
)
mesh = mesh_lib.create_mesh(data=jax.device_count(), model=1)

global_batch = ge._synthetic_batch(8, 40, rng_seed=7)
global_batch = {k: v for k, v in global_batch.items() if k in ("sentinel2", "biome")}
half = 8 // num_procs
local = {k: v[proc_id * half : (proc_id + 1) * half] for k, v in global_batch.items()}

params = init_fcmae(model, 0, {k: jnp.asarray(v[:2]) for k, v in global_batch.items()})
tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1e-3)
state = TrainState.create(params, tx)

step_fn = jax.jit(make_pretrain_step(model, random_crop=True))
batch = mesh_lib.shard_batch(local, mesh)  # multi-process assembly path
assert batch["sentinel2"].shape[0] == 8  # global batch assembled
state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))

# replicated outputs: every process sees the same values on its local shards
loss = float(metrics["loss"])
leaf = np.asarray(
    state.params["encoder"]["stages_0_0"]["dwconv"]["kernel"].addressable_shards[0].data
)
np.savez(out_path, loss=loss, leaf=leaf, step=int(state.step))
print(f"worker {proc_id}: loss={loss:.6f}")
