"""Device mesh + sharding setup.

Replaces the reference's torch.distributed/DDP/NCCL plumbing
(helpers.py:292-401) with one `jax.sharding.Mesh`:

  * ``data`` axis: data parallelism — the batch is sharded, parameters are
    replicated, and XLA inserts the gradient all-reduce over ICI (what DDP's
    backward hooks + NCCL did).
  * optional ``model`` axis: tensor parallelism for the wide pointwise/decoder
    weights (channels sharded); unused (size 1) by default since MP-MAE sizes
    fit a single chip, but exercised by the multi-chip dry run.

Multi-host: call :func:`init_distributed` early (jax.distributed.initialize),
then the same mesh code spans all processes; per-host input sharding is done
by the loader's ``shard=(process_index, process_count)``.
"""
from __future__ import annotations

import os
from typing import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def honor_cpu_platform_env():
    """Honor an explicit ``JAX_PLATFORMS=cpu`` from the caller (CPU smoke
    runs of the drivers).  Some TPU plugin environments hard-pin
    ``jax_platforms`` from sitecustomize *after* reading the env var, so the
    env alone does not stick; the config update does.  No-op once the
    backend is initialized or when the env var requests anything else."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def init_distributed():
    """Multi-host init (reference helpers.py:337-390 collapses to this)."""
    honor_cpu_platform_env()
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()


def create_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Batch axis (``axis``) over 'data'; leading axes replicated.  axis=1 is
    the stacked k-batch layout of chained dispatch: (k, B, ...) with B split."""
    return NamedSharding(mesh, P(*([None] * axis + ["data"])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping, mesh: Mesh, axis: int = 0):
    """Device-put a host batch with the batch axis split over 'data'.

    On a single-device mesh this skips the NamedSharding placement entirely:
    committed GSPMD shardings trigger a drastically slower compilation path on
    single-chip backends (measured 27x on v5e) and buy nothing there."""
    if mesh.devices.size == 1:
        import jax.numpy as jnp

        return {k: jnp.asarray(v) for k, v in batch.items()}
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        # each host holds its shard of the global batch
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), dict(batch)
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), dict(batch))


def param_sharding_rules(path_str: str, shape: tuple[int, ...],
                         model_size: int) -> P:
    """Tensor-parallel rules for the 'model' axis: shard the output channels
    of the 4x pointwise expansions and the wide prediction heads; everything
    else replicated.  ``model_size`` is the mesh's 'model'-axis extent — a
    channel count not divisible by it stays replicated (e.g. the 14-way biome
    head on model=4).  With mesh model=1 these are all no-ops."""
    if (shape and model_size > 1 and shape[-1] % model_size == 0
            and any(k in path_str for k in ("pwconv1", "pred_", "proj"))):
        if path_str.endswith("kernel"):
            return P(*([None] * (len(shape) - 1) + ["model"]))
        if path_str.endswith("bias"):
            return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply :func:`param_sharding_rules` over a param pytree (no-op placement
    on a single-device mesh, see shard_batch)."""
    if mesh.devices.size == 1:
        return params

    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def spec_for(path, leaf):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return NamedSharding(mesh, param_sharding_rules(path_str, leaf.shape, model_size))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, spec_for(path, leaf)), params
    )


def place_state(state, mesh: Mesh):
    """Re-place a (possibly just-restored) TrainState consistently on the
    mesh: params by the tensor-parallel rules, everything else replicated."""
    if mesh.devices.size == 1:
        return state
    rep = replicated(mesh)
    return state.replace(
        params=shard_params(state.params, mesh),
        opt_state=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state.opt_state),
        step=jax.device_put(state.step, rep),
    )
