"""Device mesh construction and sharding helpers.

Replaces the reference's accelerate/NCCL data-parallel stack (reference:
config/accelerate_multi_gpu.yaml, scripts/train_unet.py:181-183,259) with JAX
SPMD: a ('data', 'model') mesh, batches sharded along ``data``, parameters
replicated or FSDP-sharded along ``data`` (the ZeRO analog of the reference's
DeepSpeed stage-2 config, config/accelerate_deepspeed.yaml:2-8). Gradient
all-reduce compiles to XLA collectives over ICI — no user-level comm code
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialization: call once per host before building a mesh on
    a TPU pod slice (SURVEY.md §5.8 — replaces the reference's torch.distributed
    rendezvous). On single-host runs (or TPU VMs with auto-detected topology)
    all arguments can stay None. Returns this host's process index."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:  # single-process / unsupported backend: fine
            pass
    return jax.process_index()


def is_main_process() -> bool:
    """Rank-0 gating for logging/checkpointing (the reference's
    ``accelerator.is_main_process``, train_unet.py:199,286)."""
    import jax

    return jax.process_index() == 0


def make_mesh(num_data: Optional[int] = None, num_model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh over all (or given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = devices.size // num_model
    assert num_data * num_model == devices.size, (
        f"mesh {num_data}x{num_model} != {devices.size} devices"
    )
    return Mesh(devices.reshape(num_data, num_model), (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis along ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on the mesh, batch-sharded along data."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def fsdp_sharding_for(shape, mesh: Mesh, min_size: int = 2**14) -> NamedSharding:
    """FSDP/ZeRO-style sharding: split a parameter's largest axis divisible by
    the data-axis size; small or indivisible params stay replicated."""
    n = mesh.shape[DATA_AXIS]
    if int(np.prod(shape)) < min_size:
        return NamedSharding(mesh, P())
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % n == 0:
            spec = [None] * len(shape)
            spec[axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, mode: str = "replicated"):
    """Sharding tree for a parameter pytree: 'replicated' (plain DP — models
    here are <=100M params, SURVEY.md §2.3) or 'fsdp' (ZeRO-equivalent)."""
    if mode == "replicated":
        return jax.tree_util.tree_map(lambda x: replicated(mesh), params)
    if mode == "fsdp":
        return jax.tree_util.tree_map(lambda x: fsdp_sharding_for(np.shape(x), mesh), params)
    raise ValueError(f"unknown param sharding mode {mode!r}")
