"""Device mesh + sharding helpers.

The TPU replacement for the reference's NCCL/DDP plumbing
(unidepth/utils/distributed.py, scripts/train.py:59-136): one
``jax.sharding.Mesh`` with a ``data`` axis (data parallelism — the only
strategy the reference uses) and an optional ``fsdp`` axis for sharding
parameters/optimizer state across chips when models outgrow HBM. Gradient
mean, metric sync, and loss aggregation all become XLA collectives inserted
by the partitioner — there is no hand-written communication code.

Multi-host: call ``initialize_distributed()`` once per process; mesh axes
span all global devices and collectives ride ICI within a slice, DCN
across slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "fsdp_param_sharding",
]


def initialize_distributed(**kwargs) -> None:
    """Multi-host rendezvous (replaces dist.init_process_group('nccl'))."""
    if jax.process_count() == 1:
        try:
            jax.distributed.initialize(**kwargs)
        except Exception:
            pass  # single-process: nothing to do


def make_mesh(data: int | None = None, fsdp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // fsdp
    assert data * fsdp == n, f"mesh {data}x{fsdp} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, fsdp)
    return Mesh(dev_array, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over data*fsdp."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, params):
    """Shard each parameter's largest axis over the fsdp axis when it
    divides evenly; replicate otherwise (simple ZeRO-3-style layout)."""
    fsdp = mesh.shape["fsdp"]

    def spec(x):
        if fsdp == 1 or x.ndim == 0:
            return NamedSharding(mesh, P())
        sizes = list(x.shape)
        axis = int(np.argmax(sizes))
        if sizes[axis] % fsdp == 0:
            parts = [None] * x.ndim
            parts[axis] = "fsdp"
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)
