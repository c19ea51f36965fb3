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

import contextlib
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "fsdp_param_sharding",
    "tp_param_sharding",
    "check_batch_divisibility",
    "use_sharding",
    "ambient_mesh",
    "constrain",
    "pin_state_sharding",
    "virtual_mesh_exec_ok",
]


def virtual_mesh_exec_ok() -> bool:
    """True when EXECUTING multi-device programs on the host-CPU virtual
    mesh is safe; compilation is always safe.

    XLA:CPU's in-process collectives block the calling thread in a
    rendezvous, and the thunk executor may start independent collectives
    in different orders on different devices. On a host with a single
    usable core each device has one executor thread, so two collectives
    with overlapping participant sets can each hold the only thread of a
    device the other needs — a true cyclic deadlock ending in the
    rendezvous terminate-timeout SIGABRT (observed on a 1-core container:
    all 8 device threads blocked across 3 different rendezvous). With >=2
    cores every pending collective keeps making progress. Tests use this
    to keep compile-time partitioning/layout assertions everywhere while
    running the actual step only where it cannot deadlock."""
    import os

    return jax.default_backend() != "cpu" or (os.cpu_count() or 1) >= 2


# ---------------------------------------------------------------------------
# Ambient mesh: model code (encoder/decoder/kernels) is mesh-agnostic, but
# GSPMD needs sharding hints at activation-layout seams (reshape/transpose
# chains it otherwise resolves with an involuntary full rematerialization —
# an all-gather of encoder activations every scan stage on real hardware).
# Drivers wrap tracing in ``use_sharding(mesh)``; ``constrain`` is a strict
# no-op when no mesh is ambient, so single-chip serving is untouched.
# ---------------------------------------------------------------------------
_AMBIENT = threading.local()


@contextlib.contextmanager
def use_sharding(mesh: Mesh):
    """Make ``mesh`` the ambient mesh for activation-sharding constraints
    (and the shard_map'd flash kernel) while tracing under this context."""
    prev = getattr(_AMBIENT, "mesh", None)
    _AMBIENT.mesh = mesh
    try:
        yield mesh
    finally:
        _AMBIENT.mesh = prev


def ambient_mesh() -> Mesh | None:
    return getattr(_AMBIENT, "mesh", None)


def pin_state_sharding(step_fn, state):
    """Wrap a ``(state, *rest) -> (state, aux)`` step so the output state
    carries EXACTLY the input state's shardings.

    Without this, GSPMD picks output layouts by propagation, which can
    diverge from the input spec on individual leaves (observed: a
    replicated small Adam ``mu`` coming back fsdp-sharded because its
    gradient arrives sharded). The drift breaks the ZeRO-3 invariant
    (opt state laid out like params) and makes the NEXT call a new jit
    signature — a silent recompile every step. Pin against the concrete
    shardings of ``state`` at wrap time; leaves without a sharding
    (python ints before device_put) pass through unpinned."""
    _UNPINNED = "unpinned"  # None would be an empty pytree node

    def _pinnable(x):
        # only mesh-placed leaves: pinning a SingleDeviceSharding (e.g. the
        # not-device_put step counter) would mix device sets inside the jit
        s = getattr(x, "sharding", None)
        return s if isinstance(s, NamedSharding) else _UNPINNED

    shardings = jax.tree.map(_pinnable, state)

    def wrapped(state, *rest):
        new_state, aux = step_fn(state, *rest)
        new_state = jax.tree.map(
            lambda x, s: (
                x
                if isinstance(s, str)
                else jax.lax.with_sharding_constraint(x, s)
            ),
            new_state,
            shardings,
        )
        return new_state, aux

    return wrapped


def constrain(x, *spec):
    """``with_sharding_constraint(x, P(*spec))`` against the ambient mesh.

    Axis names absent from the ambient mesh (or with size 1) are dropped
    from the spec, as is any entry whose tensor dimension does not divide
    by the mapped mesh axes (e.g. the batch-1 trace of ``init_params`` or
    a small artifact batch running under the training mesh — GSPMD
    requires exact divisibility). With no ambient mesh the input is
    returned unchanged. Spec entries may be a name, a tuple of names, or
    None."""
    mesh = ambient_mesh()
    if mesh is None:
        return x

    def keep(name):
        return mesh.shape.get(name, 1) > 1

    parts = []
    for dim, entry in enumerate(spec):
        if entry is None:
            parts.append(None)
            continue
        names = tuple(n for n in (entry if isinstance(entry, tuple) else (entry,)) if keep(n))
        total = int(np.prod([mesh.shape[n] for n in names])) if names else 1
        if not names or dim >= x.ndim or x.shape[dim] % total != 0:
            parts.append(None)
        elif isinstance(entry, tuple):
            parts.append(names)
        else:
            parts.append(names[0])
    if all(p is None for p in parts):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*parts)))


def check_batch_divisibility(batch_size: int, n_proc: int, n_dev: int) -> int:
    """Validate the global batch against the process/device topology and
    return the per-process batch. Fails fast at startup instead of deep
    inside XLA when the P(None, ("data", "fsdp")) batch sharding would not
    divide evenly.

    ``n_dev`` is the GLOBAL batch-shard device count (data*fsdp across all
    hosts). The sharding constraint is global: ``batch_size % n_dev == 0``
    — NOT ``local_bs % n_dev``, which would wrongly force the per-process
    slice to cover every device (e.g. 2 hosts x 8 chips at one image/chip:
    batch 16 -> local 8, and 8 % 16 != 0 would reject a valid config).
    ``make_array_from_process_local_data`` only needs each process's slice
    to cover its LOCAL shard devices, which ``batch_size % n_proc == 0``
    plus the global divisibility guarantees for symmetric topologies."""
    if batch_size % n_proc != 0:
        raise ValueError(
            f"batch_size {batch_size} not divisible by process_count {n_proc}"
        )
    if batch_size % n_dev != 0:
        # no silent rounding-up: inflating to the device count would run a
        # larger global batch than configured
        raise ValueError(
            f"global batch {batch_size} not divisible by the {n_dev} "
            f"batch-shard devices; pick a batch_size that is a multiple of "
            f"both the device count and the process count"
        )
    return batch_size // n_proc


def initialize_distributed(**kwargs) -> None:
    """Multi-host rendezvous (replaces dist.init_process_group('nccl')).

    No-op for plain single-process runs. When a multi-process launch is
    requested — explicit kwargs or cluster env vars present — failures
    propagate, so a misconfigured job fails fast instead of silently
    degrading to N independent single-host runs.
    """
    import os

    wants_cluster = (
        bool(kwargs)
        or any(
            os.environ.get(v)
            for v in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "SLURM_JOB_ID",
                "OMPI_COMM_WORLD_SIZE",
            )
        )
        # single-worker tunnels set this to one hostname; only a multi-worker
        # list means a real cluster
        or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    )
    if not wants_cluster:
        return
    jax.distributed.initialize(**kwargs)


def make_mesh(
    data: int | None = None, fsdp: int = 1, tp: int = 1, devices=None
) -> Mesh:
    """dp x fsdp x tp mesh. ``tp`` (tensor/model parallelism) is innermost so
    its collectives (the per-block all-reduces of Megatron-style sharding)
    ride the fastest ICI links; ``data`` is outermost so gradient all-reduce
    — once per step — takes the long hops."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (fsdp * tp)
    assert data * fsdp * tp == n, f"mesh {data}x{fsdp}x{tp} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, fsdp, tp)
    return Mesh(dev_array, axis_names=("data", "fsdp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over data*fsdp."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style tensor-parallel layout, keyed by module name (the kernel's
# parent in the param path). Column-parallel modules shard their OUTPUT dim
# over tp (each chip computes a slice of heads / hidden units, no comm);
# row-parallel modules shard their INPUT dim (the contraction produces a
# partial sum, and GSPMD inserts the one all-reduce per block at the output).
# Names cover both the ViT blocks (qkv/proj, fc1/fc2 — dinov2.py) and the
# decoder attention/MLP stacks (q/kv/out, proj1/proj2 — nn/layers.py).
_TP_COL = frozenset({"qkv", "fc1", "q", "kv", "proj1"})
_TP_ROW = frozenset({"proj", "fc2", "out", "proj2"})


def tp_param_sharding(mesh: Mesh, params):
    """Tensor-parallel + fsdp sharding spec for a (param-shaped) tree.

    Kernels of attention/MLP projections get the Megatron column/row layout
    over the ``tp`` axis; within a tp-sharded kernel the largest remaining
    axis is additionally sharded over ``fsdp`` when divisible (2D sharding).
    Everything else falls back to :func:`fsdp_param_sharding`'s shape-driven
    rule. Matching is on the trailing path components, so the same function
    lays out Adam mu/nu and the EMA shadow identically to their param —
    apply it to the whole TrainState.
    """
    tp = mesh.shape.get("tp", 1)
    fsdp = mesh.shape.get("fsdp", 1)
    fsdp_fallback = _fsdp_spec_fn(mesh)

    def spec(path, x):
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        leaf = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if tp > 1 and x.ndim >= 1:
            parts = [None] * x.ndim
            axis = None
            if parent in _TP_COL and leaf in ("kernel", "bias"):
                # output dim is always last (flax Dense / scanned Dense)
                axis = x.ndim - 1
            elif parent in _TP_ROW and leaf == "kernel" and x.ndim >= 2:
                axis = x.ndim - 2  # contraction (input) dim
            if axis is not None and x.shape[axis] % tp == 0:
                parts[axis] = "tp"
                # 2D (tp x fsdp) only above the same size floor as the pure
                # fsdp rule: fsdp on the contraction axis of a small kernel
                # (e.g. the 512x512 V1 aggregate q) makes GSPMD shard tiny
                # latent activations channel-wise and rematerialize.
                if fsdp > 1 and x.ndim >= 2 and x.size >= _FSDP_MIN_SIZE:
                    rest = [
                        (x.shape[a], a) for a in range(x.ndim) if a != axis
                    ]
                    size, fa = max(rest)
                    if size % fsdp == 0:
                        parts[fa] = "fsdp"
                return NamedSharding(mesh, P(*parts))
        return fsdp_fallback(x)

    return jax.tree_util.tree_map_with_path(spec, params)


# FSDP exists to spread LARGE weights; leaves below this element count are
# replicated. Besides being pointless to shard (a replicated 2M-element
# fp32 leaf is 8 MB), small sharded leaves are actively harmful: a
# depthwise 7x7 conv kernel (7*7*1*C) sharded over its channel axis forces
# the grouped convolution's output to be channel-sharded, and a square
# decoder adapter kernel sharded on its contraction axis makes GSPMD
# propagate channel sharding into tiny latent activations — both observed
# to end in involuntary full rematerialization on the 2x2x2 dryrun
# (jvp(DecoderV1)/depth_layer/up*/dwconv, input_adapter_*/add_any). The
# floor keeps every encoder GEMM sharded — the smallest is a scanned
# ViT-S segment's stacked qkv kernel at 1.3M elements — while replicating
# decoder plumbing (the largest offender, a 1536x512 V1 adapter kernel,
# is 0.8M).
_FSDP_MIN_SIZE = 1024 * 1024


def _fsdp_spec_fn(mesh: Mesh):
    """Shape-driven per-leaf spec: largest divisible axis over fsdp."""
    fsdp = mesh.shape.get("fsdp", 1)

    def spec(x):
        if fsdp == 1 or x.ndim == 0 or x.size < _FSDP_MIN_SIZE:
            return NamedSharding(mesh, P())
        sizes = list(x.shape)
        axis = int(np.argmax(sizes))
        if sizes[axis] % fsdp == 0:
            parts = [None] * x.ndim
            parts[axis] = "fsdp"
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return spec


def fsdp_param_sharding(mesh: Mesh, params):
    """Shard each leaf's largest axis over the fsdp axis when it divides
    evenly; replicate otherwise (simple ZeRO-3-style layout).

    The spec is purely shape-driven, so applying this to the optimizer
    state and EMA shadow gives Adam mu/nu and the shadow the *same* layout
    as their parameter — apply it to the whole TrainState, not just
    params, or the fsdp axis saves negative memory (moments are ~2x param
    bytes)."""
    return jax.tree.map(_fsdp_spec_fn(mesh), params)
