"""Device mesh + sharding layout for InstantRestore-TPU.

The reference's entire distributed story is data parallelism via HF
Accelerate/DDP over NCCL (SURVEY.md §2.6; coach.py:52-61,112-129). The
TPU-native equivalent is one SPMD program over a ``jax.sharding.Mesh``:

* axis ``data``  — batch sharding (DP). Gradient all-reduce emerges from the
  sharding propagation of pjit; no collectives are written by hand.
* axis ``ref``   — optional second axis for serving: the (1+N_ref) VAE/UNet
  capture batch dimension shards across chips so one restore's reference
  encodes ride ICI in parallel (an extension beyond the reference, which has
  no model/sequence parallelism to port — its max sequence is 4096 queries).

Parameters are replicated (the UNet is 0.9 B params — fits every chip), the
batch dimension of every input/activation is sharded on ``data``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
) -> Mesh:
    """1-axis data mesh by default; pass mesh_shape/axis_names for more."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(dev_array, tuple(axis_names))


def make_multislice_mesh(
    n_slices: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Two-axis mesh ('dcn', 'data') for multi-slice training: the outer
    axis spans slices (traffic rides DCN), the inner axis spans each slice's
    chips (traffic rides ICI). Pure DP still shards the batch over BOTH axes
    — gradients all-reduce hierarchically, ICI first then DCN, which XLA
    derives from the mesh layout (SURVEY.md §2.6: 'DCN axis only if
    multi-slice training is wanted'). Use
    ``batch_sharding(mesh, ndim, axis=("dcn", "data"))`` /
    ``shard_batch(mesh, batch, axis=("dcn", "data"))``."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_slices == 0, (len(devices), n_slices)
    per_slice = len(devices) // n_slices
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) == n_slices and None not in slice_ids:
        # real multi-slice hardware: let mesh_utils order by slice/process/
        # ICI coordinates (and enforce equal slice sizes)
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (n_slices, 1), devices=devices
        ).reshape(n_slices, per_slice)
    else:
        # virtual/test meshes (host CPU devices carry no slice topology):
        # even id-ordered split
        dev_array = np.asarray(sorted(devices, key=lambda d: d.id)).reshape(
            n_slices, per_slice
        )
    return Mesh(dev_array, ("dcn", DATA_AXIS))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Multi-process (multi-host) entry point — the TPU-native twin of the
    reference's ``accelerate launch`` multi-node bootstrap
    (/root/reference/setup.sh:4, coach.py:52-61).

    On TPU pods/multi-host slices, call with NO arguments before any backend
    use: the TPU runtime supplies coordinator/process topology. On GPU/CPU
    clusters pass coordinator_address/num_processes/process_id explicitly.
    Safe to call twice (no-op when the distributed client already exists);
    NEVER called implicitly — single-process runs must not touch the
    coordinator (a second client on a shared tunneled backend hangs)."""
    try:
        from jax._src.distributed import global_state

        if getattr(global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass
    kwargs: dict = {}
    if coordinator_address is not None:
        # explicit-topology CPU clusters need a cross-process collectives
        # backend; gloo is XLA:CPU's supported one. Must be set before the
        # first backend client exists — which is guaranteed here, since
        # initialize() itself must run pre-backend. TPU pods (no explicit
        # coordinator) use the ICI/DCN runtime and are untouched.
        if (jax.config.jax_platforms or "") == "cpu":
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that owns logging/checkpointing (process 0)."""
    return jax.process_index() == 0


def multihost_shard_batch(mesh: Mesh, local_batch: Any, axis=DATA_AXIS) -> Any:
    """Per-process local batch shards -> GLOBAL dim-0-sharded jax.Arrays.

    Each process feeds only its own slice of the global batch (size
    global_batch / process_count, produced by ``DataLoader(process_index=,
    process_count=)``); ``jax.make_array_from_process_local_data`` assembles
    the global array without any cross-host data movement. Single-process
    this equals ``shard_batch``."""

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree_util.tree_map(put, local_batch)


def multihost_shard_stacked_batch(mesh: Mesh, local_batch: Any, axis=DATA_AXIS) -> Any:
    """Multi-host twin of ``shard_stacked_batch``: [N_steps, local_B, ...]
    per-process trees -> global arrays with dim 0 replicated and dim 1
    sharded on ``axis``."""

    def put(x):
        x = np.asarray(x)
        spec = P(None, axis, *([None] * (x.ndim - 2))) if x.ndim >= 2 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree_util.tree_map(put, local_batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1, axis=DATA_AXIS) -> NamedSharding:
    """Shard dim 0 on the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any, axis=DATA_AXIS) -> Any:
    """Device-put a pytree of host arrays with dim-0 sharded on ``axis``."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batch(mesh: Mesh, batch: Any, axis=DATA_AXIS) -> Any:
    """Device-put a pytree of [N_steps, B, ...] host arrays: dim 0 (the scan
    step axis) replicated, dim 1 (the batch) sharded on ``axis``. Used by the
    Coach's scan-dispatch loop (N train steps per compiled program)."""

    def put(x):
        spec = (
            P(None, axis, *([None] * (x.ndim - 2))) if x.ndim >= 2 else P()
        )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate_params(mesh: Mesh, params: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), params)
