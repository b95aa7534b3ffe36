"""Multi-host initialization.

The reference's distributed story is torch.distributed.launch + NCCL env://
rendezvous (ContextPose/train.py:240-249, README.md:110-127). The JAX
equivalent is a single initialize() call per host process: afterwards
jax.devices() spans the whole slice/pod, and the SAME mesh/sharding code in
parallel/mesh.py scales from 1 chip to a pod (ICI inside a slice, DCN across
slices) with zero further changes.

Typical TPU pod usage (args auto-detected from the TPU environment):

    from contextaware_poseformer_tpu.parallel import distributed
    distributed.initialize()            # once per host, before device use
    mesh = make_mesh(model_parallel=1)  # spans all global devices

Dataset sharding per host: H36MDataset.shard(process_index, process_count)
mirrors the reference's per-rank label slicing (human36m.py:536-552).
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize cross-host collectives; no-op if already initialized or
    single-process. Returns topology info."""
    try:
        if num_processes is not None or coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # TPU metadata auto-detection
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment without
        # coordinator metadata — both fine
        pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def _shard_start(s) -> tuple:
    """Sort key: a shard's position in the global array (leading axis)."""
    idx = s.index[0] if s.index else slice(0, 0)
    return (idx.start or 0,)


def local_rows(x) -> "np.ndarray":
    """This process's rows of a (possibly non-addressable) batch-sharded
    global array, in global order. For single-process arrays this is just
    np.asarray. Replaces the reference's implicit per-rank result tensors
    (ContextPose/train.py:203-204)."""
    import numpy as np

    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=_shard_start)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allgather_hosts(local: "np.ndarray") -> "np.ndarray":
    """Concatenate per-host arrays along axis 0 (process-major order),
    allowing DIFFERENT lengths per host: pad to the max length, gather,
    trim — the functional twin of the reference's padded all_gather +
    dist_size trim (ContextPose/train.py:216-226)."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    local = np.ascontiguousarray(local)
    n = np.asarray([local.shape[0]], np.int64)
    counts = np.asarray(multihost_utils.process_allgather(n, tiled=True))
    max_n = int(counts.max())
    if local.shape[0] < max_n:
        pad = np.zeros((max_n - local.shape[0], *local.shape[1:]), local.dtype)
        local = np.concatenate([local, pad], axis=0)
    gathered = np.asarray(multihost_utils.process_allgather(local, tiled=True))
    parts = [
        gathered[i * max_n : i * max_n + int(counts[i])]
        for i in range(len(counts))
    ]
    return np.concatenate(parts, axis=0)


def put_global_batch(batch, sharding):
    """Place a batch every process holds IN FULL (same-seed synthetic data,
    or a broadcast result) under an arbitrary global sharding.

    Unlike put_batch (each process contributes only its own rows, valid when
    the leading-axis shards are process-aligned), this works for shardings
    where a process addresses non-contiguous or partial rows — e.g. a
    tensor-parallel mesh whose 'model' axis spans hosts, which leaves every
    process addressing a slice of every batch shard."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(put, batch)


def broadcast_pytree(tree):
    """Process 0's pytree to every process (host-side values). Single
    process: identity. Every process must call this with a tree of the SAME
    structure/shapes (e.g. each computed its own candidate locally); the
    returned leaves are process 0's, as host numpy arrays."""
    if jax.process_count() == 1:
        return tree
    import numpy as np
    from jax.experimental import multihost_utils

    host_tree = jax.tree.map(np.asarray, tree)
    out = multihost_utils.broadcast_one_to_all(host_tree)
    return jax.tree.map(np.asarray, out)


def put_batch(batch, sharding):
    """Batch -> global device array under `sharding` (leading-axis data
    sharding). Single-process: plain device_put. Multi-process: each host
    contributes its own local batch via make_array_from_process_local_data
    (global batch = process_count x local batch, process-major)."""
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )
