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
