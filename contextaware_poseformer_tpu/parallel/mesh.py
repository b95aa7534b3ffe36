"""Device mesh and sharding rules.

The reference's only multi-device strategy is data parallelism over NCCL
(DistributedDataParallel, ContextPose/train.py:240-249,361-362; eval
all_gather train.py:216-226). The TPU-native equivalent needs no hand-written
communication at all: a 2D `jax.sharding.Mesh` ("data", "model"), batch inputs
sharded on "data", parameters replicated (or tensor-sharded on "model"), and
XLA GSPMD inserts the gradient all-reduce / activation collectives on ICI.

"model" is a real tensor-parallel axis for the lifting net: attention qkv /
mlp fc1 kernels are column-sharded and proj / fc2 kernels row-sharded
(Megatron-style), expressed purely as NamedSharding annotations. The lifter is
small (~14M params) so model_parallel=1 is the performance default
(SURVEY.md 2.6); the axis exists for scale-out headroom and is exercised by
tests and the multi-chip dryrun.

Multi-host: call jax.distributed.initialize() before make_mesh and the same
code spans slices (DCN between hosts, ICI inside).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    model_parallel: int = 1, devices: list | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _lifter_spec(path: tuple[str, ...], leaf) -> P:
    """Megatron-style TP specs for lifter kernels; everything else replicated.

    Column-parallel (output dim on "model"): attn.qkv, mlp.fc1.
    Row-parallel (input dim on "model"): attn.proj, mlp.fc2.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if joined.endswith("kernel") and getattr(leaf, "ndim", 0) == 2:
        if "qkv/dense" in joined or "fc1/dense" in joined:
            return P(None, MODEL_AXIS)
        if "proj/dense" in joined or "fc2/dense" in joined:
            return P(MODEL_AXIS, None)
    return P()


def param_shardings(params: Any, mesh: Mesh, model_parallel: bool = None):
    """NamedSharding tree for a param pytree. With model_parallel (default:
    mesh model axis > 1), lifter transformer kernels are tensor-sharded."""
    if model_parallel is None:
        model_parallel = mesh.shape[MODEL_AXIS] > 1

    def spec_for(path, leaf):
        if not model_parallel:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _lifter_spec(path, leaf))

    return jax.tree_util.tree_map_with_path(spec_for, params)
