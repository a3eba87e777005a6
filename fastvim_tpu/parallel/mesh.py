"""Device mesh + sharding utilities.

TPU-native replacement for the reference's NCCL DDP launcher stack
(`pl.Trainer(num_nodes=…)`, `dist_train.sh` — SURVEY.md §2.6): a
`jax.sharding.Mesh` with a ``data`` axis (data parallelism, batch
sharded, params replicated — XLA inserts the gradient all-reduce over
ICI) and an optional ``seq`` axis for sharding the token/sequence
dimension at high resolution (the designed-in stretch axis; the pooled
scan makes the rows axis sequential and cols data-parallel-ish).

Multi-host: call `jax.distributed.initialize()` before `make_mesh` (the
TPU pod runtime equivalent of torch.distributed.launch env plumbing).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def make_mesh(data: Optional[int] = None, seq: int = 1,
              devices=None) -> Mesh:
    """Create (and cache) a ("data", "seq") mesh over available devices."""
    global _MESH
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    assert data * seq <= n, (data, seq, n)
    arr = np.asarray(devices[: data * seq]).reshape(data, seq)
    _MESH = Mesh(arr, ("data", "seq"))
    return _MESH


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        make_mesh()
    return _MESH


def batch_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Optional[Mesh] = None):
    mesh = mesh or get_mesh()
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Optional[Mesh] = None):
    """Shard the leading (batch) axis of every leaf over the data axis."""
    mesh = mesh or get_mesh()
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
