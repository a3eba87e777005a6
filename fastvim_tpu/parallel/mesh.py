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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (the TPU-pod counterpart of the reference's
    torch.distributed.launch env plumbing, detection/tools/dist_train.sh).
    On TPU pods with a supported runtime, argument-free initialize()
    auto-discovers the topology."""
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
    except Exception as e:  # single-host / already-initialized
        print(f"jax.distributed.initialize skipped: {e}")


def make_mesh(data: Optional[int] = None, seq: int = 1,
              devices=None) -> Mesh:
    """Create (and cache) a ("data", "seq") mesh over available devices."""
    global _MESH
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    if data * seq > n:
        raise ValueError(
            f"make_mesh(data={data}, seq={seq}) needs {data * seq} devices "
            f"but only {n} are visible on platform "
            f"'{jax.default_backend()}'. For a virtual multi-device CPU "
            f"mesh, set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{data * seq} and jax.config.update('jax_platforms','cpu') "
            f"BEFORE jax backend init (see tests/conftest.py).")
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
    """Shard the leading (batch) axis over the data axis.

    Leaves whose leading dim is not divisible by the data-axis size (e.g.
    per-batch channel-id vectors) are replicated instead.
    """
    mesh = mesh or get_mesh()
    ndata = mesh.shape["data"]
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if x.ndim >= 1 and x.shape[0] % ndata == 0 and x.shape[0] >= ndata:
            return jax.device_put(x, data_sharding)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, batch)


def maybe_shard_tokens(x):
    """Constrain a (batch, L, d) activation to P("data", "seq", None).

    Sequence-parallel annotation for high-res token grids: when the cached
    mesh has a non-trivial ``seq`` axis, tokens are sharded along L and XLA
    inserts the halo/collective traffic (e.g. for the causal conv across
    shard boundaries) over ICI. No-op without a mesh or with seq=1.
    """
    if _MESH is None or "seq" not in _MESH.axis_names:
        return x
    if _MESH.shape["seq"] <= 1:
        return x
    if x.ndim != 3 or x.shape[1] % _MESH.shape["seq"] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_MESH, P("data", "seq", None)))
