"""Device mesh construction + sharding rules.

TPU-native replacement for the reference's entire distribution stack
(Lightning DDP, `nn.DataParallel`, DeepSpeed ZeRO-3 + CPU offload — SURVEY
§2.9/§5.8). One `jax.sharding.Mesh` with two axes covers all of it:

  data  — batch of cine slices (DDP / DataParallel equivalent; gradients
          all-reduce via the psum XLA inserts under jit)
  fsdp  — parameter/optimizer-state sharding (ZeRO-3 equivalent; XLA
          all-gathers parameters per layer and reduce-scatters gradients)

Shardings are expressed with NamedSharding/PartitionSpec and handed to
jax.jit — no NCCL/MPI/DeepSpeed translation, collectives ride the ICI.
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, fsdp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a ('data', 'fsdp') mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp <= 0:
        fsdp = 1
    if data <= 0:
        data = n // fsdp
    assert data * fsdp <= n, f"mesh {data}x{fsdp} exceeds {n} devices"
    dev_array = np.asarray(devices[:data * fsdp]).reshape(data, fsdp)
    return Mesh(dev_array, axis_names=("data", "fsdp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch_or_replicate(tree: Any, mesh: Mesh) -> Any:
    """shard_batch, falling back to replication for ragged batches.

    device_put with a 'data' PartitionSpec requires the batch dimension to
    divide the axis extent; validation loaders run drop_last=False, so the
    last batch of an epoch can be ragged. Replicating that one batch keeps
    every metric bit-identical to the single-device run (pad-replicating
    would bias the batch mean) at the cost of redundant compute on one
    batch per epoch.
    """
    n = int(mesh.shape["data"])
    b = jax.tree.leaves(tree)[0].shape[0]
    if b % n == 0:
        return shard_batch(tree, mesh)
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def _fsdp_spec(shape, fsdp_size: int) -> P:
    """Shard the largest axis divisible by the fsdp extent; else replicate.

    Skips tiny params (biases, scalars) — gathering them costs more than
    storing them replicated.
    """
    if fsdp_size == 1 or np.prod(shape) < 2 * 1024 * fsdp_size:
        return P()
    cands = [(dim, ax) for ax, dim in enumerate(shape) if dim % fsdp_size == 0]
    if not cands:
        return P()
    _, ax = max(cands)
    spec = [None] * len(shape)
    spec[ax] = "fsdp"
    return P(*spec)


def fsdp_shardings(params_shapes: Any, mesh: Mesh) -> Any:
    """Map a pytree of ShapeDtypeStructs (or arrays) to NamedShardings."""
    fsdp_size = mesh.shape["fsdp"]

    def _one(leaf):
        return NamedSharding(mesh, _fsdp_spec(leaf.shape, fsdp_size))

    return jax.tree.map(_one, params_shapes)
